#!/usr/bin/env bash
# Timing/accuracy harness, mirroring the reference scripts/experiment.sh
# shape: run each mode on a dataset, record wall-clock + peak RSS +
# nRF vs a provided true tree.
#
# usage: scripts/experiment.sh <input.fa|input.phy> <format d|r|m> [true_tree.nwk]
set -euo pipefail
IN=$1
FMT=$2
TRUE_TREE=${3:-}
OUTDIR=$(mktemp -d)

run_one() {
    local name=$1; shift
    local out="$OUTDIR/$name.nwk"
    local t0=$(date +%s.%N)
    /usr/bin/time -f "%M" -o "$OUTDIR/$name.mem" \
        python -m dipper_tpu.cli -I "$IN" -i "$FMT" -O "$out" "$@" \
        2> "$OUTDIR/$name.log"
    local t1=$(date +%s.%N)
    local secs=$(echo "$t1 - $t0" | bc)
    local mem=$(cat "$OUTDIR/$name.mem")
    local nrf="-"
    if [[ -n "$TRUE_TREE" ]]; then
        nrf=$(python -m dipper_tpu.tools nrf "$TRUE_TREE" "$out" | awk '/nRF/{print $2}')
    fi
    printf "%-16s %8.1fs  peakRSS %8s kB  nRF %s\n" "$name" "$secs" "$mem" "$nrf"
}

echo "== dipper-tpu experiment: $IN ($FMT) =="
run_one auto
run_one placement -m 1
run_one nj -m 2
if [[ "$FMT" != "d" ]]; then
    run_one dc -m 3
fi
echo "outputs in $OUTDIR"
