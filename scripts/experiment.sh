#!/usr/bin/env bash
# Timing/accuracy harness, mirroring the reference scripts/experiment.sh
# shape: run each mode on a dataset, record wall-clock + peak RSS +
# nRF vs a provided true tree, plus CPU baseline methods (the
# reference runs 10 external tools, experiment.sh:24-34; this image
# has none of them, so scripts/baselines.py provides NJ/UPGMA).
#
# usage: scripts/experiment.sh <input.fa|input.phy> <format d|r|m> [true_tree.nwk]
set -euo pipefail
IN=$1
FMT=$2
TRUE_TREE=${3:-}
OUTDIR=$(mktemp -d)
HERE=$(cd "$(dirname "$0")" && pwd)

run_one() {
    local name=$1; shift
    local out="$OUTDIR/$name.nwk"
    # /usr/bin/time is absent in this image: wrap with a python timer
    # that reports child wall-clock + MaxRSS from wait4 rusage
    python - "$OUTDIR/$name.stats" python -m dipper_tpu.cli \
        -I "$IN" -i "$FMT" -O "$out" "$@" <<'EOF' 2> "$OUTDIR/$name.log"
import json, resource, subprocess, sys, time
stats, cmd = sys.argv[1], sys.argv[2:]
t0 = time.time()
rc = subprocess.run(cmd).returncode
open(stats, "w").write(json.dumps({
    "secs": round(time.time() - t0, 1), "rc": rc,
    "maxrss_kb": resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss}))
sys.exit(rc)
EOF
    local secs mem
    secs=$(python -c "import json;print(json.load(open('$OUTDIR/$name.stats'))['secs'])")
    mem=$(python -c "import json;print(json.load(open('$OUTDIR/$name.stats'))['maxrss_kb'])")
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

echo "-- CPU baselines (scripts/baselines.py) --"
if [[ "$FMT" == "d" ]]; then
    python "$HERE/baselines.py" --matrix "$IN" \
        ${TRUE_TREE:+--true "$TRUE_TREE"} --out-dir "$OUTDIR"
else
    python "$HERE/baselines.py" --fasta "$IN" \
        ${TRUE_TREE:+--true "$TRUE_TREE"} --out-dir "$OUTDIR"
fi
echo "outputs in $OUTDIR"
