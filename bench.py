"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): pairwise mash distances / s / chip —
the inner loop that dominates every DIPPER workload (SURVEY.md §3.5).
Also reports time-to-tree for a placement build on stderr.

The reference publishes no numbers (BASELINE.md), so vs_baseline is a
self-relative ratio against the first recorded value of this metric
(bench_baseline.json, created on first run).

Env knobs: DIPPER_BENCH_N (taxa, default 2048), DIPPER_BENCH_L
(sequence length, default 10000), DIPPER_BENCH_MODE=dist|tree.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    n = int(os.environ.get("DIPPER_BENCH_N", 2048))
    L = int(os.environ.get("DIPPER_BENCH_L", 10000))
    k = 15
    ss = 1000

    import jax

    # honor JAX_PLATFORMS even when a sitecustomize-registered plugin
    # overrode it at the config level (see cli.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/dipper_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
    import jax.numpy as jnp

    from dipper_tpu.sketch.minhash import sketch_sequences
    from dipper_tpu.distance.mash import (
        rank_compress, pad_ranks, mash_pairwise,
    )
    import functools

    rng = np.random.default_rng(0)
    t0 = time.time()
    seqs = [bytes(rng.choice(list(b"ACGT"), L).astype(np.uint8))
            for i in range(n)]
    print(f"[bench] generated {n} x {L} in {time.time()-t0:.1f}s",
          file=sys.stderr)

    t0 = time.time()
    sk = sketch_sequences(seqs, k, ss)
    print(f"[bench] sketched in {time.time()-t0:.1f}s "
          f"({n*(L-k+1)/(time.time()-t0)/1e6:.1f} M kmers/s)",
          file=sys.stderr)

    ranks = pad_ranks(rank_compress(jnp.asarray(sk)))
    ranks.block_until_ready()

    # full pairwise block computation, chunked (the NJ-frontend shape)
    chunk = min(512, n)
    pw = jax.jit(functools.partial(
        mash_pairwise, k=k, sketch_size=ss, dtype_name="float32"))
    pw(ranks, ranks[:chunk]).block_until_ready()  # warmup (compile)
    t0 = time.time()
    for s in range(0, n, chunk):
        blk = pw(ranks, ranks[s:s + chunk])
    blk.block_until_ready()
    dt = time.time() - t0
    pairs = n * n
    rate = pairs / dt
    print(f"[bench] {pairs//2} pairwise distances in {dt:.2f}s",
          file=sys.stderr)

    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        try:
            base = json.load(open(baseline_path))
            if base.get("metric") == "pairwise_mash_distances_per_sec_per_chip":
                vs = rate / base["value"]
        except Exception:
            pass
    else:
        json.dump({"metric": "pairwise_mash_distances_per_sec_per_chip",
                   "value": rate}, open(baseline_path, "w"))

    print(json.dumps({
        "metric": "pairwise_mash_distances_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "pairs/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
