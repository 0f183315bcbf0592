"""Microbenchmark harness for mash merge-count kernel variants.

Run on the real chip (no JAX_PLATFORMS override):
    python scripts/kernel_micro.py [N] [Q]

Measures pairs/s for:
  xla       — current production path (lax.map rows, distance/mash.py)
  pl-static — pallas VMEM kernel, static concat-slice rotations
  pl-dyn    — pallas VMEM kernel, tpu.dynamic_rotate

IMPORTANT: the axon tunnel caches executions whose input buffers are
identical, so every timed call uses a DIFFERENT query slice. Variants
are cross-checked for equal distances.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from dipper_tpu.distance import mash as M
from dipper_tpu.distance import mash_pallas as MP


def timeit(fn, bank, queries, reps):
    """queries: list of distinct query blocks (defeats tunnel dispatch
    dedup); blocks per call (batched async timing through the tunnel
    under-reports)."""
    out0 = jax.block_until_ready(fn(bank, queries[0]))  # compile
    t0 = time.time()
    for r in range(reps):
        out = jax.block_until_ready(fn(bank, queries[1 + r % (len(queries) - 1)]))
    return (time.time() - t0) / reps, np.asarray(out0)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    S = 1000
    k = 15
    rng = np.random.default_rng(0)
    sk = rng.integers(0, 1 << 62, size=(N, S), dtype=np.uint64)
    sk.sort(axis=1)
    # host rank compression (the production ingest path; the device
    # hierarchical sort's compile explodes at bank scale)
    ranks = jax.device_put(M.pad_ranks(M.rank_compress_host(sk)))
    ranks = jax.block_until_ready(ranks)
    # distinct query blocks per rep
    queries = [ranks[i * 7 % (N - Q):][:Q] for i in range(reps)]
    q0 = queries[0]
    pairs = N * Q

    import functools

    variants = {}
    variants["xla"] = jax.jit(functools.partial(
        M.mash_pairwise, k=k, sketch_size=S, dtype_name="float32",
        impl="map"))

    def pl(rot, block_rows=256, rq=8):
        def f(bank, qq):
            inter = MP.mash_inter_pallas(
                bank * 2 + 1, qq * 2, sketch_size=S, rotate=rot,
                block_rows=block_rows, rq=rq)
            return M._inter_to_dist(inter, k, S, jnp.float32)
        return jax.jit(f)

    variants["pl-static"] = pl("static")
    variants["pl-static-r512"] = pl("static", 512)
    variants["pl-static-r128"] = pl("static", 128)
    variants["pl-rq16"] = pl("static", 256, 16)
    variants["pl-rq32"] = pl("static", 256, 32)
    variants["pl-dyn"] = pl("dyn")

    ref = None
    best = {}
    for name, fn in variants.items():
        try:
            t0 = time.time()
            dt, out = timeit(fn, ranks, queries, reps)
            compile_s = time.time() - t0 - reps * dt
            if ref is None:
                ref = out
                ok = "ref"
            else:
                ok = "OK" if np.allclose(out, ref, atol=1e-6) else "MISMATCH"
            best[name] = pairs / dt
            print(f"{name:15s} {pairs/dt/1e6:9.2f} M pairs/s   "
                  f"({dt*1e3:8.1f} ms, compile {compile_s:5.1f}s)  {ok}")
        except Exception as e:
            print(f"{name:15s} FAILED: {type(e).__name__}: {e}"[:220])
        sys.stdout.flush()

    # roofline attribution for the best pallas variant: the merge
    # kernel executes ~5 vops/elem over 11 compare-exchange stages and
    # ~3 vops/elem over 2x11 scan stages on [*, 2M] lanes per pair
    # (2M = padded 2*sketch width), and reads the bank block from HBM
    # once per rq-query group (4*Mp bytes / rq per pair).
    pl_best = max((v for kk, v in best.items() if kk.startswith("pl")),
                  default=None)
    if pl_best:
        Mp = 1 << int(np.ceil(np.log2(S)))
        vops_per_pair = (11 * 5 + 22 * 3) * 2 * Mp
        hbm_per_pair = 4 * Mp / 8  # bytes, rq=8 default
        print(f"\n[roofline] best pallas {pl_best/1e6:.2f} M pairs/s"
              f" -> {pl_best*vops_per_pair/1e12:.2f} T vops/s"
              f" (v5e VPU peak ~2-4 T int32 ops/s),"
              f" {pl_best*hbm_per_pair/1e9:.2f} GB/s HBM"
              f" (peak ~800 GB/s): compute-bound in the merge network")


if __name__ == "__main__":
    main()
