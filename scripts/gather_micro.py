"""Microbenchmark: ways to evaluate dist_row[cid] ([E,5] random gather
from a [cap] f32 table) — the single hottest op of the insertion loop
(bfs_probe at 16K: 2.6 of 4.0 ms/insertion is this gather).

Variants:
  xla        — row[ids] as production (dynamic-gather HLO)
  pl-vec     — pallas kernel: row replicated to [8, cap] VMEM,
               take_along_axis (Mosaic's supported 2D gather form)
  xla-2d8    — same [8, W] take_along_axis without pallas
  onehot-mxu — block one-hot selection matmul (bf16x3-exact), batched
               over 256 rows (reported per-row equivalent)

Each timed inside a fori_loop mutating a carry so nothing is elided
(mirrors the insertion loop's sequential shape).

Usage: python scripts/gather_micro.py [CAP] [ITERS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 5


def timeit_loop(fn, iters, reps=3):
    out = jax.block_until_ready(fn(jnp.int32(0)))
    best = 1e9
    for r in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(jnp.int32(r + 1)))
        best = min(best, time.time() - t0)
    return best / iters


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    E = 4 * cap
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cap, size=(E, K), dtype=np.int32))
    rows = jnp.asarray(rng.random((256, cap), dtype=np.float32))
    cdis = jnp.asarray(rng.random((E, K), dtype=np.float32))

    @jax.jit
    def xla_loop(seed):
        def body(i, acc):
            row = jax.lax.dynamic_index_in_dim(rows, (i + seed) % 256, 0,
                                               keepdims=False)
            dv = row[ids] - cdis
            side = jnp.max(dv, axis=1)
            return acc + side[i % E]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    t = timeit_loop(xla_loop, iters)
    print(f"xla        {t*1e3:8.3f} ms/iter")
    sys.stdout.flush()

    # --- pallas: row replicated to [8, cap] in VMEM; 2D gather via
    # take_along_axis (the form Mosaic supports)
    SUB = 8
    W = (E * K) // SUB              # gather columns per sublane
    BW = 2048                       # block width (columns per grid cell)
    ids8 = ids.reshape(SUB, W)      # fixed relayout of the index table

    def pk(row_ref, ids_ref, out_ref):
        row = row_ref[:]            # [SUB, cap]
        idb = ids_ref[:]            # [SUB, BW]
        out_ref[:] = jnp.take_along_axis(row, idb, axis=1)

    def pallas_gather(row8, ids2):
        return pl.pallas_call(
            pk,
            grid=(W // BW,),
            in_specs=[
                pl.BlockSpec((SUB, cap), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, BW), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SUB, BW), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SUB, W), jnp.float32),
        )(row8, ids2)

    @jax.jit
    def pl_loop(seed):
        def body(i, acc):
            row = jax.lax.dynamic_index_in_dim(rows, (i + seed) % 256, 0,
                                               keepdims=False)
            row8 = jnp.broadcast_to(row[None, :], (SUB, cap))
            dv = pallas_gather(row8, ids8).reshape(E, K) - cdis
            side = jnp.max(dv, axis=1)
            return acc + side[i % E]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    try:
        t = timeit_loop(pl_loop, iters)
        print(f"pl-vec     {t*1e3:8.3f} ms/iter")
    except Exception as e:
        print(f"pl-vec     FAILED: {type(e).__name__}: {e}"[:200])
    sys.stdout.flush()

    @jax.jit
    def xla8_loop(seed):
        def body(i, acc):
            row = jax.lax.dynamic_index_in_dim(rows, (i + seed) % 256, 0,
                                               keepdims=False)
            row8 = jnp.broadcast_to(row[None, :], (SUB, cap))
            dv = jnp.take_along_axis(row8, ids8, axis=1).reshape(E, K) - cdis
            side = jnp.max(dv, axis=1)
            return acc + side[i % E]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    try:
        t = timeit_loop(xla8_loop, iters)
        print(f"xla-2d8    {t*1e3:8.3f} ms/iter")
    except Exception as e:
        print(f"xla-2d8    FAILED: {type(e).__name__}: {e}"[:200])
    sys.stdout.flush()

    @jax.jit
    def onehot_block(seed):
        flat = ids.reshape(-1)
        S = jnp.zeros((cap, flat.shape[0]), jnp.bfloat16)
        S = S.at[flat, jnp.arange(flat.shape[0])].set(1.0)
        dv = jax.lax.dot_general(
            rows, S, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return dv.sum() + jnp.float32(seed)

    try:
        out = jax.block_until_ready(onehot_block(jnp.int32(0)))
        best = 1e9
        for r in range(3):
            t0 = time.time()
            jax.block_until_ready(onehot_block(jnp.int32(r + 1)))
            best = min(best, time.time() - t0)
        print(f"onehot-mxu {best/256*1e3:8.3f} ms/row-equivalent "
              f"({best*1e3:.1f} ms per 256-row block)")
    except Exception as e:
        print(f"onehot-mxu FAILED: {type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
