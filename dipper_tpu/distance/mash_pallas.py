"""Pallas TPU kernel for mash sketch intersection counting.

The XLA formulation in distance/mash.py materializes every bitonic
stage to HBM (~30 passes over [pairs, 2M] int32), leaving it
memory-bound at a few percent of VPU peak. This kernel keeps the whole
merge + scans VMEM-resident: one HBM read of the bank block per grid
step and an [R] write.

Same math as _merged_inter_count (proven against the serial walk):
- keys 2*rank+tag, concat(bank_keys, reversed query) is bitonic;
- log2(2M) compare-exchange stages via XOR-partner rolls (no
  reshapes — Mosaic-friendly);
- reverse running-min of a-values -> matched_b;
- running sum of uni increments -> cutoff mask;
- inter = sum(matched_b & before-cutoff).

The 2D grid (queries x bank blocks) serves every caller: single rows
(Q=1), full matrices, and batched phase-2 scoring.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30  # python int: jnp scalars would close over the kernel as
              # captured constants, which pallas_call rejects


def use_pallas() -> bool:
    v = os.environ.get("DIPPER_PALLAS", "auto")
    if v == "1":
        return True
    if v == "0":
        return False
    return jax.default_backend() == "tpu"


def _roll(x, shift):
    n = x.shape[1]
    return pltpu.roll(x, shift=shift % n, axis=1)


def _merge_count_kernel(sketch_size: int, M2: int, R: int):
    def kernel(bank_ref, qrev_ref, out_ref):
        a = bank_ref[:]                        # [R, M]  (keys 2r+1)
        q = qrev_ref[:]                        # [1, M]  reversed (keys 2r)
        x = jnp.concatenate(
            [a, jnp.broadcast_to(q, (R, q.shape[1]))], axis=1
        )                                      # [R, M2] bitonic
        pos = jax.lax.broadcasted_iota(jnp.int32, (R, M2), 1)

        # bitonic merge: partner = pos XOR d
        d = M2 // 2
        while d >= 1:
            up = _roll(x, -d)                  # x[p+d] (valid when bit d==0)
            dn = _roll(x, d)                   # x[p-d]
            low_half = (pos & d) == 0
            x = jnp.where(low_half, jnp.minimum(x, up), jnp.maximum(x, dn))
            d //= 2

        tag_a = (x & 1) == 1
        val = x >> 1
        # reverse running-min of a-values => nearest a value at-or-after
        m = jnp.where(tag_a, val, _BIG)
        s = 1
        while s < M2:
            shifted = jnp.where(pos < M2 - s, _roll(m, -s), _BIG)
            m = jnp.minimum(m, shifted)
            s *= 2
        matched_b = (~tag_a) & (m == val)

        # running sum of uni increments (exclusive prefix)
        inc = jnp.where(matched_b, 0, 1).astype(jnp.int32)
        c = inc
        s = 1
        while s < M2:
            shifted = jnp.where(pos >= s, _roll(c, s), 0)
            c = c + shifted
            s *= 2
        cum_before = c - inc
        inter = jnp.sum(
            (matched_b & (cum_before < sketch_size)).astype(jnp.int32),
            axis=1,
        )
        out_ref[:] = inter.reshape(1, R)

    return kernel


@functools.partial(jax.jit, static_argnames=("sketch_size", "block_rows",
                                             "interpret"))
def mash_inter_pallas(bank_keys, query_keys, *, sketch_size: int,
                      block_rows: int = 256, interpret: bool = False):
    """bank_keys int32 [N, M] (2*rank+1, ascending rows), query_keys
    int32 [Q, M] or [M] (2*rank). Returns inter counts int32 [Q, N]
    (or [N] for a single query)."""
    single = query_keys.ndim == 1
    if single:
        query_keys = query_keys[None, :]
    N, M = bank_keys.shape
    Q = query_keys.shape[0]
    R = min(block_rows, max(8, N))
    pad = (-N) % R
    if pad:
        bank_keys = jnp.concatenate(
            [bank_keys, jnp.tile(bank_keys[-1:], (pad, 1))], axis=0)
    Np = bank_keys.shape[0]
    M2 = 2 * M
    qrev = query_keys[:, ::-1]

    out = pl.pallas_call(
        _merge_count_kernel(sketch_size, M2, R),
        grid=(Q, Np // R),
        in_specs=[
            pl.BlockSpec((R, M), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, Np), jnp.int32),
        interpret=interpret,
    )(bank_keys, qrev)
    out = out[:, :N]
    return out[0] if single else out


def mash_rows_vs_bank_pallas(bank_ranks, query_ranks, *, k: int,
                             sketch_size: int, dtype_name: str,
                             interpret: bool = False):
    """Drop-in for distance.mash.mash_rows_vs_bank using the kernel."""
    from dipper_tpu.distance.mash import _inter_to_dist

    dtype = jnp.dtype(dtype_name)
    inter = mash_inter_pallas(
        bank_ranks * 2 + 1, query_ranks * 2, sketch_size=sketch_size,
        interpret=interpret,
    )
    return _inter_to_dist(inter, k, sketch_size, dtype)
