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
    """Opt-in only: measured on v5e, XLA's fused row path reaches
    ~35M pairs/s while this kernel's lane-crossing rolls run ~20x
    slower. Kept for further tuning (sublane-friendly merge layout)."""
    return os.environ.get("DIPPER_PALLAS", "0") == "1"


def _roll(x, shift):
    # shift pinned to int32: under x64 a python-int shift becomes an i64
    # scalar, which tpu.dynamic_rotate rejects
    n = x.shape[1]
    return pltpu.roll(x, shift=jnp.int32(shift % n), axis=1)


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
        big = jnp.full((R, M2), _BIG, jnp.int32)
        # reverse running-min of a-values => nearest a value at-or-after
        m = jnp.where(tag_a, val, big)
        s = 1
        while s < M2:
            shifted = jnp.where(pos < M2 - s, _roll(m, -s), big)
            m = jnp.minimum(m, shifted)
            s *= 2
        matched_b = (~tag_a) & (m == val)

        # running sum of uni increments (exclusive prefix)
        # NB: no bool->int astype — Mosaic's convert lowering recurses
        zero = jnp.zeros((R, M2), jnp.int32)
        one = jnp.ones((R, M2), jnp.int32)
        inc = jnp.where(matched_b, zero, one)
        c = inc
        s = 1
        while s < M2:
            shifted = jnp.where(pos >= s, _roll(c, s), zero)
            c = c + shifted
            s *= 2
        cum_before = c - inc
        # dtype pinned: under x64, jnp.sum promotes int32 -> int64,
        # which Mosaic cannot lower
        inter = jnp.sum(
            jnp.where(matched_b & (cum_before < sketch_size), one, zero),
            axis=1, dtype=jnp.int32,
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

    # x64 tracing mode leaks i64 scalars into Mosaic lowering (grid
    # indices, weak constants) and crashes the TPU compile; the kernel
    # is pure int32, so trace it with x64 off.
    with jax.enable_x64(False):
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


# ---------------------------------------------------------------------------
# Transposed variant: merge axis on SUBLANES, pairs on LANES.
# Lane-crossing rotates on a 2048-wide lane axis proved as slow as the
# XLA path; with the merge axis on sublanes each roll is a register
# shuffle and 128 pairs progress per lane-step.
# ---------------------------------------------------------------------------


def _rollT(x, shift):
    n = x.shape[0]
    return pltpu.roll(x, shift=jnp.int32(shift % n), axis=0)


def _merge_count_kernel_T(sketch_size: int, M2: int, PP: int):
    def kernel(bankT_ref, qrevT_ref, out_ref):
        a = bankT_ref[:]                       # [M, PP] keys 2r+1 (cols sorted)
        b = qrevT_ref[:]                       # [M, 1] reversed keys 2r
        x = jnp.concatenate(
            [a, jnp.broadcast_to(b, (b.shape[0], PP))], axis=0
        )                                      # [M2, PP] bitonic per column
        pos = jax.lax.broadcasted_iota(jnp.int32, (M2, PP), 0)

        d = M2 // 2
        while d >= 1:
            up = _rollT(x, -d)
            dn = _rollT(x, d)
            low_half = (pos & d) == 0
            x = jnp.where(low_half, jnp.minimum(x, up), jnp.maximum(x, dn))
            d //= 2

        tag_a = (x & 1) == 1
        val = x >> 1
        big = jnp.full((M2, PP), _BIG, jnp.int32)
        m = jnp.where(tag_a, val, big)
        s = 1
        while s < M2:
            shifted = jnp.where(pos < M2 - s, _rollT(m, -s), big)
            m = jnp.minimum(m, shifted)
            s *= 2
        matched_b = (~tag_a) & (m == val)

        zero = jnp.zeros((M2, PP), jnp.int32)
        one = jnp.ones((M2, PP), jnp.int32)
        inc = jnp.where(matched_b, zero, one)
        c = inc
        s = 1
        while s < M2:
            shifted = jnp.where(pos >= s, _rollT(c, s), zero)
            c = c + shifted
            s *= 2
        cum_before = c - inc
        inter = jnp.sum(
            jnp.where(matched_b & (cum_before < sketch_size), one, zero),
            axis=0, dtype=jnp.int32,
        )
        out_ref[:] = inter.reshape(1, PP)

    return kernel


@functools.partial(jax.jit, static_argnames=("sketch_size", "pair_block",
                                             "interpret"))
def mash_inter_pallas_T(bankT_keys, qrevT_keys, *, sketch_size: int,
                        pair_block: int = 128, interpret: bool = False):
    """bankT_keys int32 [M, N] (transposed bank, keys 2r+1, each column
    ascending), qrevT_keys int32 [M, Q] (queries transposed, keys 2r,
    each column DESCENDING i.e. pre-reversed). Returns [Q, N] inter."""
    M, N = bankT_keys.shape
    Q = qrevT_keys.shape[1]
    PP = pair_block
    pad = (-N) % PP
    if pad:
        bankT_keys = jnp.concatenate(
            [bankT_keys, jnp.tile(bankT_keys[:, -1:], (1, pad))], axis=1)
    Np = bankT_keys.shape[1]
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _merge_count_kernel_T(sketch_size, 2 * M, PP),
            grid=(Q, Np // PP),
            in_specs=[
                pl.BlockSpec((M, PP), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, 1), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, PP), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, Np), jnp.int32),
            interpret=interpret,
        )(bankT_keys, qrevT_keys)
    return out[:, :N]
