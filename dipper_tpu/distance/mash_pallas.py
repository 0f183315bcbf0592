"""Pallas TPU kernel for mash sketch intersection counting.

The XLA formulation in distance/mash.py materializes every bitonic
stage to HBM (~30 passes over [pairs, 2M] int32), leaving it
memory-bound at a few percent of VPU peak (~0.9M pairs/s on v5e at
sketch 1000). This kernel keeps the whole merge + scans VMEM-resident:
per grid cell it reads a [R, M] bank block + an [RQ, M] query block
and writes an [RQ, R] tile of intersection counts.

Same math as _merged_inter_count (proven against the serial walk):
- keys 2*rank+tag, concat(bank_keys, reversed query) is bitonic;
- log2(2M) compare-exchange stages via XOR-partner rotations;
- reverse running-min of a-values -> matched_b;
- running sum of uni increments -> cutoff mask;
- inter = sum(matched_b & before-cutoff).

Rotations are STATIC (compile-time concat of two lane slices): Mosaic
lowers those to vreg shuffles, where tpu.dynamic_rotate on a 2048-wide
lane axis was measured ~20x slower.

Block-shape contract (Mosaic): the last two dims of every block must
be (divisible by 8, divisible by 128) or equal the array dim — hence
queries are processed RQ=8 at a time (an in-kernel unrolled loop) and
single-row callers pad the query side to 8.
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

RQ = 8  # queries per grid cell (sublane-divisibility of the out block)


def use_pallas() -> bool:
    """Whether batched mash distance calls route through the kernel.
    Default: on for TPU backends (measured ~7x the XLA pipeline on
    v5e, scripts/kernel_micro.py), off for CPU (interpret mode is test
    only). Override with DIPPER_PALLAS=0/1."""
    if os.environ.get("DIPPER_PALLAS") is not None:
        return os.environ["DIPPER_PALLAS"] == "1"
    try:
        return jax.default_backend().startswith("tpu") or \
            jax.default_backend() == "axon"
    except Exception:
        return False


def _roll(x, shift, rotate="static"):
    """out[p] = x[(p - shift) % n] along the lane axis (jnp.roll
    semantics)."""
    n = x.shape[1]
    s = shift % n
    if s == 0:
        return x
    if rotate == "static":
        # compile-time lane rotation: concat of two static slices;
        # Mosaic lowers these to vreg shuffles, far cheaper than
        # tpu.dynamic_rotate
        return jnp.concatenate([x[:, n - s:], x[:, :n - s]], axis=1)
    # shift pinned to int32: under x64 a python-int shift becomes an i64
    # scalar, which tpu.dynamic_rotate rejects
    return pltpu.roll(x, shift=jnp.int32(s), axis=1)


def _merge_count_one(a, q, pos, sketch_size: int, rotate: str):
    """a [R, M] bank keys (2r+1, rows ascending), q [1, M] reversed
    query keys (2r), pos [R, 2M] iota. Returns inter [R] int32."""
    R, M = a.shape
    M2 = 2 * M
    x = jnp.concatenate([a, jnp.broadcast_to(q, (R, M))], axis=1)

    # bitonic merge: partner = pos XOR d
    # (a roll-free first stage via direct min/max of the two halves
    # measured no faster — the extra concat costs what the rolls did)
    d = M2 // 2
    while d >= 1:
        up = _roll(x, -d, rotate)          # x[p+d] (valid when bit d==0)
        dn = _roll(x, d, rotate)           # x[p-d]
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
        shifted = jnp.where(pos < M2 - s, _roll(m, -s, rotate), big)
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
        shifted = jnp.where(pos >= s, _roll(c, s, rotate), zero)
        c = c + shifted
        s *= 2
    cum_before = c - inc
    # dtype pinned: under x64, jnp.sum promotes int32 -> int64,
    # which Mosaic cannot lower
    return jnp.sum(
        jnp.where(matched_b & (cum_before < sketch_size), one, zero),
        axis=1, dtype=jnp.int32,
    )


def _merge_count_kernel(sketch_size: int, M: int, R: int, rotate: str,
                        rq: int):
    def kernel(bank_ref, qrev_ref, out_ref):
        a = bank_ref[:]                        # [R, M]  (keys 2r+1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (R, 2 * M), 1)

        def one_query(t, _):
            q = qrev_ref[pl.ds(t, 1), :]       # [1, M]
            inter = _merge_count_one(a, q, pos, sketch_size, rotate)
            out_ref[pl.ds(t, 1), :] = inter.reshape(1, R)
            return 0

        # fori_loop (not an unrolled python loop): one traced merge
        # body keeps the Mosaic program small
        jax.lax.fori_loop(0, rq, one_query, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("sketch_size", "block_rows",
                                             "interpret", "rotate", "rq"))
def mash_inter_pallas(bank_keys, query_keys, *, sketch_size: int,
                      block_rows: int = 256, interpret: bool = False,
                      rotate: str = "static", rq: int = RQ):
    """bank_keys int32 [N, M] (2*rank+1, ascending rows), query_keys
    int32 [Q, M] or [M] (2*rank). Returns inter counts int32 [Q, N]
    (or [N] for a single query)."""
    single = query_keys.ndim == 1
    if single:
        query_keys = query_keys[None, :]
    N, M = bank_keys.shape
    Q = query_keys.shape[0]
    R = min(block_rows, max(8, N))
    padn = (-N) % R
    if padn:
        bank_keys = jnp.concatenate(
            [bank_keys, jnp.tile(bank_keys[-1:], (padn, 1))], axis=0)
    padq = (-Q) % rq
    if padq:
        query_keys = jnp.concatenate(
            [query_keys, jnp.tile(query_keys[-1:], (padq, 1))], axis=0)
    Np = bank_keys.shape[0]
    Qp = query_keys.shape[0]
    qrev = query_keys[:, ::-1]

    # x64 tracing mode leaks i64 scalars into Mosaic lowering (grid
    # indices, weak constants) and crashes the TPU compile; the kernel
    # is pure int32, so trace it with x64 off.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _merge_count_kernel(sketch_size, M, R, rotate, rq),
            grid=(Qp // rq, Np // R),
            in_specs=[
                pl.BlockSpec((R, M), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rq, M), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rq, R), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Qp, Np), jnp.int32),
            interpret=interpret,
        )(bank_keys, qrev)
    out = out[:Q, :N]
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
