"""Pallas merge-count kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dipper_tpu.distance.mash import (
    rank_compress, pad_ranks, mash_rows_vs_bank,
)
from dipper_tpu.distance.mash_pallas import mash_inter_pallas
from dipper_tpu.sketch.minhash import sketch_sequences

from datagen import simulate_unaligned


def test_pallas_inter_matches_xla():
    rng = np.random.default_rng(3)
    names, seqs = simulate_unaligned(40, 900, rng)
    k, ss = 12, 128  # pow2 sketch => no pad slots, pure kernel path
    sk = sketch_sequences(seqs, k, ss)
    ranks = pad_ranks(rank_compress(jnp.asarray(sk)))
    q = ranks[7]
    want = mash_rows_vs_bank(ranks, q, k=k, sketch_size=ss,
                             dtype_name="float64")
    got_inter = mash_inter_pallas(ranks * 2 + 1, q * 2, sketch_size=ss,
                                  block_rows=8, interpret=True)
    from dipper_tpu.distance.mash import _inter_to_dist
    got = _inter_to_dist(got_inter, k, ss, jnp.float64)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_pallas_inter_padded_sketch():
    """Non-pow2 sketch size exercises the pad-slot handling."""
    rng = np.random.default_rng(4)
    names, seqs = simulate_unaligned(24, 700, rng)
    k, ss = 11, 100
    sk = sketch_sequences(seqs, k, ss)
    ranks = pad_ranks(rank_compress(jnp.asarray(sk)))
    for qi in (0, 5, 23):
        q = ranks[qi]
        want = mash_rows_vs_bank(ranks, q, k=k, sketch_size=ss,
                                 dtype_name="float64")
        got_inter = mash_inter_pallas(ranks * 2 + 1, q * 2, sketch_size=ss,
                                      block_rows=8, interpret=True)
        from dipper_tpu.distance.mash import _inter_to_dist
        got = _inter_to_dist(got_inter, k, ss, jnp.float64)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-12)
