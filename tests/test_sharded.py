"""Multi-device sharding: 8 virtual CPU devices (conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dipper_tpu.parallel import (
    make_mesh, sharded_placement_build, sharded_mash_matrix,
)
from dipper_tpu.placement import kclosest
from dipper_tpu.distance.mash import (
    rank_compress, pad_ranks, mash_distance_matrix_device,
)
from dipper_tpu.sketch.minhash import sketch_sequences
from dipper_tpu.utils.treecmp import rf_distance

from datagen import simulate_unaligned


needs_multi = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs multiple devices")


@needs_multi
def test_sharded_mash_matrix_matches_single():
    rng = np.random.default_rng(0)
    names, seqs = simulate_unaligned(24, 800, rng)
    k, ss = 12, 100
    sk = sketch_sequences(seqs, k, ss)
    want = np.array(mash_distance_matrix_device(sk, k, ss, dtype="float64"))
    mesh = make_mesh()
    ranks = pad_ranks(rank_compress(jnp.asarray(sk)))
    got = np.array(jax.device_get(
        sharded_mash_matrix(ranks, k, ss, mesh, dtype="float64")))
    np.fill_diagonal(got, 0.0)
    np.fill_diagonal(want, 0.0)
    assert np.allclose(got, want, atol=1e-12)


@needs_multi
def test_sharded_placement_matches_single():
    rng = np.random.default_rng(1)
    names, seqs = simulate_unaligned(32, 1200, rng)
    k, ss = 12, 120
    sk = sketch_sequences(seqs, k, ss)
    n = len(seqs)

    # single-device reference
    ranks = pad_ranks(rank_compress(jnp.asarray(sk)))
    e1, b1, l1 = jax.device_get(kclosest.run_placement(
        (ranks,), num_sequences=n, frontend="mash",
        frontend_static=(k, ss), dtype_name="float64",
    ))
    want = kclosest.edges_to_newick(e1, b1, l1, names, n)

    mesh = make_mesh()
    e2, b2, l2 = sharded_placement_build(sk, k, ss, mesh, dtype="float64")
    got = kclosest.edges_to_newick(e2, b2, l2, names, n)
    rf, _ = rf_distance(got, want)
    assert rf == 0
    assert (np.asarray(e1) == np.asarray(e2)).all()
    assert np.allclose(np.asarray(l1), np.asarray(l2), atol=1e-12)

    # tiny epoch/tier sizes force the sharded EPOCH scorer (default
    # T=256 > n leaves the whole build in the sentinel full-rescore
    # path): many epoch refreshes + tier rescores, same exact tree
    e3, b3, l3 = sharded_placement_build(sk, k, ss, mesh, dtype="float64",
                                         scorer_cfg=(8, 16, 32))
    assert (np.asarray(e1) == np.asarray(e3)).all()
    assert np.array_equal(np.asarray(l1), np.asarray(l3))


@needs_multi
def test_sharded_dc_matches_single():
    """DC phases 2/3 sharded across the mesh == single-device build
    (bitwise via the matrix frontend)."""
    from dipper_tpu.dc import build_dc_tree_from_matrix
    from dipper_tpu.utils.params import Param

    import oracle

    rng = np.random.default_rng(7)
    n = 60
    D = oracle.random_additive_like_matrix(n, rng) if hasattr(
        oracle, "random_additive_like_matrix") else None
    if D is None:
        D = np.abs(rng.normal(0.3, 0.1, size=(n, n)))
        D = (D + D.T) / 2
        np.fill_diagonal(D, 0.0)
    names = [f"t{i}" for i in range(n)]
    params = Param(distance_type=1, in_format="d", dtype="float64")
    params.backbone_size = n // 5
    params.batch_size = params.backbone_size
    want = build_dc_tree_from_matrix(D, names, params)
    got = build_dc_tree_from_matrix(D, names, params, mesh=make_mesh())
    assert got == want


@needs_multi
def test_sharded_nj_matches_single():
    """Row-sharded NJ (GSPMD-partitioned Q-scan, VERDICT r2 #5) must
    produce the identical join sequence and branch lengths."""
    from dipper_tpu.nj import neighbor_joining_device

    import sys
    sys.path.insert(0, "tests")
    from test_nj import random_additive_matrix

    rng = np.random.default_rng(5)
    n = 150
    D = random_additive_matrix(n, rng)
    ch1, r1 = neighbor_joining_device(D, dtype="float64")
    ch2, r2 = neighbor_joining_device(D, dtype="float64", mesh=make_mesh())
    assert r1 == r2
    # identical join sequence (same topology + child ids); branch
    # lengths may differ at ULP level because sharded row-sum
    # reductions reassociate floating-point adds
    ids1 = [[c for c, _ in ch] for ch in ch1]
    ids2 = [[c for c, _ in ch] for ch in ch2]
    assert ids1 == ids2
    for a, b in zip(ch1, ch2):
        for (c1, l1), (c2, l2) in zip(a, b):
            assert abs(l1 - l2) < 1e-9


@needs_multi
def test_sharded_placement_non_divisible_n():
    """N not divisible by the mesh size pads instead of raising
    (round-1 hygiene item)."""
    rng = np.random.default_rng(2)
    names, seqs = simulate_unaligned(27, 900, rng)  # 27 % 8 != 0
    k, ss = 12, 100
    sk = sketch_sequences(seqs, k, ss)
    n = len(seqs)
    ranks = pad_ranks(rank_compress(jnp.asarray(sk)))
    e1, b1, l1 = jax.device_get(kclosest.run_placement(
        (ranks,), num_sequences=n, frontend="mash",
        frontend_static=(k, ss), dtype_name="float64",
    ))
    mesh = make_mesh()
    e2, b2, l2 = sharded_placement_build(sk, k, ss, mesh, dtype="float64")
    assert (np.asarray(e1) == np.asarray(e2)).all()
    assert np.allclose(np.asarray(l1), np.asarray(l2), atol=1e-12)
