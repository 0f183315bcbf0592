"""K-closest placement: device engine vs transliterated oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dipper_tpu.placement import kclosest
from dipper_tpu.utils.treecmp import rf_distance

from oracle import KPlacementOracle
from test_nj import random_additive_matrix


def _scale(D):
    """Scale distances into the mash-like [0, 1] domain the engine's
    2.0 'infinity' sentinel assumes."""
    return D / (D.max() * 1.05)


def _run_oracle(D):
    n = D.shape[0]
    o = KPlacementOracle(n)
    o.run(lambda i: D[i])
    return o


def _run_device(D, dtype="float64"):
    n = D.shape[0]
    e, belong, length = kclosest.run_placement(
        (jnp.asarray(D, jnp.dtype(dtype)),),
        num_sequences=n, frontend="matrix", dtype_name=dtype,
    )
    return jax.device_get((e, belong, length))


@pytest.mark.parametrize("n", [4, 7, 16, 40, 100])
def test_kclosest_matches_oracle_additive(n):
    rng = np.random.default_rng(n)
    D = _scale(random_additive_matrix(n, rng))
    o = _run_oracle(D)
    e, belong, length = _run_device(D)
    # exact structural comparison: same edge arrays
    used = belong >= 0
    assert (np.asarray(o.e[: used.sum()]) == e[used]).all(), "e mismatch"
    assert (np.asarray(o.belong[: used.sum()]) == belong[used]).all()
    assert np.allclose(np.asarray(o.len[: used.sum()]), length[used], atol=1e-9)


@pytest.mark.parametrize("n", [25, 60])
def test_kclosest_matches_oracle_noisy(n):
    rng = np.random.default_rng(n + 1000)
    D = random_additive_matrix(n, rng)
    D += rng.uniform(0, 0.05, D.shape)
    D = _scale((D + D.T) / 2)
    np.fill_diagonal(D, 0)
    o = _run_oracle(D)
    e, belong, length = _run_device(D)
    names = [f"L{i}" for i in range(n)]
    got = kclosest.edges_to_newick(e, belong, length, names, n)
    want = o.to_newick(names)
    rf, _ = rf_distance(got, want)
    assert rf == 0


def test_kclosest_placement_recovers_pruned_leaf():
    """Placing a leaf pruned from an additive tree must reattach it at
    the right place: tree distances must reproduce D."""
    import collections

    n = 30
    rng = np.random.default_rng(77)
    D = _scale(random_additive_matrix(n, rng))
    e, belong, length = _run_device(D)
    adj = collections.defaultdict(list)
    for eid in range(len(e)):
        if belong[eid] >= 0:
            adj[int(belong[eid])].append((int(e[eid]), float(length[eid])))
    for s in range(n):
        d = {s: 0.0}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for v, l in adj[u]:
                if v not in d:
                    d[v] = d[u] + l
                    q.append(v)
        for t in range(n):
            assert abs(d[t] - D[s, t]) < 1e-6, (s, t, d[t], D[s, t])


def test_add_queries_matches_oracle():
    """--add path: backbone from Newick + query insertion."""
    from dipper_tpu.io.newick import parse_newick
    from dipper_tpu.placement.api import backbone_tree_to_arrays
    from oracle import KPlacementOracle

    n = 24
    B = 16
    rng = np.random.default_rng(3)
    D = random_additive_matrix(n, rng)
    D = D / (D.max() * 1.05)

    # backbone tree built by placement on the first B taxa
    oB = KPlacementOracle(B)
    oB.run(lambda i: D[i])
    names_b = [f"L{i}" for i in range(B)]
    backbone_nwk = oB.to_newick(names_b)

    tree = parse_newick(backbone_nwk, total_leaves=n)
    assert tree.num_leaves == B

    # oracle --add
    o = KPlacementOracle(n)
    o.init_from_tree(tree, B)
    o.run(lambda i: D[i], start=B, initial=False)
    want = o.to_newick([f"L{i}" for i in range(n)])

    # device --add (leaf ids in the parsed tree = encounter order; our
    # D rows must be permuted accordingly)
    leaf_names = tree.leaf_names_in_idx_order()
    perm = [int(nm[1:]) for nm in leaf_names] + list(range(B, n))
    Dp = D[np.ix_(perm, perm)]
    # oracle again on permuted D to define expected output consistently
    o2 = KPlacementOracle(n)
    tree2 = parse_newick(backbone_nwk, total_leaves=n)
    o2.init_from_tree(tree2, B)
    o2.run(lambda i: Dp[i], start=B, initial=False)
    names_p = [f"L{i}" for i in perm]
    want = o2.to_newick(names_p)

    e0, belong0, length0, rev0 = backbone_tree_to_arrays(tree, n, np.float64)
    e, belong, length = kclosest.run_add_queries(
        (jnp.asarray(Dp, jnp.float64),),
        jnp.asarray(e0), jnp.asarray(belong0), jnp.asarray(length0),
        jnp.asarray(rev0),
        num_sequences=n, backbone_size=B, frontend="matrix",
        dtype_name="float64",
    )
    got = kclosest.edges_to_newick(*jax.device_get((e, belong, length)),
                                   names_p, n)
    rf, _ = rf_distance(got, want)
    assert rf == 0


def test_add_queries_multifurcating_backbone():
    """A degree-4 backbone node cannot live in the [M,3] adjacency
    table; the --add path must detect it and run the dense witness BFS
    (regression: the compact BFS silently dropped the 4th out-edge)."""
    from dipper_tpu.io.newick import parse_newick
    from dipper_tpu.placement.api import backbone_tree_to_arrays

    n, B = 10, 4
    backbone_nwk = "(L0:0.05,L1:0.08,L2:0.06,L3:0.07);"
    tree = parse_newick(backbone_nwk, total_leaves=n)
    assert tree.num_leaves == B

    rng = np.random.default_rng(11)
    D = _scale(random_additive_matrix(n, rng))

    o = KPlacementOracle(n)
    o.init_from_tree(tree, B)
    o.run(lambda i: D[i], start=B, initial=False)
    names = [f"L{i}" for i in range(n)]
    want = o.to_newick(names)

    e0, belong0, length0, rev0 = backbone_tree_to_arrays(tree, n, np.float64)
    max_deg = int(np.bincount(belong0[belong0 >= 0]).max(initial=0))
    assert max_deg > 3  # the case the compact table cannot represent
    e, belong, length = kclosest.run_add_queries(
        (jnp.asarray(D, jnp.float64),),
        jnp.asarray(e0), jnp.asarray(belong0), jnp.asarray(length0),
        jnp.asarray(rev0),
        num_sequences=n, backbone_size=B, frontend="matrix",
        dtype_name="float64", use_adj=False,
    )
    got = kclosest.edges_to_newick(*jax.device_get((e, belong, length)),
                                   names, n)
    rf, _ = rf_distance(got, want)
    assert rf == 0


def test_chunked_matches_oneshot_and_resumes(tmp_path):
    """Chunked dispatch == one-shot build bitwise; an interrupted run
    resumes from the .npz checkpoint to the identical tree."""
    import jax
    import jax.numpy as jnp
    from dipper_tpu.distance.mash import rank_compress, pad_ranks
    from dipper_tpu.sketch.minhash import sketch_sequences

    from datagen import simulate_unaligned

    rng = np.random.default_rng(9)
    names, seqs = simulate_unaligned(23, 700, rng)
    n, k, ss = len(seqs), 12, 100
    sk = sketch_sequences(seqs, k, ss)
    ranks = pad_ranks(rank_compress(jnp.asarray(sk)))
    kw = dict(num_sequences=n, frontend="mash", frontend_static=(k, ss),
              dtype_name="float64")

    e1, b1, l1 = jax.device_get(kclosest.run_placement((ranks,), **kw))
    st = kclosest.run_placement_chunked((ranks,), chunk=7, **kw)
    assert (np.asarray(st.e) == e1).all()
    assert (np.asarray(st.belong) == b1).all()
    assert np.allclose(np.asarray(st.length), l1)

    # simulate interruption: run 2 chunks manually with checkpointing,
    # then resume from the file
    ckpt = str(tmp_path / "state.npz")
    st0 = kclosest.init_placement_state((ranks,), **kw)
    st0 = kclosest.run_insert_range(st0, jnp.int32(2), jnp.int32(11),
                                    (ranks,), **kw)
    kclosest.save_tree_state(ckpt, st0, 11, n,
                             {"frontend": "mash", "dtype": "float64"})
    st2 = kclosest.run_placement_chunked((ranks,), chunk=5, load_state=ckpt,
                                         **kw)
    assert (np.asarray(st2.e) == e1).all()
    assert np.allclose(np.asarray(st2.length), l1)

    # resuming with a mismatched run fingerprint must be refused
    # (ADVICE r1: same-N different-input resume emitted a corrupt tree)
    import pytest

    with pytest.raises(SystemExit, match="fingerprint"):
        kclosest.run_placement_chunked(
            (ranks,), chunk=5, load_state=ckpt,
            fingerprint={"names_sha256": "deadbeef"}, **kw)


def test_kclosest_caterpillar_topology():
    """Degenerate chain: taxa on a line (d(i,j)=|i-j|) inserted in
    order produce a caterpillar, the worst case for the frontier BFS
    closest-list update (depth ~ N rather than log N;
    kclosest.py frontier loop must propagate the full chain depth)."""
    n = 64
    idx = np.arange(n, dtype=np.float64)
    D = _scale(np.abs(idx[:, None] - idx[None, :]))
    o = _run_oracle(D)
    e, belong, length = _run_device(D)
    used = belong >= 0
    assert (np.asarray(o.e[: used.sum()]) == e[used]).all()
    assert (np.asarray(o.belong[: used.sum()]) == belong[used]).all()
    assert np.allclose(np.asarray(o.len[: used.sum()]), length[used],
                       atol=1e-9)


def test_prefix_caps_match_full(monkeypatch):
    """run_placement_chunked's pow2 prefix-cap buckets (edge slots
    < 4*hi, bank rows < hi per range) are bitwise identical to the
    uncapped one-shot build, and a checkpoint written mid-run under a
    cap holds the full [4N] layout so a resume never sees a capped
    shape."""
    import jax
    import jax.numpy as jnp
    from dipper_tpu.distance.mash import rank_compress, pad_ranks
    from dipper_tpu.sketch.minhash import sketch_sequences

    from datagen import simulate_unaligned

    rng = np.random.default_rng(21)
    names, seqs = simulate_unaligned(90, 600, rng)
    n, k, ss = len(seqs), 12, 100
    sk = sketch_sequences(seqs, k, ss)
    ranks = pad_ranks(rank_compress(jnp.asarray(sk)))
    kw = dict(num_sequences=n, frontend="mash", frontend_static=(k, ss),
              dtype_name="float64")

    full = kclosest.run_placement_full((ranks,), **kw)
    monkeypatch.setattr(kclosest, "_CAP_MIN", 16)
    capped = kclosest.run_placement_chunked((ranks,), chunk=13, **kw)
    for f in kclosest.TreeState._fields:
        a = np.asarray(getattr(full, f))
        b = np.asarray(getattr(capped, f))
        assert a.shape == b.shape and np.array_equal(a, b), f


def test_epoch_scorer_bitwise_matches_direct():
    """The epoch witness scorer (SIDE0 precompute + dirty-edge compact
    rescore, _score_edges_epoch) is bitwise identical to the direct
    per-insertion score_edges on full builds — tiny epoch/tier sizes
    force many epoch refreshes and all three rescore tiers."""
    rng = np.random.default_rng(7)
    n = 257  # not a multiple of any epoch size: exercises tails
    pts = rng.random((n, 6))
    D = _scale(
        np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)))
    Dj = jnp.asarray(D.astype(np.float32))
    kw = dict(num_sequences=n, frontend="matrix", dtype_name="float32")

    direct = kclosest.run_placement_full((Dj,), scorer_cfg=None, **kw)
    for cfg in ((16, 64, 256), (256, 4096, 16384)):
        ep = kclosest.run_placement_full((Dj,), scorer_cfg=cfg, **kw)
        for f in kclosest.TreeState._fields:
            a = np.asarray(getattr(direct, f))
            b = np.asarray(getattr(ep, f))
            assert np.array_equal(a, b), (cfg, f)


def test_epoch_scorer_unaligned_resume():
    """Entering the insertion loop at an epoch-unaligned id (checkpoint
    resume) runs the sentinel full-rescore epoch until the next aligned
    boundary — bitwise equal to one uninterrupted direct build."""
    from dipper_tpu.distance.mash import rank_compress, pad_ranks
    from dipper_tpu.sketch.minhash import sketch_sequences

    from datagen import simulate_unaligned

    rng = np.random.default_rng(31)
    names, seqs = simulate_unaligned(80, 500, rng)
    n, k, ss = len(seqs), 12, 100
    sk = sketch_sequences(seqs, k, ss)
    ranks = pad_ranks(rank_compress(jnp.asarray(sk)))
    kw = dict(num_sequences=n, frontend="mash", frontend_static=(k, ss),
              dtype_name="float64")

    direct = kclosest.run_placement_full((ranks,), scorer_cfg=None, **kw)
    cfg = (16, 32, 64)
    st = kclosest.init_placement_state((ranks,), **kw)
    # split at ids not aligned to the 16-insertion epoch grid
    for lo, hi in ((2, 19), (19, 45), (45, n)):
        st = kclosest.run_insert_range(st, jnp.int32(lo), jnp.int32(hi),
                                       (ranks,), scorer_cfg=cfg, **kw)
    for f in kclosest.TreeState._fields:
        a = np.asarray(getattr(direct, f))
        b = np.asarray(getattr(st, f))
        assert np.array_equal(a, b), f
