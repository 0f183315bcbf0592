"""Exact placement: device engine vs brute-force oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dipper_tpu.placement.exact import run_exact_placement
from dipper_tpu.placement import kclosest
from dipper_tpu.utils.treecmp import rf_distance

from oracle import ExactPlacementOracle
from test_nj import random_additive_matrix


def _run_device(D, dtype="float64"):
    n = D.shape[0]
    e, belong, length = run_exact_placement(
        (jnp.asarray(D, jnp.dtype(dtype)),),
        num_sequences=n, frontend="matrix", dtype_name=dtype,
    )
    return jax.device_get((e, belong, length))


@pytest.mark.parametrize("n", [4, 8, 20, 45])
def test_exact_matches_oracle(n):
    rng = np.random.default_rng(n + 7)
    D = random_additive_matrix(n, rng)
    D = D / (D.max() * 1.05)
    o = ExactPlacementOracle(n)
    o.run(lambda i: D[i])
    e, belong, length = _run_device(D)
    used = belong >= 0
    m = used.sum()
    assert (np.asarray(o.e[:m]) == e[used]).all(), "e mismatch"
    assert (np.asarray(o.belong[:m]) == belong[used]).all()
    assert np.allclose(np.asarray(o.len[:m]), length[used], atol=1e-9)


def test_exact_recovers_additive_tree():
    import collections

    n = 32
    rng = np.random.default_rng(123)
    D = random_additive_matrix(n, rng)
    D = D / (D.max() * 1.05)
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
            assert abs(d[t] - D[s, t]) < 1e-6, (s, t)


def test_exact_noisy_vs_oracle_topology():
    n = 30
    rng = np.random.default_rng(9)
    D = random_additive_matrix(n, rng)
    D += rng.uniform(0, 0.03, D.shape)
    D = (D + D.T) / 2
    np.fill_diagonal(D, 0)
    D = D / (D.max() * 1.05)
    o = ExactPlacementOracle(n)
    o.run(lambda i: D[i])
    e, belong, length = _run_device(D)
    names = [f"L{i}" for i in range(n)]
    got = kclosest.edges_to_newick(e, belong, length, names, n)
    want = o.to_newick(names)
    rf, _ = rf_distance(got, want)
    assert rf == 0


def test_exact_chunked_matches_oneshot_and_resumes(tmp_path):
    """Mirror of the k-closest scale features for exact placement
    (VERDICT r2 #6): chunked dispatch == one-shot bitwise; an
    interrupted run resumes from the .npz checkpoint to the identical
    tree; mismatched fingerprints and cross-engine checkpoints are
    refused."""
    from dipper_tpu.placement import exact

    n = 40
    rng = np.random.default_rng(17)
    D = random_additive_matrix(n, rng)
    D = D / (D.max() * 1.05)
    Dd = jnp.asarray(D, jnp.float64)
    kw = dict(num_sequences=n, frontend="matrix", dtype_name="float64")

    e1, b1, l1 = _run_device(D)
    st = exact.run_exact_chunked((Dd,), chunk=7, **kw)
    assert (np.asarray(st.e) == e1).all()
    assert (np.asarray(st.belong) == b1).all()
    assert (np.asarray(st.length) == l1).all()

    ckpt = str(tmp_path / "exact_state.npz")
    st0 = exact.init_exact_state((Dd,), **kw)
    st0 = exact.run_exact_range(st0, jnp.int32(2), jnp.int32(13), (Dd,), **kw)
    kclosest.save_tree_state(
        ckpt, st0, 13, n,
        {"frontend": "matrix", "dtype": "float64", "placement": "exact"})
    st2 = exact.run_exact_chunked((Dd,), chunk=9, load_state=ckpt, **kw)
    assert (np.asarray(st2.e) == e1).all()
    assert (np.asarray(st2.length) == l1).all()

    with pytest.raises(SystemExit, match="fingerprint"):
        exact.run_exact_chunked(
            (Dd,), chunk=9, load_state=ckpt,
            fingerprint={"names_sha256": "deadbeef"}, **kw)

    # a k-closest TreeState checkpoint must be refused by the exact loader
    stk = kclosest.init_placement_state((Dd,), **kw)
    kck = str(tmp_path / "kclosest_state.npz")
    kclosest.save_tree_state(
        kck, stk, 2, n,
        {"frontend": "matrix", "dtype": "float64", "placement": "exact"})
    with pytest.raises(SystemExit, match="ExactState"):
        exact.run_exact_chunked((Dd,), chunk=9, load_state=kck, **kw)
