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
