"""Fine-grained attribution of k-closest insertion cost on the chip.

Modes timed inside a jitted fori_loop (real state mutation each iter):
  gather   — just the [E,K] dist_row[cid] gather of score_edges
  score    — full score_edges
  bfs1     — exactly one BFS level (body of the while_loop, once)
  bfs4     — four BFS levels
  depth    — count BFS levels per insertion (prints mean/max)

Usage: python scripts/bfs_probe.py [N] [ITERS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from dipper_tpu.placement import kclosest as KC
from scripts.placement_micro import build_state


def bfs_levels(st, leaf, M, nlev=None, count=False):
    """Replicates update_closest_bfs but with a bounded level count or
    a level counter."""
    dtype = st.length.dtype
    leaf = jnp.asarray(leaf, jnp.int32)
    frontier = jnp.zeros((M,), jnp.bool_).at[leaf].set(True)
    from_node = jnp.full((M,), -1, jnp.int32)
    distx = jnp.zeros((M,), dtype)

    def body_once(c):
        st, frontier, from_node, distx, lev = c
        src = st.belong
        used = src >= 0
        srcc = jnp.where(used, src, 0)
        act = used & frontier[srcc] & (st.e != from_node[srcc])
        d = distx[srcc]
        pos = jnp.sum((st.cdis <= d[:, None]).astype(jnp.int32), axis=1)
        ok = act & (pos < KC.K)
        slot = jax.lax.broadcasted_iota(jnp.int32, (st.cdis.shape[0], KC.K), 1)
        before = slot < pos[:, None]
        at = slot == pos[:, None]
        shifted_cd = jnp.concatenate(
            [jnp.full((st.cdis.shape[0], 1), KC.SENT_DIS, dtype),
             st.cdis[:, :-1]], axis=1)
        shifted_id = jnp.concatenate(
            [jnp.full((st.cid.shape[0], 1), -1, jnp.int32),
             st.cid[:, :-1]], axis=1)
        new_cd = jnp.where(before, st.cdis, jnp.where(at, d[:, None], shifted_cd))
        new_id = jnp.where(before, st.cid, jnp.where(at, leaf, shifted_id))
        cdis = jnp.where(ok[:, None], new_cd, st.cdis)
        cid = jnp.where(ok[:, None], new_id, st.cid)
        dst = jnp.where(ok, st.e, M)
        nfront = jnp.zeros((M,), jnp.bool_).at[dst].set(
            True, mode="drop", unique_indices=True)
        from_node = from_node.at[dst].set(src, mode="drop", unique_indices=True)
        distx = distx.at[dst].set(d + st.length, mode="drop",
                                  unique_indices=True)
        return st._replace(cdis=cdis, cid=cid), nfront, from_node, distx, lev + 1

    c = (st, frontier, from_node, distx, jnp.int32(0))
    if count:
        c = jax.lax.while_loop(lambda c: jnp.any(c[1]), body_once, c)
        return c[0], c[4]
    for _ in range(nlev):
        c = body_once(c)
    return c[0], c[4]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    warm = n // 2
    st0, D = build_state(n, warm)
    reps = 3

    def loop(lo, hi, st, D, mode):
        def body(i, st):
            row = jax.lax.dynamic_index_in_dim(D, i, 0, keepdims=False)
            if mode == "gather":
                ids = jnp.maximum(st.cid, 0)
                dv = row[ids] - st.cdis
                return st._replace(length=st.length.at[0].add(dv.max() * 0))
            eid, frac, add = KC.score_edges(st, row)
            if mode == "score":
                return st._replace(length=st.length.at[eid].add(add * 0))
            st = KC.splice(st, eid, frac, add, i, n)
            if mode in ("bfs1", "bfs4"):
                st, _ = bfs_levels(st, i, 2 * n, nlev=1 if mode == "bfs1" else 4)
                return st
            raise ValueError(mode)
        return jax.lax.fori_loop(lo, hi, body, st)

    for mode in ("gather", "score", "bfs1", "bfs4"):
        fn = jax.jit(loop, static_argnames=("mode",))
        out = fn(jnp.int32(warm), jnp.int32(warm + iters), st0, D, mode)
        np.asarray(out.length)
        best = 1e9
        for r in range(reps):
            lo = warm + 1 + r
            t0 = time.time()
            out = fn(jnp.int32(lo), jnp.int32(lo + iters), st0, D, mode)
            np.asarray(out.length)
            best = min(best, time.time() - t0)
        print(f"{mode:8s} {best/iters*1e3:8.3f} ms/insertion")
        sys.stdout.flush()

    # depth statistics (host loop; tiny sample)
    def one(st, i):
        row = D[i]
        eid, frac, add = KC.score_edges(st, row)
        st = KC.splice(st, eid, frac, add, i, n)
        return bfs_levels(st, i, 2 * n, count=True)
    one_j = jax.jit(one)
    depths = []
    st = st0
    for i in range(warm, warm + 32):
        st, lev = one_j(st, jnp.int32(i))
        depths.append(int(lev))
    print(f"depth    mean {np.mean(depths):.1f} max {np.max(depths)}")


if __name__ == "__main__":
    main()
