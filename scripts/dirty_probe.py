"""Probe the epoch scorer's dirty-set growth: how many edges' witness
lists change within an epoch of T insertions at a given operating
point. Picks the compact-rescore tier sizes (SCORER_CFG).

Usage: python scripts/dirty_probe.py [N] [ITERS] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from dipper_tpu.placement import kclosest as KC
from placement_micro import build_state


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    warm = n // 2
    st0, D = build_state(n, warm)
    lo = (warm - iters) // T * T

    @jax.jit
    def probe(st, lo, D):
        stats = jnp.zeros((iters, 2), jnp.int32)

        def body(j, carry):
            st, ep, stats = carry
            i = jnp.asarray(lo + j, jnp.int32)
            row = jax.lax.dynamic_index_in_dim(D, i, 0, keepdims=False)
            ep = jax.lax.cond(
                i % T == 0,
                lambda a: KC._make_epoch(
                    a[0], jax.lax.dynamic_slice_in_dim(
                        D, (i // T) * T, T, axis=0), i),
                lambda a: ep, (st,))
            dirty = jnp.any((st.cid != ep.cid0)
                            | (st.cdis != ep.cdis0), axis=1)
            rev_changed = (st.rev != ep.rev0) & (st.belong >= 0)
            nd = jnp.sum(dirty.astype(jnp.int32))
            nf = nd + jnp.sum(rev_changed.astype(jnp.int32))
            stats = stats.at[j].set(jnp.stack([nd, nf]))
            eid, frac, add = KC.score_edges(st, row)
            st = KC.splice(st, eid, frac, add, i, n)
            st = KC.update_closest_bfs(st, i, 2 * n)
            return st, ep, stats

        ep0 = KC._sentinel_epoch(st, T, lo)
        _, _, stats = jax.lax.fori_loop(0, iters, body, (st, ep0, stats))
        return stats

    t0 = time.time()
    stats = np.asarray(probe(st0, jnp.int32(lo), D))
    print(f"probe in {time.time()-t0:.1f}s (n={n}, T={T})")
    off = np.arange(iters) % T  # offset within epoch
    nd, nf = stats[:, 0], stats[:, 1]
    for q in (50, 90, 99, 100):
        print(f"p{q:<3} ndirty={int(np.percentile(nd, q)):6d} "
              f"nfix={int(np.percentile(nf, q)):6d}")
    # growth rate: mean dirty at end-of-epoch offsets
    tailsel = off >= T - max(1, T // 8)
    if tailsel.any():
        print(f"end-of-epoch mean ndirty={nd[tailsel].mean():.0f} "
              f"(~{nd[tailsel].mean()/T:.1f}/insertion)")


if __name__ == "__main__":
    main()
