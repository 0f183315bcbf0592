"""Multi-chip sharding over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.4); this layer is the
TPU-native scale-out it never had. Decomposition (per BASELINE.json
north star):

- the SKETCH/RANK BANK is sharded row-wise across devices
  (P('d', None)) — the memory that grows with taxa count;
- the per-insertion DISTANCE ROW is computed shard-locally against the
  local bank slice and combined with an all_gather (riding ICI);
- the EDGE-SCORING SCAN is sharded by edge blocks; the global
  (addi, eid) argmin merges via a tiny gathered reduction whose
  device order preserves the lowest-eid tie-break;
- tree state (edge arrays, witness lists) is replicated and every
  device applies the same splice/BFS updates, so no broadcast of
  topology decisions is needed — determinism keeps replicas identical;
- for divide-and-conquer, phase-3 clusters shard across devices as a
  batch axis (data-parallel analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dipper_tpu.placement import kclosest
from dipper_tpu.placement.kclosest import TreeState


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("d",))


# ---------------------------------------------------------------------------
# Sharded mash distance matrix (NJ frontend at scale)
# ---------------------------------------------------------------------------


def sharded_mash_matrix(ranks_pad, k: int, sketch_size: int, mesh: Mesh,
                        dtype="float32"):
    """Row-sharded [N, N] mash distance matrix: device i computes the
    row block of its bank shard against the full bank (gathered
    shard-by-shard over ICI)."""
    from dipper_tpu.distance.mash import mash_rows_vs_bank

    dtype_name = str(jnp.dtype(dtype))
    N = ranks_pad.shape[0]
    nd = mesh.devices.size
    pad = (-N) % nd
    if pad:
        ranks_pad = jnp.concatenate(
            [ranks_pad, jnp.tile(ranks_pad[-1:], (pad, 1))], axis=0
        )
    Np = ranks_pad.shape[0]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("d", None),), out_specs=P(None, "d"),
    )
    def run(bank_local):
        # full bank via all_gather (tiled) — the A side; local rows are
        # the B (new taxon) side, matching the reference orientation
        bank_full = jax.lax.all_gather(bank_local, "d", tiled=True)

        def row(q_local):
            return mash_rows_vs_bank(
                bank_full, bank_local[q_local], k=k,
                sketch_size=sketch_size, dtype_name=dtype_name, impl="xla")

        rows = jax.lax.map(row, jnp.arange(bank_local.shape[0]))
        return rows.T  # [N_full, rows_local] -> concat over 'd' on axis 1

    D = jax.jit(run)(ranks_pad)
    return D[:N, :N]


# ---------------------------------------------------------------------------
# Sharded k-closest placement
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("num_sequences", "k", "sketch_size",
                              "dtype_name", "mesh_holder"),
)
def _sharded_placement_jit(ranks_sharded, *, num_sequences, k, sketch_size,
                           dtype_name, mesh_holder):
    mesh = mesh_holder.mesh
    N = num_sequences
    dtype = jnp.dtype(dtype_name)
    nd = mesh.devices.size
    E = 4 * N

    from dipper_tpu.distance.mash import mash_rows_vs_bank

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("d", None),),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def run(bank_local):
        sh = bank_local.shape[0]
        didx = jax.lax.axis_index("d")

        def query_ranks(q):
            lq = q - didx * sh
            owned = (lq >= 0) & (lq < sh)
            qr = jnp.where(owned,
                           bank_local[jnp.clip(lq, 0, sh - 1)],
                           jnp.zeros_like(bank_local[0]))
            return jax.lax.psum(qr, "d")

        def dist_row(q):
            qr = query_ranks(q)
            local = mash_rows_vs_bank(bank_local, qr, k=k,
                                      sketch_size=sketch_size,
                                      dtype_name=dtype_name, impl="xla")
            return jax.lax.all_gather(local, "d", tiled=True)[:N]

        def score_sharded(st, row):
            # score a local slice of edges; merge (addi, frac, eid).
            # ceil-sized slices with a clamped start cover E not
            # divisible by nd: the last shard overlaps its neighbor,
            # which is argmin-safe (duplicated edges score identically
            # and the first-device tie-break picks the earlier shard)
            el = -(-E // nd)
            lo = jnp.minimum(didx * el, E - el)
            sl = TreeState(
                e=jax.lax.dynamic_slice_in_dim(st.e, lo, el),
                belong=jax.lax.dynamic_slice_in_dim(st.belong, lo, el),
                length=jax.lax.dynamic_slice_in_dim(st.length, lo, el),
                rev=st.rev,  # rev indexes the global edge space
                cdis=jax.lax.dynamic_slice_in_dim(st.cdis, lo, el),
                cid=jax.lax.dynamic_slice_in_dim(st.cid, lo, el),
                idx=st.idx,
            )
            # dis2 needs side values of reverse edges, which may live in
            # another shard: compute side globally shard-wise + gather.
            ids = jnp.maximum(sl.cid, 0)
            dv = jnp.where(sl.cid != -1, row[ids] - sl.cdis, -jnp.inf)
            side_local = jnp.maximum(jnp.max(dv, axis=1), 0.0)
            side = jax.lax.all_gather(side_local, "d", tiled=True)
            dis1 = side_local
            dis2 = side[jax.lax.dynamic_slice_in_dim(st.rev, lo, el)]
            L = sl.length
            addi = jnp.maximum((dis1 + dis2 - L) * 0.5, 0.0)
            d1 = jnp.maximum(dis1 - addi, 0.0)
            d2 = jnp.maximum(dis2 - addi, 0.0)
            addi = addi + jnp.maximum(d1 - L, 0.0) + jnp.maximum(d2 - L, 0.0)
            d1 = jnp.minimum(d1, L)
            d2 = jnp.minimum(d2, L)
            rest = L - d1 - d2
            d1 = d1 + rest * 0.5
            valid = sl.belong > sl.e
            score = jnp.where(valid, addi, jnp.asarray(2.0, dtype))
            frac = jnp.where(valid, d1, 0.0)
            li = jnp.argmin(score)
            trio = jnp.stack([score[li], frac[li],
                              (li + lo).astype(dtype)])
            allt = jax.lax.all_gather(trio, "d")          # [nd, 3]
            # device order ascends eid blocks; first-min == global
            # lowest-eid tie-break
            w = jnp.argmin(allt[:, 0])
            return (allt[w, 2].astype(jnp.int32), allt[w, 1], allt[w, 0])

        st = kclosest.init_state(N, dtype)
        row1 = dist_row(jnp.int32(1))
        st = kclosest.build_initial_tree(st, row1[0].astype(dtype), N)
        st = kclosest.update_closest_bfs(st, jnp.int32(0), 2 * N)
        st = kclosest.update_closest_bfs(st, jnp.int32(1), 2 * N)

        def body(i, st):
            row = dist_row(i)
            eid, frac, add = score_sharded(st, row)
            st = kclosest.splice(st, eid, frac, add, i, N)
            return kclosest.update_closest_bfs(st, i, 2 * N)

        st = jax.lax.fori_loop(2, N, body, st)
        return st.e, st.belong, st.length

    return run(ranks_sharded)


class _MeshHolder:
    """Hashable wrapper so a Mesh can be a static jit argument."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash(tuple(d.id for d in self.mesh.devices.flat))

    def __eq__(self, other):
        return isinstance(other, _MeshHolder) and hash(self) == hash(other)


def sharded_placement_build(sketches_u64, k: int, sketch_size: int,
                            mesh: Mesh, dtype="float32"):
    """Full k-closest placement with the distance row and edge scan
    sharded over the mesh. Returns host (e, belong, length)."""
    from dipper_tpu.distance.mash import rank_compress_host, pad_ranks

    N = int(sketches_u64.shape[0])
    nd = mesh.devices.size
    # host rank compression (order/equality-identical to the device
    # sort path), padded before the sharded device_put below
    ranks = pad_ranks(rank_compress_host(np.asarray(sketches_u64)))
    pad = (-N) % nd  # pad bank rows so the shard split is even; the
    if pad:          # distance gather slices back to [:N]
        ranks = np.concatenate([ranks, np.tile(ranks[-1:], (pad, 1))],
                               axis=0)
    sharding = jax.sharding.NamedSharding(mesh, P("d", None))
    ranks_sharded = jax.device_put(ranks, sharding)
    e, belong, length = _sharded_placement_jit(
        ranks_sharded, num_sequences=N, k=k, sketch_size=sketch_size,
        dtype_name=str(jnp.dtype(dtype)), mesh_holder=_MeshHolder(mesh),
    )
    return jax.device_get((e, belong, length))
