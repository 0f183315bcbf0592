"""Driver-facing placement entry points (k-closest and exact)."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from dipper_tpu.utils.params import Param
from dipper_tpu.placement import kclosest


def _log(m):
    print(m, file=sys.stderr)


def _dtype_name(params: Param) -> str:
    return str(jnp.dtype(params.dtype))


def run_fingerprint(params: Param, names) -> dict:
    """Identifies a build for checkpoint/resume: resuming with a
    different input file, shuffle seed, or sketch config that happens
    to share N must be refused (the distance rows would not match)."""
    import hashlib

    h = hashlib.sha256()
    for nm in names:
        h.update(nm.encode())
        h.update(b"\0")
    return {
        "names_sha256": h.hexdigest()[:16],
        "shuffle_seed": params.shuffle_seed,
        "kmer_size": params.kmer_size,
        "sketch_size": params.sketch_size,
        "distance_type": params.distance_type,
        "in_format": params.in_format,
    }


def _mash_frontend(seqs, params: Param, log=None):
    import time

    from dipper_tpu.sketch.bank import get_sketch_bank
    from dipper_tpu.distance.mash import rank_compress_host, pad_ranks

    t0 = time.time()
    sk = get_sketch_bank(seqs, params)
    if log:
        log(f"Sketch in: {int((time.time() - t0) * 1000)} ms")
    t0 = time.time()
    # rank-compress on host (order/equality-identical to the device
    # path; np.unique avoids the hierarchical sort's compile blowup at
    # bank scale) and upload the padded int32 bank in one H2D push
    ranks = jax.block_until_ready(
        jax.device_put(pad_ranks(rank_compress_host(np.asarray(sk)))))
    if log:
        log(f"Rank bank in: {int((time.time() - t0) * 1000)} ms")
    return (ranks,), (params.kmer_size, params.sketch_size)


def _msa_frontend(seqs, params: Param):
    """Packed 4-bit codes stay the resident bank ([N, L] bytes; the
    one-hot channels are expanded per tile inside the jit —
    distance/msa.py msa_tiled_block — so `-i m` placement survives
    100K x 10kb instead of holding a 5 GB [N,5,L] bank)."""
    from dipper_tpu.io.encode import batch_codes, encode_4bit_codes

    codes, _ = batch_codes(seqs, encode_4bit_codes, pad_value=4)
    nongap = (codes < 4).sum(axis=1)
    return (
        (jnp.asarray(codes), jnp.asarray(nongap, jnp.dtype(params.dtype))),
        (params.distance_type,),
    )


def build_placement_tree_from_matrix(D, names, params: Param, exact=False,
                                     log=None) -> str:
    n = len(names)
    if exact:
        from dipper_tpu.placement.exact import run_exact_placement

        e, belong, length = run_exact_placement(
            (jnp.asarray(D, jnp.dtype(params.dtype)),),
            num_sequences=n, frontend="matrix", dtype_name=_dtype_name(params),
            chunk=params.state_chunk, save_state=params.save_state,
            load_state=params.load_state,
            fingerprint=run_fingerprint(params, names), log=log,
        )
    else:
        st = kclosest.run_placement_chunked(
            (jnp.asarray(D, jnp.dtype(params.dtype)),),
            num_sequences=n, frontend="matrix", dtype_name=_dtype_name(params),
            chunk=params.state_chunk, save_state=params.save_state,
            load_state=params.load_state, use_caps=params.prefix_caps,
            fingerprint=run_fingerprint(params, names), log=log,
        )
        e, belong, length = st.e, st.belong, st.length
    return kclosest.edges_to_newick(*jax.device_get((e, belong, length)),
                                    names, n)


def build_placement_tree_from_seqs(seqs, names, params: Param, exact=False,
                                   log=None) -> str:
    n = len(seqs)
    if params.in_format == "m":
        frontend_args, frontend_static = _msa_frontend(seqs, params)
        frontend = "msa"
    else:
        frontend_args, frontend_static = _mash_frontend(seqs, params, log=log)
        frontend = "mash"
    if exact:
        from dipper_tpu.placement.exact import run_exact_placement

        e, belong, length = run_exact_placement(
            frontend_args, num_sequences=n, frontend=frontend,
            frontend_static=frontend_static, dtype_name=_dtype_name(params),
            chunk=params.state_chunk, save_state=params.save_state,
            load_state=params.load_state,
            fingerprint=run_fingerprint(params, names), log=log,
        )
    else:
        st = kclosest.run_placement_chunked(
            frontend_args, num_sequences=n, frontend=frontend,
            frontend_static=frontend_static, dtype_name=_dtype_name(params),
            chunk=params.state_chunk, save_state=params.save_state,
            load_state=params.load_state, use_caps=params.prefix_caps,
            fingerprint=run_fingerprint(params, names), log=log,
        )
        e, belong, length = st.e, st.belong, st.length
    return kclosest.edges_to_newick(*jax.device_get((e, belong, length)),
                                    names, n)


def backbone_tree_to_arrays(tree, num_sequences: int, dtype):
    """Host Tree -> device edge arrays via postorder DFS emitting
    child->parent then parent->child edge pairs
    (initializeDeviceArrays, src/placement_close_k.cu:159-184)."""
    E = 4 * num_sequences
    e = np.full(E, -1, np.int32)
    belong = np.full(E, -1, np.int32)
    length = np.zeros(E, np.float64)
    rev = np.full(E, -1, np.int32)
    cursor = 0

    stack = [(tree.root, False)]
    order = []
    while stack:
        node, done = stack.pop()
        if done:
            order.append(node)
            continue
        stack.append((node, True))
        # push reversed so children are visited in order (matches the
        # reference's recursive postorder; edge-id order is load-bearing
        # for argmin tie-breaks)
        for ch in reversed(node.children):
            stack.append((ch, False))
    for node in order:
        if node.parent is None:
            continue
        x, y = node.idx, node.parent.idx
        e[cursor] = y
        belong[cursor] = x
        length[cursor] = node.bl
        rev[cursor] = cursor + 1
        e[cursor + 1] = x
        belong[cursor + 1] = y
        length[cursor + 1] = node.bl
        rev[cursor + 1] = cursor
        cursor += 2
    return e, belong, length, rev


def add_queries_to_backbone(tree, seqs, names, params: Param,
                            backbone_size: int, log=None) -> str:
    n = len(seqs)
    if params.in_format == "m":
        frontend_args, frontend_static = _msa_frontend(seqs, params)
        frontend = "msa"
    elif params.in_format == "r":
        frontend_args, frontend_static = _mash_frontend(seqs, params, log=log)
        frontend = "mash"
    else:
        print("Adding new sequences only supported with input aligned "
              "and unaligned sequences", file=sys.stderr)
        raise SystemExit(1)
    dtype = jnp.dtype(params.dtype)
    e0, belong0, length0, rev0 = backbone_tree_to_arrays(tree, n, dtype)
    # multifurcating backbones (legal Newick, handled by the reference's
    # linked-list adjacency) have out-degree > 3 and would overflow the
    # [M,3] compact-BFS table — route them through the dense BFS
    max_deg = int(np.bincount(belong0[belong0 >= 0]).max(initial=0))
    if max_deg > 3 and log:
        log(f"Backbone has multifurcations (max degree {max_deg}); "
            "using dense witness BFS")
    e, belong, length = kclosest.run_add_queries(
        frontend_args,
        jnp.asarray(e0), jnp.asarray(belong0),
        jnp.asarray(length0, dtype), jnp.asarray(rev0),
        num_sequences=n, backbone_size=backbone_size, frontend=frontend,
        frontend_static=frontend_static, dtype_name=_dtype_name(params),
        use_adj=(max_deg <= 3),
    )
    return kclosest.edges_to_newick(*jax.device_get((e, belong, length)),
                                    names, n)
