"""Pipeline driver: mode dispatch mirroring src/tree_generation.cu:159-648.

Auto-mode thresholds (tree_generation.cu:247-248): NJ for N < 30_000,
placement for 30_000 <= N < 1_000_000, divide-and-conquer above.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from dipper_tpu.utils.params import Param, PLACEMENT_THRESHOLD, DC_THRESHOLD


def _log(msg: str):
    print(msg, file=sys.stderr)


def _write_tree(nwk: str, out_path: str):
    """Write the Newick output (process 0 only under multi-host: every
    process computes the same replicated result; one writer suffices)."""
    from dipper_tpu.parallel.distributed import is_primary

    if not is_primary():
        return
    with open(out_path, "w") as f:
        f.write(nwk + "\n")

def _choose_mode(algo: str, n: int) -> str:
    if algo == "1":
        return "placement"
    if algo == "2":
        return "nj"
    if algo == "3":
        return "dc"
    if n >= DC_THRESHOLD:
        return "dc"
    if n >= PLACEMENT_THRESHOLD:
        return "placement"
    return "nj"


def _load_sequences(params: Param, path: str):
    """Read FASTA + apply the input-order shuffle
    (tree_generation.cu:341-344: ids are shuffled and sequence i is
    stored at slot ids[i])."""
    from dipper_tpu.io.fasta import read_fasta

    names_in, seqs_in = read_fasta(path)
    n = len(seqs_in)
    if params.shuffle_seed is not None:
        rng = np.random.default_rng(params.shuffle_seed)
        ids = rng.permutation(n)
    else:
        ids = np.arange(n)
    names = [""] * n
    seqs = [b""] * n
    for i in range(n):
        names[ids[i]] = names_in[i]
        seqs[ids[i]] = seqs_in[i]
    return names, seqs


def run_pipeline(params: Param, algo: str, placemode: str, args) -> None:
    out_path = args.output_file

    if args.add:
        _run_add(params, args, out_path)
        return

    if params.in_format == "d":
        _run_matrix(params, algo, placemode, args, out_path)
    elif params.in_format in ("r", "m"):
        _run_sequences(params, algo, placemode, args, out_path)
    else:
        raise SystemExit("Invalid input-output combination")


# ---------------------------------------------------------------------------


def _run_matrix(params: Param, algo: str, placemode: str, args, out_path: str):
    from dipper_tpu.io.phylip import read_phylip_lower_triangular

    t0 = time.time()
    names, D = read_phylip_lower_triangular(args.input_file)
    n = len(names)
    _log(f"Input in: {int((time.time() - t0) * 1000)} ms")
    mode = _choose_mode(algo, n)
    if mode == "dc":
        raise SystemExit("Divide-and-conquer mode not supported with input matrix")
    if mode == "nj":
        _log("Using conventional NJ")
        if n >= 40_000:
            _log("Warning: forcing conventional NJ on large datasets "
                 "might result in unexpected behavior")
        _write_nj(D, names, params, out_path)
    else:
        _run_placement_from_matrix(D, names, params, placemode, out_path)


def _run_sequences(params: Param, algo: str, placemode: str, args, out_path: str):
    t0 = time.time()
    names, seqs = _load_sequences(params, args.input_file)
    n = len(seqs)
    _log(f"Input in: {int((time.time() - t0) * 1000)} ms")

    if params.out_format == "d":
        # distance-matrix output (listed as "coming soon" in the
        # reference docs; implemented here)
        import numpy as np
        from dipper_tpu.io.phylip import write_phylip_lower_triangular

        D = np.asarray(_distance_matrix(params, seqs), dtype=np.float64)
        write_phylip_lower_triangular(names, D, out_path)
        return

    mode = _choose_mode(algo, n)

    if mode == "nj":
        _log("Using conventional NJ")
        if n >= 40_000:
            _log("Warning: forcing conventional NJ on large datasets "
                 "might result in unexpected behavior")
        D = _distance_matrix(params, seqs)
        _write_nj(D, names, params, out_path)
    elif mode == "placement":
        _run_placement_from_seqs(seqs, names, params, placemode, out_path)
    else:
        _run_dc(seqs, names, params, out_path)


def _distance_matrix(params: Param, seqs) -> np.ndarray:
    if params.in_format == "m":
        from dipper_tpu.distance.msa import msa_distance_matrix_device
        from dipper_tpu.io.encode import batch_codes, encode_4bit_codes

        codes, lengths = batch_codes(seqs, encode_4bit_codes, pad_value=4)
        return msa_distance_matrix_device(
            codes, params.distance_type, dtype=params.dtype
        )
    else:
        from dipper_tpu.sketch.bank import get_sketch_bank
        from dipper_tpu.distance.mash import mash_distance_matrix_device

        sketches = get_sketch_bank(seqs, params, as_device=True)
        return mash_distance_matrix_device(
            sketches, params.kmer_size, params.sketch_size, dtype=params.dtype
        )


def _make_mesh(params: Param):
    """Mesh over the first `params.devices` local devices, or None for
    the default single-chip path."""
    if params.devices <= 1:
        return None
    from dipper_tpu.parallel.sharded import make_mesh

    import jax

    nd = min(params.devices, len(jax.devices()))
    if nd <= 1:
        return None
    _log(f"Sharding over {nd} devices")
    return make_mesh(nd)


def _write_nj(D: np.ndarray, names, params: Param, out_path: str):
    from dipper_tpu.nj import neighbor_joining_device, nj_tree_newick

    children, root = neighbor_joining_device(D, dtype=params.dtype,
                                             mesh=_make_mesh(params))
    nwk = nj_tree_newick(children, root, names)
    _write_tree(nwk, out_path)


def _run_placement_from_matrix(D, names, params, placemode, out_path: str):
    from dipper_tpu.placement import build_placement_tree_from_matrix

    exact = placemode == "0"
    _log("Using exact placement mode" if exact else "Using k-closest placement mode")
    nwk = build_placement_tree_from_matrix(
        D, names, params, exact=exact, log=_log
    )
    _write_tree(nwk, out_path)


def _run_placement_from_seqs(seqs, names, params, placemode, out_path: str):
    from dipper_tpu.placement import build_placement_tree_from_seqs

    exact = placemode == "0"
    _log("Using exact placement mode" if exact else "Using k-closest placement mode")
    nwk = build_placement_tree_from_seqs(seqs, names, params, exact=exact,
                                        log=_log)
    _write_tree(nwk, out_path)


def _run_dc(seqs, names, params, out_path: str):
    _log("Using divide-and-conquer mode")
    from dipper_tpu.dc import build_dc_tree

    params.backbone_size = len(seqs) // 20
    params.batch_size = params.backbone_size
    nwk = build_dc_tree(seqs, names, params, mesh=_make_mesh(params))
    _write_tree(nwk, out_path)


def _run_add(params: Param, args, out_path: str):
    """--add: place query tips onto an existing backbone tree
    (tree_generation.cu:252-332)."""
    from dipper_tpu.io.newick import parse_newick
    from dipper_tpu.placement import add_queries_to_backbone

    names_dump, seqs = _load_sequences(
        # --add path does NOT shuffle in the reference
        Param(**{**params.__dict__, "shuffle_seed": None}), args.input_file
    )
    with open(args.input_tree) as f:
        newick = f.readline().strip()
    tree = parse_newick(newick, total_leaves=len(seqs))
    backbone_size = tree.num_leaves
    # remap: backbone leaves keep their tree ids; queries appended
    names = [""] * backbone_size
    id_map = {}
    for i, nm in enumerate(names_dump):
        node = tree.all_nodes.get(nm)
        if node is None or not node.is_leaf():
            names.append(nm)
            id_map[i] = len(names) - 1
        else:
            names[node.idx] = nm
            id_map[i] = node.idx
    seqs_re = [b""] * len(seqs)
    for i, s in enumerate(seqs):
        seqs_re[id_map[i]] = s
    nwk = add_queries_to_backbone(tree, seqs_re, names, params, backbone_size,
                                  log=_log)
    _write_tree(nwk, out_path)
