"""End-to-end: forced placement mode (-m 1) and --add through the CLI."""

import numpy as np

from dipper_tpu.cli import main
from dipper_tpu.utils.treecmp import rf_distance
from dipper_tpu.io.phylip import write_phylip_lower_triangular

from oracle import KPlacementOracle
from datagen import simulate_unaligned, write_fasta
from test_nj import random_additive_matrix


def test_cli_placement_matrix(tmp_path):
    n = 35
    rng = np.random.default_rng(21)
    D = random_additive_matrix(n, rng)
    D = D / (D.max() * 1.05)
    names = [f"T{i}" for i in range(n)]
    inp = tmp_path / "in.phy"
    outp = tmp_path / "out.nwk"
    write_phylip_lower_triangular(names, D, str(inp))
    rc = main(["-i", "d", "-I", str(inp), "-O", str(outp), "-m", "1",
               "--precision", "f64"])
    assert rc == 0
    o = KPlacementOracle(n)
    o.run(lambda i: D[i])
    want = o.to_newick(names)
    rf, _ = rf_distance(outp.read_text(), want)
    assert rf == 0


def test_cli_placement_mash(tmp_path):
    from dipper_tpu.sketch.minhash import sketch_sequences
    import oracle as orc

    rng = np.random.default_rng(31)
    names, seqs = simulate_unaligned(20, 1500, rng)
    inp = tmp_path / "in.fa"
    outp = tmp_path / "out.nwk"
    write_fasta(str(inp), names, seqs)
    rc = main(["-i", "r", "-I", str(inp), "-O", str(outp), "-m", "1",
               "-k", "12", "-s", "150", "--precision", "f64", "--seed", "-1"])
    assert rc == 0

    sk = sketch_sequences(seqs, 12, 150)
    n = len(seqs)
    D = np.zeros((n, n))
    for i in range(n):
        for j in range(i):
            D[i, j] = D[j, i] = orc.mash_distance(sk[j], sk[i], 12, 150)
    o = KPlacementOracle(n)
    o.run(lambda i: D[i])
    want = o.to_newick(names)
    rf, _ = rf_distance(outp.read_text(), want)
    assert rf == 0


def test_cli_no_prefix_caps_identical(tmp_path):
    """--no-prefix-caps (single-program chunked build) must produce a
    byte-identical tree to the default pow2-cap-bucket path."""
    n = 40
    rng = np.random.default_rng(29)
    D = random_additive_matrix(n, rng)
    D = D / (D.max() * 1.05)
    names = [f"T{i}" for i in range(n)]
    inp = tmp_path / "in.phy"
    write_phylip_lower_triangular(names, D, str(inp))
    out_cap = tmp_path / "cap.nwk"
    out_nc = tmp_path / "nocap.nwk"
    assert main(["-i", "d", "-I", str(inp), "-O", str(out_cap),
                 "-m", "1", "--precision", "f64",
                 "--state-chunk", "8"]) == 0
    assert main(["-i", "d", "-I", str(inp), "-O", str(out_nc),
                 "-m", "1", "--precision", "f64",
                 "--state-chunk", "8", "--no-prefix-caps"]) == 0
    assert out_cap.read_text() == out_nc.read_text()


def test_cli_add_to_backbone(tmp_path):
    """--add: build a backbone with placement, then add held-out tips."""
    rng = np.random.default_rng(41)
    names, seqs = simulate_unaligned(24, 1500, rng)
    B = 16
    back_fa = tmp_path / "back.fa"
    all_fa = tmp_path / "all.fa"
    back_nwk = tmp_path / "back.nwk"
    out_nwk = tmp_path / "out.nwk"
    write_fasta(str(back_fa), names[:B], seqs[:B])
    write_fasta(str(all_fa), names, seqs)
    rc = main(["-i", "r", "-I", str(back_fa), "-O", str(back_nwk), "-m", "1",
               "-k", "12", "-s", "150", "--precision", "f64", "--seed", "-1"])
    assert rc == 0
    rc = main(["-i", "r", "-I", str(all_fa), "-O", str(out_nwk), "--add",
               "-t", str(back_nwk), "-k", "12", "-s", "150",
               "--precision", "f64", "--seed", "-1"])
    assert rc == 0
    out = out_nwk.read_text().strip()
    # all 24 leaves present, backbone splits preserved for backbone taxa
    from dipper_tpu.utils.treecmp import _splits_from_newick
    splits, leaves = _splits_from_newick(out)
    assert leaves == set(names)
    back_splits, back_leaves = _splits_from_newick(back_nwk.read_text())
    assert back_leaves == set(names[:B])
    # restrict the combined tree's splits to the backbone taxa: every
    # backbone split must survive (queries only subdivide edges, so the
    # induced backbone topology is unchanged — placement_close_k.cu:858
    # addQuery never restructures existing splits)
    restricted = set()
    for s in splits:
        r = frozenset(s & back_leaves)
        if 1 < len(r) < B - 1:
            restricted.add(frozenset(min(
                (r, frozenset(back_leaves - r)), key=sorted)))
    norm_back = {frozenset(min((s, frozenset(back_leaves - s)), key=sorted))
                 for s in back_splits if 1 < len(s) < B - 1}
    assert norm_back <= restricted
