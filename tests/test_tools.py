"""dipper_tpu.tools + distance-matrix output (-o d)."""

import numpy as np

from dipper_tpu.cli import main as cli_main
from dipper_tpu.tools import main as tools_main
from dipper_tpu.io.phylip import read_phylip_lower_triangular
from dipper_tpu.sketch.minhash import sketch_sequences

import oracle
from datagen import simulate_unaligned, write_fasta


def test_output_distance_matrix(tmp_path, capsys):
    rng = np.random.default_rng(2)
    names, seqs = simulate_unaligned(12, 800, rng)
    inp = tmp_path / "in.fa"
    outp = tmp_path / "out.phy"
    write_fasta(str(inp), names, seqs)
    rc = cli_main(["-i", "r", "-o", "d", "-I", str(inp), "-O", str(outp),
                   "-k", "12", "-s", "100", "--precision", "f64",
                   "--seed", "-1"])
    assert rc == 0
    got_names, got_D = read_phylip_lower_triangular(str(outp))
    assert got_names == names
    sk = sketch_sequences(seqs, 12, 100)
    for i in range(len(seqs)):
        for j in range(i):
            want = oracle.mash_distance(sk[j], sk[i], 12, 100)
            assert abs(got_D[i, j] - want) < 1e-9


def test_nrf_tool(tmp_path, capsys):
    a = tmp_path / "a.nwk"
    b = tmp_path / "b.nwk"
    a.write_text("((A:1,B:1):1,(C:1,D:1):1);")
    b.write_text("((A:1,C:1):1,(B:1,D:1):1);")
    rc = tools_main(["nrf", str(a), str(b)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RF\t2" in out


def test_phylip_to_tab(tmp_path, capsys):
    phy = tmp_path / "m.phy"
    phy.write_text("3\nA\nB 0.5\nC 0.25 0.125\n")
    out = tmp_path / "m.tsv"
    rc = tools_main(["phylip-to-tab", str(phy), str(out)])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines[0] == "\tA\tB\tC\t"
    assert lines[2].startswith("B\t0.5000000000\t")


def test_prune_tree(tmp_path):
    from dipper_tpu.utils.treecmp import _splits_from_newick

    nwk = "((A:1,B:2):0.5,((C:1,D:1):0.25,E:3):0.5);"
    inp = tmp_path / "t.nwk"
    inp.write_text(nwk)
    out = tmp_path / "p.nwk"
    rc = tools_main(["prune-tree", str(inp), "3", str(out), "7"])
    assert rc == 0
    _, leaves = _splits_from_newick(out.read_text())
    assert len(leaves) == 3
    assert leaves <= {"A", "B", "C", "D", "E"}


def test_convert_roundtrip(tmp_path):
    fa = tmp_path / "a.fa"
    fa.write_text(">s1\nACGT\n>s2\nTTAA\n")
    phy = tmp_path / "a.phy"
    sto = tmp_path / "a.sto"
    fa2 = tmp_path / "b.fa"
    assert tools_main(["convert", str(fa), str(phy), "fasta", "phylip"]) == 0
    assert tools_main(["convert", str(phy), str(sto), "phylip",
                       "stockholm"]) == 0
    assert tools_main(["convert", str(sto), str(fa2), "stockholm",
                       "fasta"]) == 0
    assert fa2.read_text() == fa.read_text()


def test_split_and_concat(tmp_path, capsys):
    fa = tmp_path / "in.fa"
    fa.write_text(">c1/x\nAC\n>c2\nGT\n")
    outdir = tmp_path / "split"
    assert tools_main(["split-fasta", str(fa), str(outdir)]) == 0
    assert (outdir / "c1_x.fa").read_bytes() == b">c1/x\nAC\n"
    cat = tmp_path / "cat.fa"
    assert tools_main(["concat-contigs", str(fa), str(cat), "genome"]) == 0
    assert cat.read_bytes() == b">genome\nAC\nGT\n"


def test_remove_from_matrix(tmp_path, capsys):
    m = tmp_path / "m.tsv"
    m.write_text("\tA\tB\nA\t0\t1\nB\t1\t0\n")
    ids = tmp_path / "ids.txt"
    ids.write_text("B\n")
    out = tmp_path / "o.tsv"
    assert tools_main(["remove-from-matrix", str(m), str(ids),
                       str(out)]) == 0
    assert out.read_text() == "\tA\tB\nA\t0\t1\n"


def test_sketch_bank_checkpoint(tmp_path):
    from dipper_tpu.utils.params import Param
    from dipper_tpu.sketch.bank import get_sketch_bank

    rng = np.random.default_rng(3)
    names, seqs = simulate_unaligned(6, 400, rng)
    p1 = Param(kmer_size=12, sketch_size=64, in_format="r",
               save_sketches=str(tmp_path / "b.npz"))
    sk1 = get_sketch_bank(seqs, p1)
    p2 = Param(kmer_size=12, sketch_size=64, in_format="r",
               load_sketches=str(tmp_path / "b.npz"))
    sk2 = get_sketch_bank(seqs, p2)
    assert (sk1 == sk2).all()
    import pytest as _pytest
    p3 = Param(kmer_size=13, sketch_size=64, in_format="r",
               load_sketches=str(tmp_path / "b.npz"))
    with _pytest.raises(SystemExit):
        get_sketch_bank(seqs, p3)
