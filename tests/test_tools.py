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
