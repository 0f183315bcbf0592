"""End-to-end: forced divide-and-conquer (-m 3) through the CLI."""

import numpy as np

from dipper_tpu.cli import main
from dipper_tpu.utils.treecmp import _splits_from_newick, rf_distance

from datagen import simulate_unaligned, write_fasta


def test_cli_dc_mash(tmp_path):
    rng = np.random.default_rng(99)
    names, seqs = simulate_unaligned(100, 1200, rng)
    inp = tmp_path / "in.fa"
    outp = tmp_path / "out.nwk"
    write_fasta(str(inp), names, seqs)
    rc = main(["-i", "r", "-I", str(inp), "-O", str(outp), "-m", "3",
               "-k", "12", "-s", "150", "--precision", "f64", "--seed", "7"])
    assert rc == 0
    splits, leaves = _splits_from_newick(outp.read_text())
    assert leaves == set(names)

    # sanity vs full placement on the same data: with N=100 the auto
    # backbone is only N/20=5 taxa (a degenerate configuration the
    # reference would reject when clusters exceed the backbone size),
    # so only a loose agreement bound is meaningful here; real DC
    # correctness is covered bitwise by tests/test_dc.py
    outp2 = tmp_path / "out2.nwk"
    rc = main(["-i", "r", "-I", str(inp), "-O", str(outp2), "-m", "1",
               "-k", "12", "-s", "150", "--precision", "f64", "--seed", "7"])
    assert rc == 0
    _, nrf = rf_distance(outp.read_text(), outp2.read_text())
    assert nrf < 0.9, nrf
