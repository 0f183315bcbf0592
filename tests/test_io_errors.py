"""Malformed-input diagnostics: readers raise InputFormatError with a
useful message and the CLI exits 1 with it instead of a traceback
(the reference has no input diagnostics at all — SURVEY §5)."""

import pytest

from dipper_tpu.io.errors import InputFormatError
from dipper_tpu.io.fasta import read_fasta
from dipper_tpu.io.phylip import read_phylip_lower_triangular, PhylipRowStream
from dipper_tpu.cli import main


def test_fasta_not_fasta(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text("ACGTACGT\nACGT\n")
    with pytest.raises(InputFormatError,
                       match="no FASTA records|no '>' record header"):
        read_fasta(str(p))


def test_fasta_empty_file(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text("")
    with pytest.raises(InputFormatError):
        read_fasta(str(p))


def test_fasta_empty_sequence(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">a\nACGT\n>b\n>c\nGGTT\n")
    with pytest.raises(InputFormatError, match="'b'.*empty"):
        read_fasta(str(p))


def test_phylip_bad_header(tmp_path):
    p = tmp_path / "x.phy"
    p.write_text("hello\nT0\n")
    with pytest.raises(InputFormatError, match="header"):
        read_phylip_lower_triangular(str(p))


def test_phylip_truncated(tmp_path):
    p = tmp_path / "x.phy"
    p.write_text("3\nT0\nT1\t0.5\n")
    with pytest.raises(InputFormatError, match="truncated|missing"):
        read_phylip_lower_triangular(str(p))


def test_phylip_wrong_row_width(tmp_path):
    p = tmp_path / "x.phy"
    p.write_text("3\nT0\nT1\t0.5\nT2\t0.1\n")
    with pytest.raises(InputFormatError, match="expected 2"):
        read_phylip_lower_triangular(str(p))


def test_phylip_non_numeric(tmp_path):
    p = tmp_path / "x.phy"
    p.write_text("3\nT0\nT1\t0.5\nT2\t0.1\tbogus\n")
    with pytest.raises(InputFormatError, match="non-numeric"):
        read_phylip_lower_triangular(str(p))


def test_phylip_stream_truncated(tmp_path):
    p = tmp_path / "x.phy"
    p.write_text("3\nT0\n")
    s = PhylipRowStream(str(p))
    s.next_row()
    with pytest.raises(InputFormatError):
        s.next_row()
    s.close()


def test_cli_friendly_error(tmp_path, capsys):
    p = tmp_path / "x.phy"
    p.write_text("3\nT0\nT1\t0.5\n")
    out = tmp_path / "o.nwk"
    rc = main(["-i", "d", "-I", str(p), "-O", str(out)])
    assert rc == 1
    err = capsys.readouterr().err
    assert "ERROR" in err and "truncated" in err
