"""Native FASTA reader parity with the pure-Python path."""

import gzip

import numpy as np
import pytest

from dipper_tpu.io import native
from dipper_tpu.io.fasta import _open_maybe_gzip


def _python_read(path):
    # the pure-python implementation, bypassing the native fast path
    data = _open_maybe_gzip(path)
    names, seqs = [], []
    pos = data.find(b">")
    if pos < 0:
        return names, seqs
    for rec in data[pos + 1:].split(b"\n>"):
        nl = rec.find(b"\n")
        header, seq = (rec, b"") if nl < 0 else (rec[:nl], rec[nl + 1:])
        header = header.strip()
        name = header.split(None, 1)[0] if header else b""
        names.append(name.decode())
        seqs.append(seq.replace(b"\n", b"").replace(b"\r", b""))
    return names, seqs


@pytest.mark.skipif(not native.available(), reason="native lib not built")
@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python(tmp_path, gz):
    rng = np.random.default_rng(0)
    recs = []
    for i in range(50):
        L = int(rng.integers(1, 500))
        seq = bytes(rng.choice(list(b"ACGTacgtN-"), L).astype(np.uint8))
        # multi-line wrap at 60
        wrapped = b"\n".join(seq[j:j + 60] for j in range(0, L, 60))
        recs.append((f"seq_{i} some description", wrapped))
    raw = b"".join(f">{h}\n".encode() + s + b"\n" for h, s in recs)
    p = tmp_path / ("t.fa.gz" if gz else "t.fa")
    if gz:
        p.write_bytes(gzip.compress(raw))
    else:
        p.write_bytes(raw)

    want = _python_read(str(p))
    got = native.read_fasta_native(str(p))
    assert got is not None
    assert got[0] == want[0]
    assert got[1] == want[1]


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_phylip_matches_python(tmp_path):
    from dipper_tpu.io.phylip import write_phylip_lower_triangular

    rng = np.random.default_rng(1)
    n = 37
    D = np.abs(rng.normal(size=(n, n)))
    D = D + D.T
    np.fill_diagonal(D, 0)
    names = [f"tx_{i}" for i in range(n)]
    p = tmp_path / "m.phy"
    write_phylip_lower_triangular(names, np.round(D, 9), str(p))
    got = native.read_phylip_lower_native(str(p))
    assert got is not None
    gn, gD = got
    assert gn == names
    assert np.allclose(gD, D, atol=1e-7)
    assert np.allclose(gD, gD.T) and (np.diag(gD) == 0).all()


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_phylip_rejects_short_row(tmp_path):
    p = tmp_path / "bad.phy"
    p.write_text("3\nA\nB 0.5\nC 0.25\n")  # row C missing one value
    assert native.read_phylip_lower_native(str(p)) is None
