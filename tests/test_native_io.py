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
