"""FASTA reading.

The reference streams FASTA through kseq.h (gzip-aware, src/kseq.h) from
the CLI driver (src/tree_generation.cu:132-154). Here we slurp + split,
which is both simpler and faster in Python; a native (C) reader can be
swapped in behind the same interface for very large inputs (see
native/).

Sequences are returned as raw bytes objects (uppercase NOT enforced —
the reference encoders are case-sensitive, see encode.py).
"""

from __future__ import annotations

import gzip
from typing import List, Tuple

from dipper_tpu.io.errors import InputFormatError


def _open_maybe_gzip(path: str) -> bytes:
    with open(path, "rb") as f:
        magic = f.read(2)
        f.seek(0)
        if magic == b"\x1f\x8b":
            with gzip.open(f) as g:
                return g.read()
        return f.read()


def read_fasta(path: str) -> Tuple[List[str], List[bytes]]:
    """Returns (names, seqs). Name = header up to first whitespace
    (kseq semantics: kseq_read stops name at isspace). Uses the native
    multithreaded reader (native/fastio.cpp) when built."""
    from dipper_tpu.io.native import read_fasta_native

    res = read_fasta_native(path)
    if res is not None:
        return _validate(path, *res)
    data = _open_maybe_gzip(path)
    names: List[str] = []
    seqs: List[bytes] = []
    # Split on record starts. Records begin with '>' (or '@' is fastq —
    # reference kseq handles fastq too but dipper is only ever fed fasta).
    pos = data.find(b">")
    if pos < 0:
        raise InputFormatError(
            f"{path}: not a FASTA file (no '>' record header found"
            + ("; file is empty)" if not data.strip() else ")"))
    body = data[pos + 1 :]
    for ri, rec in enumerate(body.split(b"\n>")):
        nl = rec.find(b"\n")
        if nl < 0:
            header, seq = rec, b""
        else:
            header, seq = rec[:nl], rec[nl + 1 :]
        header = header.strip()
        # kseq: name is up to first whitespace
        name = header.split(None, 1)[0] if header else b""
        seq = seq.replace(b"\n", b"").replace(b"\r", b"")
        names.append(name.decode())
        seqs.append(seq)
    return _validate(path, names, seqs)


def _validate(path: str, names: List[str], seqs: List[bytes]):
    """Shared sanity checks for both the native and the Python parser."""
    if not names:
        raise InputFormatError(f"{path}: no FASTA records found")
    for ri, (name, seq) in enumerate(zip(names, seqs)):
        if not name:
            raise InputFormatError(
                f"{path}: FASTA record {ri + 1} has an empty header name")
        if not seq:
            raise InputFormatError(
                f"{path}: FASTA record {ri + 1} ({name!r}) has an empty "
                f"sequence")
    return names, seqs
