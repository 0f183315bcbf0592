"""Lower-triangular PHYLIP distance matrix reading.

The reference streams rows lazily (src/matrix_reader.cu:23-45): line i
holds "name d(i,0) d(i,1) ... d(i,i-1)" separated by tab/space; the
first line after the header holds just the first taxon name. We provide
both a full reader (for NJ, which materializes the matrix anyway) and a
row stream (for placement parity).
"""

from __future__ import annotations

import numpy as np
from typing import List, Tuple

from dipper_tpu.io.errors import InputFormatError


def _parse_header(line: str, path: str) -> int:
    parts = line.split()
    if not parts or not parts[0].isdigit() or int(parts[0]) <= 0:
        raise InputFormatError(
            f"{path}: malformed PHYLIP header (expected a positive taxon "
            f"count on line 1, got {line.strip()!r})")
    return int(parts[0])


def _parse_row(parts: List[str], i: int, path: str) -> Tuple[str, np.ndarray]:
    if not parts:
        raise InputFormatError(
            f"{path}: truncated PHYLIP matrix — row {i + 1} of the "
            f"lower-triangular body is missing or empty")
    if len(parts) != i + 1:
        raise InputFormatError(
            f"{path}: PHYLIP row {i + 1} ({parts[0]!r}) has "
            f"{len(parts) - 1} distances, expected {i} "
            f"(lower-triangular: name + d(i,0..i-1))")
    try:
        return parts[0], np.array(parts[1:], dtype=np.float64)
    except ValueError:
        raise InputFormatError(
            f"{path}: PHYLIP row {i + 1} ({parts[0]!r}) contains a "
            f"non-numeric distance") from None


def read_phylip_lower_triangular(path: str) -> Tuple[List[str], np.ndarray]:
    """Returns (names, D) with D a full symmetric [N, N] float64 matrix
    (zero diagonal). Uses the native multithreaded parser when the
    library is available (large matrices are ingest-bound: SURVEY §3.2),
    falling back to pure Python (which owns the friendly malformed-input
    errors — the native parser returns an error code for any malformed
    file and we re-parse here to diagnose it)."""
    from dipper_tpu.io.native import read_phylip_lower_native

    res = read_phylip_lower_native(path)
    if res is not None:
        return res
    with open(path, "r") as f:
        n = _parse_header(f.readline(), path)
        names: List[str] = []
        D = np.zeros((n, n), dtype=np.float64)
        for i in range(n):
            name, row = _parse_row(f.readline().split(), i, path)
            names.append(name)
            if i:
                D[i, :i] = row
                D[:i, i] = row
    return names, D


class PhylipRowStream:
    """Lazy row-by-row reader mirroring MatrixReader::distConstructionOnGpu."""

    def __init__(self, path: str):
        self._path = path
        self._f = open(path, "r")
        self.num_sequences = _parse_header(self._f.readline(), path)
        self.names: List[str] = []
        self._row = 0

    def next_row(self) -> np.ndarray:
        i = self._row
        name, row = _parse_row(self._f.readline().split(), i, self._path)
        self.names.append(name)
        self._row += 1
        return row

    def close(self):
        self._f.close()


def write_phylip_lower_triangular(names: List[str], D: np.ndarray, path: str):
    n = len(names)
    with open(path, "w") as f:
        f.write(f"{n}\n")
        for i in range(n):
            row = "\t".join(f"{D[i, j]:.9g}" for j in range(i))
            f.write(names[i] + ("\t" + row if row else "") + "\n")
