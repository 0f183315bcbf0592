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


def read_phylip_lower_triangular(path: str) -> Tuple[List[str], np.ndarray]:
    """Returns (names, D) with D a full symmetric [N, N] float64 matrix
    (zero diagonal). Uses the native multithreaded parser when the
    library is available (large matrices are ingest-bound: SURVEY §3.2),
    falling back to pure Python."""
    from dipper_tpu.io.native import read_phylip_lower_native

    res = read_phylip_lower_native(path)
    if res is not None:
        return res
    with open(path, "r") as f:
        n = int(f.readline().split()[0])
        names: List[str] = []
        D = np.zeros((n, n), dtype=np.float64)
        for i in range(n):
            parts = f.readline().split()
            names.append(parts[0])
            if i:
                row = np.array(parts[1 : i + 1], dtype=np.float64)
                D[i, :i] = row
                D[:i, i] = row
    return names, D


class PhylipRowStream:
    """Lazy row-by-row reader mirroring MatrixReader::distConstructionOnGpu."""

    def __init__(self, path: str):
        self._f = open(path, "r")
        self.num_sequences = int(self._f.readline().split()[0])
        self.names: List[str] = []
        self._row = 0

    def next_row(self) -> np.ndarray:
        parts = self._f.readline().split()
        self.names.append(parts[0])
        i = self._row
        self._row += 1
        if i == 0:
            return np.zeros(0, dtype=np.float64)
        return np.array(parts[1 : i + 1], dtype=np.float64)

    def close(self):
        self._f.close()


def write_phylip_lower_triangular(names: List[str], D: np.ndarray, path: str):
    n = len(names)
    with open(path, "w") as f:
        f.write(f"{n}\n")
        for i in range(n):
            row = "\t".join(f"{D[i, j]:.9g}" for j in range(i))
            f.write(names[i] + ("\t" + row if row else "") + "\n")
