"""Synthetic sequence data for tests: evolve DNA along a random tree
(Jukes-Cantor-ish), with optional gaps — small stand-in for the
RNASim/AliSim datasets the reference benchmarks on."""

from __future__ import annotations

import numpy as np

_BASES = b"ACGT"


def random_tree_edges(n, rng, blen_scale=1.0):
    """Random binary tree over n leaves; returns (parent, blen, order)"""
    parent = {}
    blen = {}
    pool = list(range(n))
    nxt = n
    while len(pool) > 1:
        a = pool.pop(int(rng.integers(len(pool))))
        b = pool.pop(int(rng.integers(len(pool))))
        parent[a] = nxt
        parent[b] = nxt
        blen[a] = float(rng.uniform(0.02, 0.3)) * blen_scale
        blen[b] = float(rng.uniform(0.02, 0.3)) * blen_scale
        pool.append(nxt)
        nxt += 1
    return parent, blen, pool[0]


def simulate_alignment(n, L, rng, gap_frac=0.05, blen_scale=1.0):
    """Returns (names, list of byte strings of length L with gaps)."""
    parent, blen, root = random_tree_edges(n, rng, blen_scale)
    children = {}
    for c, p in parent.items():
        children.setdefault(p, []).append(c)
    seq = {root: rng.integers(0, 4, L)}
    stack = [root]
    while stack:
        u = stack.pop()
        for c in children.get(u, []):
            p_mut = 0.75 * (1 - np.exp(-4.0 / 3.0 * blen[c]))
            mut = rng.random(L) < p_mut
            s = seq[u].copy()
            s[mut] = rng.integers(0, 4, int(mut.sum()))
            seq[c] = s
            stack.append(c)
    names = [f"S{i}" for i in range(n)]
    out = []
    lut = np.frombuffer(_BASES, dtype=np.uint8)
    for i in range(n):
        arr = lut[seq[i]]
        if gap_frac:
            gaps = rng.random(L) < gap_frac
            arr = arr.copy()
            arr[gaps] = ord("-")
        out.append(arr.tobytes())
    return names, out


def simulate_unaligned(n, L, rng, indel_frac=0.02, blen_scale=0.2):
    """Unaligned sequences: evolve then apply small indels so lengths
    differ (for the mash pipeline). blen_scale defaults low: mash
    distances saturate quickly (k-mer identity decays as e^{-k*d}) and
    saturated pairs all collapse to the same distance value."""
    names, seqs = simulate_alignment(n, L, rng, gap_frac=0.0,
                                     blen_scale=blen_scale)
    out = []
    for s in seqs:
        arr = np.frombuffer(s, dtype=np.uint8)
        keep = rng.random(len(arr)) >= indel_frac
        out.append(arr[keep].tobytes())
    return names, out


def write_fasta(path, names, seqs):
    with open(path, "wb") as f:
        for nm, s in zip(names, seqs):
            f.write(b">" + nm.encode() + b"\n" + s + b"\n")
