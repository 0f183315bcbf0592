"""Topology comparison: Robinson-Foulds over unrooted splits.

The reference evaluates accuracy as normalized RF computed by MAPLE
(scripts/nrf.sh:26-36). We implement nRF natively so tests and bench
can assert topology equality (nRF == 0) without external tools.
"""

from __future__ import annotations

from typing import List, Set, FrozenSet, Tuple


def _splits_from_newick(newick: str) -> Tuple[Set[FrozenSet[str]], Set[str]]:
    """Returns the set of non-trivial splits (as frozensets of leaf names
    on one side; canonicalized to the side not containing the reference
    leaf) and the full leaf set."""
    s = newick.strip()
    if s.endswith(";"):
        s = s[:-1]
    pos = 0
    n = len(s)
    clades: List[FrozenSet[str]] = []

    def parse() -> FrozenSet[str]:
        nonlocal pos
        if s[pos] == "(":
            pos += 1
            members = set()
            while True:
                members |= parse()
                if pos < n and s[pos] == ",":
                    pos += 1
                    continue
                break
            assert s[pos] == ")", f"bad newick at {pos}"
            pos += 1
            # optional label
            while pos < n and s[pos] not in ",():":
                pos += 1
            if pos < n and s[pos] == ":":
                pos += 1
                while pos < n and s[pos] not in ",()":
                    pos += 1
            fs = frozenset(members)
            clades.append(fs)
            return fs
        # leaf (possibly quoted)
        name = []
        if s[pos] == "'":
            pos += 1
            while s[pos] != "'":
                name.append(s[pos])
                pos += 1
            pos += 1
        else:
            while pos < n and s[pos] not in ",():":
                name.append(s[pos])
                pos += 1
        if pos < n and s[pos] == ":":
            pos += 1
            while pos < n and s[pos] not in ",()":
                pos += 1
        return frozenset([("".join(name))])

    all_leaves = set(parse())
    ref = min(all_leaves)
    out: Set[FrozenSet[str]] = set()
    for c in clades:
        side = c if ref not in c else frozenset(all_leaves - c)
        if 1 < len(side) < len(all_leaves) - 1:
            out.add(side)
    return out, all_leaves


def rf_distance(newick_a: str, newick_b: str) -> Tuple[int, float]:
    """Returns (RF, normalized RF). Requires identical leaf sets."""
    sa, la = _splits_from_newick(newick_a)
    sb, lb = _splits_from_newick(newick_b)
    if la != lb:
        raise ValueError(
            f"leaf sets differ: {sorted(la - lb)[:5]} vs {sorted(lb - la)[:5]}"
        )
    rf = len(sa ^ sb)
    denom = len(sa) + len(sb)
    return rf, (rf / denom if denom else 0.0)


# --- large-tree path -------------------------------------------------------
#
# The set-of-frozensets comparator above is O(N^2) and recursive; at the
# reference's operating points (30K-1M leaves, scripts/experiment.sh)
# it is unusable. This path is O(N): an iterative tokenizer + split
# signatures = XOR of two independent random 64-bit leaf codes,
# canonicalized against the complement (collision probability ~ N^2 /
# 2^128 — negligible at any relevant N).


def _split_signatures(newick: str, code_a, code_b):
    import re

    toks = re.findall(r"\(|\)|,|;|[^(),;:]+(?::[-0-9.eE+]+)?|:[-0-9.eE+]+",
                      newick.strip())
    stack = [(0, 0, 0)]  # (xor_a, xor_b, leafcount) of the open clade
    sigs = []
    leaves = []
    for t in toks:
        if t == "(":
            stack.append((0, 0, 0))
        elif t == ")":
            xa, xb, c = stack.pop()
            sigs.append((xa, xb, c))
            pa, pb, pc = stack.pop()
            stack.append((pa ^ xa, pb ^ xb, pc + c))
        elif t in (",", ";") or t.startswith(":"):
            continue
        else:
            name = t.split(":", 1)[0]
            if name.startswith("'") and name.endswith("'"):
                name = name[1:-1]
            if not name:
                continue
            leaves.append(name)
            ca = code_a(name)
            cb = code_b(name)
            pa, pb, pc = stack.pop()
            stack.append((pa ^ ca, pb ^ cb, pc + 1))
    return sigs, leaves


def rf_distance_fast(newick_a: str, newick_b: str) -> Tuple[int, float]:
    """O(N) RF via XOR split signatures; identical output to
    rf_distance with overwhelming probability. Use for trees beyond a
    few thousand leaves."""
    import hashlib

    def make_code(salt: bytes):
        def code(name: str) -> int:
            return int.from_bytes(
                hashlib.blake2b(name.encode(), digest_size=8,
                                salt=salt).digest(), "little")
        return code

    ca, cb = make_code(b"a"), make_code(b"b")
    sig_a, leaves_a = _split_signatures(newick_a, ca, cb)
    sig_b, leaves_b = _split_signatures(newick_b, ca, cb)
    if len(leaves_a) != len(leaves_b) or set(leaves_a) != set(leaves_b):
        raise ValueError("leaf sets differ")
    n = len(leaves_a)
    tot_a = 0
    tot_b = 0
    for nm in leaves_a:
        tot_a ^= ca(nm)
        tot_b ^= cb(nm)

    def canon(sigs):
        out = set()
        for xa, xb, c in sigs:
            if c <= 1 or c >= n - 1:
                continue  # trivial split
            comp = (xa ^ tot_a, xb ^ tot_b, n - c)
            out.add(min((xa, xb, c), comp))
        return out

    sa = canon(sig_a)
    sb = canon(sig_b)
    rf = len(sa ^ sb)
    denom = len(sa) + len(sb)
    return rf, (rf / denom if denom else 0.0)
