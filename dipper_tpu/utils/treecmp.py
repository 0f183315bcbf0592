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
