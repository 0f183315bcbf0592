"""Small command-line utilities mirroring the reference's scripts/.

  python -m dipper_tpu.tools nrf A.nwk B.nwk
      normalized Robinson-Foulds between two trees (scripts/nrf.sh
      equivalent, computed natively instead of via MAPLE)

  python -m dipper_tpu.tools lower-to-full in.phy out.phy
      lower-triangular PHYLIP -> full matrix
      (scripts/lower_to_full_phylip.cpp equivalent)

  python -m dipper_tpu.tools prune-fasta in.fa tree.nwk out.fa
      keep only sequences whose names are leaves of the tree
      (scripts/prune_fasta_from_newick.cpp equivalent)

  python -m dipper_tpu.tools bl-scale in.nwk factor out.nwk
      multiply every branch length (scripts/bl_scale.py equivalent)
"""

from __future__ import annotations

import sys


def _cmd_nrf(argv):
    from dipper_tpu.utils.treecmp import rf_distance

    a = open(argv[0]).read()
    b = open(argv[1]).read()
    rf, nrf = rf_distance(a, b)
    print(f"RF\t{rf}")
    print(f"nRF\t{nrf:.6f}")
    return 0


def _cmd_lower_to_full(argv):
    from dipper_tpu.io.phylip import read_phylip_lower_triangular

    names, D = read_phylip_lower_triangular(argv[0])
    with open(argv[1], "w") as f:
        f.write(f"{len(names)}\n")
        for i, nm in enumerate(names):
            row = " ".join(f"{D[i, j]:.9g}" for j in range(len(names)))
            f.write(f"{nm}\t{row}\n")
    return 0


def _cmd_prune_fasta(argv):
    from dipper_tpu.io.fasta import read_fasta
    from dipper_tpu.utils.treecmp import _splits_from_newick

    names, seqs = read_fasta(argv[0])
    _, leaves = _splits_from_newick(open(argv[1]).read())
    kept = 0
    with open(argv[2], "wb") as f:
        for nm, sq in zip(names, seqs):
            if nm in leaves:
                f.write(b">" + nm.encode() + b"\n" + sq + b"\n")
                kept += 1
    print(f"kept {kept}/{len(names)} sequences", file=sys.stderr)
    return 0


def _cmd_bl_scale(argv):
    import re

    factor = float(argv[1])
    s = open(argv[0]).read()

    def repl(m):
        return ":" + repr(float(m.group(1)) * factor)

    out = re.sub(r":([0-9.eE+-]+)", repl, s)
    open(argv[2], "w").write(out)
    return 0


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    cmd, rest = argv[0], argv[1:]
    if cmd == "nrf":
        return _cmd_nrf(rest)
    if cmd == "lower-to-full":
        return _cmd_lower_to_full(rest)
    if cmd == "prune-fasta":
        return _cmd_prune_fasta(rest)
    if cmd == "bl-scale":
        return _cmd_bl_scale(rest)
    print(f"unknown command: {cmd}", file=sys.stderr)
    print(__doc__)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
