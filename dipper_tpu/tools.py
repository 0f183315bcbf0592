"""Small command-line utilities mirroring the reference's scripts/.

  python -m dipper_tpu.tools nrf A.nwk B.nwk
      normalized Robinson-Foulds between two trees (scripts/nrf.sh
      equivalent, computed natively instead of via MAPLE)

  python -m dipper_tpu.tools lower-to-full in.phy out.phy
      lower-triangular PHYLIP -> full matrix
      (scripts/lower_to_full_phylip.cpp equivalent)
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
    print(f"unknown command: {cmd}", file=sys.stderr)
    print(__doc__)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
