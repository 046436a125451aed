"""Composable-solver testbed (reference testbed2.c equivalent).

The reference's second driver exists only to register the full plugin set —
fiedler, PCBANDED, KSPREORDER — so they are reachable from the options
database inside composed solvers, e.g. the Schur-complement fieldsplit recipe
in its header comment (/root/reference/src/testbed2.c:4, 61-73).  In this
framework registration is import-time and the composite/fieldsplit PCs are
built in, so testbed2 shares testbed's implementation; it exists so reference
users find the same entry point.  Example composition:

    python -m spike_petsc_tpu.testbed2 -problem spd:2000:4 \
        -ksp_type fgmres -pc_type fieldsplit -pc_fieldsplit_type schur \
        -fieldsplit_0_pc_type lu -fieldsplit_1_pc_type lu -ksp_rtol 1e-10

Symmetry is reported like the reference's check (/root/reference/src/
testbed2.c:97-99).
"""

from __future__ import annotations

import sys

from .testbed import main as _main


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    return _main(list(argv) + ["-report_symmetry", "1"])


if __name__ == "__main__":
    raise SystemExit(main())
