"""Solver layer: Krylov methods (KSP), preconditioners (PC), composition."""

from .ksp import make_solver, print_monitor, solve
from .nullspace import NullSpace, make_nullspace
from .krylov import (arnoldi_hessenberg, bicgstab, cg, chebyshev,
                     estimate_extreme_eigs, fgmres, gmres, minres, pipecg,
                     preonly, richardson)
from .pc import PC, make_pc
from .reorder import solve_reordered
from .types import KSPResult, reason_str

__all__ = [
    "solve", "make_solver", "print_monitor", "solve_reordered",
    "gmres", "fgmres", "bicgstab", "cg", "pipecg", "minres", "chebyshev",
    "richardson", "preonly", "arnoldi_hessenberg", "estimate_extreme_eigs",
    "PC", "make_pc", "KSPResult", "reason_str",
    "NullSpace", "make_nullspace",
]
