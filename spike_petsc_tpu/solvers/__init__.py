"""Solver layer: Krylov methods (KSP), preconditioners (PC), composition."""

from .ksp import make_solver, print_monitor, solve
from .krylov import (bicgstab, cg, chebyshev, fgmres, gmres, pipecg,
                     preonly, richardson)
from .pc import PC, make_pc
from .reorder import solve_reordered
from .types import KSPResult, reason_str

__all__ = [
    "solve", "make_solver", "print_monitor", "solve_reordered",
    "gmres", "fgmres", "bicgstab", "cg", "pipecg", "chebyshev", "richardson",
    "preonly", "PC", "make_pc", "KSPResult", "reason_str",
]
