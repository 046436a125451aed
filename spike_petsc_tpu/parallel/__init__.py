"""Multi-chip execution: device meshes, distributed SPIKE, sharded Krylov."""

from .mesh import make_mesh, make_mesh_2d, shard_leading
from .spike_dist import (DistSpikeFactor, dist_spike_factor, dist_spike_solve,
                         dist_spike_solve_many, dist_spike_transpose,
                         make_dist_solver, make_dist_solver_batched,
                         make_mesh_multislice, dist_spike_factor_multislice,
                         make_dist_solver_multislice,
                         make_dist_solver_multislice_batched,
                         dist_spike_transpose_multislice,
                         make_mesh_3d, make_dist_solver_3d)
from .matching_dev import auction_match, auction_match_dist
from .elastic import (ResilientResult, ResilientServeResult, SolveCheckpoint,
                      resilient_serve, resilient_solve)
from .autodiff import (dist_solve_banded_diff,
                       dist_solve_banded_diff_multislice)

__all__ = [
    "make_mesh", "make_mesh_2d", "shard_leading",
    "DistSpikeFactor", "dist_spike_factor", "dist_spike_solve",
    "dist_spike_solve_many", "dist_spike_transpose",
    "make_dist_solver", "make_dist_solver_batched",
    "make_mesh_multislice", "dist_spike_factor_multislice",
    "make_dist_solver_multislice",
    "make_dist_solver_multislice_batched",
    "dist_spike_transpose_multislice",
    "make_mesh_3d", "make_dist_solver_3d",
    "auction_match", "auction_match_dist",
    "ResilientResult", "ResilientServeResult", "SolveCheckpoint",
    "resilient_serve", "resilient_solve",
    "dist_solve_banded_diff", "dist_solve_banded_diff_multislice",
]
