"""Differentiable DISTRIBUTED banded solves (implicit-function adjoint).

The mesh version of ops.autodiff.solve_banded_diff: the forward pass is a
distributed SPIKE factor + solve over the device mesh; the backward pass
REUSES the forward factorization through ``dist_spike_transpose`` (transpose
sweeps over the same stored blocks — no refactorization) plus one
distributed solve,

    dL/db          = A^{-T} g
    dL/ddata[i, d] = -lam[i] * x[i + d - kl],

so gradients never differentiate through the factorization recurrences.
This makes PDE-constrained optimization / differentiable-physics loops whose
inner step is a MULTI-CHIP banded solve first-class — a capability class the
reference cannot offer (its MPI path is solve-only,
/root/reference/src/wbm.c:270-273).

The factor uses ``inverter="blocked"`` (always-correct blocked Schur): the
Newton-probe safety net is a host-level retry and cannot live inside a
traced/differentiated computation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..ops.band import BandedMatrix
from .spike_dist import _dist_spike_factor_impl, dist_spike_solve


def _factor_blocked(data, kl, ku, mesh, axis, block_b, parts_per_device):
    band = BandedMatrix(data=data, kl=kl, ku=ku)
    return _dist_spike_factor_impl(
        band, mesh, axis, method="inv", truncated=False, block_b=block_b,
        parts_per_device=parts_per_device, reduced="auto",
        store_spikes=False, store_dtype=None, spike_dtype=None,
        shift="none", shift_amount=0.0, inverter="blocked")


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def dist_solve_banded_diff(data: jax.Array, rhs: jax.Array, kl: int, ku: int,
                           mesh: Mesh, axis: str = "p",
                           block_b: int = None,
                           parts_per_device: int = 1) -> jax.Array:
    """Differentiable distributed solve of the banded system defined by
    diagonal-offset ``data`` ([n, kl+ku+1]); gradients flow to both ``data``
    and ``rhs``.  The system is partitioned over ``mesh.shape[axis]`` devices
    (times ``parts_per_device``)."""
    dsf = _factor_blocked(data, kl, ku, mesh, axis, block_b, parts_per_device)
    return dist_spike_solve(dsf, rhs, mesh, axis)


def _fwd(data, rhs, kl, ku, mesh, axis, block_b, parts_per_device):
    dsf = _factor_blocked(data, kl, ku, mesh, axis, block_b, parts_per_device)
    x = dist_spike_solve(dsf, rhs, mesh, axis)
    return x, (dsf, x)


def _bwd(kl, ku, mesh, axis, block_b, parts_per_device, res, g):
    dsf, x = res
    # A^{-T} g reusing the forward mesh factorization (dist_spike_transpose:
    # transpose sweeps over the same stored blocks — no refactorization)
    from .spike_dist import dist_spike_transpose
    dsft = dist_spike_transpose(dsf, mesh, axis, inverter="blocked")
    lam = dist_spike_solve(dsft, g, mesh, axis)
    # band-restricted outer product from w shifted slices (ops/autodiff.py);
    # a global elementwise op — XLA shards it along the row sharding
    n = x.shape[0]
    w = kl + ku + 1
    xpad = jnp.pad(x, (kl, ku))
    xg = jnp.stack([jax.lax.dynamic_slice_in_dim(xpad, d, n)
                    for d in range(w)], axis=1)
    ddata = -lam[:, None] * xg
    # data cotangent in the PRIMAL data dtype (dsf.Btip preserves it)
    return ddata.astype(dsf.Btip.dtype), lam.astype(x.dtype)


dist_solve_banded_diff.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Multislice (pod-scale) variant: forward and adjoint are ITERATIVE solves
# (per-slice SPIKE PC + exact cross-slice matvec GMRES), so gradients are
# exact to the solver tolerance — the standard implicit-adjoint contract
# for iterative inner solvers.
# ---------------------------------------------------------------------------

def _ms_factor(data, kl, ku, mesh, axis_slice, axis_p, block_b,
               parts_per_device):
    from .spike_dist import _dist_spike_factor_multislice_impl
    band = BandedMatrix(data=data, kl=kl, ku=ku)
    return _dist_spike_factor_multislice_impl(
        band, mesh, axis_slice, axis_p, method="inv", block_b=block_b,
        parts_per_device=parts_per_device, reduced="auto",
        store_spikes=False, store_dtype=None, spike_dtype=None,
        shift="none", shift_amount=0.0, inverter="blocked")


def _ms_dsf_solve(dsf, rhs, mesh, axis_slice, axis_p, rtol, maxit):
    from .spike_dist import make_dist_solver_multislice
    solver = make_dist_solver_multislice(
        dsf, mesh, axis_slice, axis_p, ksp_type="gmres", rtol=rtol,
        maxit=maxit)
    return solver(rhs).x


def _ms_solve(data, rhs, kl, ku, mesh, axis_slice, axis_p, block_b,
              parts_per_device, rtol, maxit):
    dsf = _ms_factor(data, kl, ku, mesh, axis_slice, axis_p, block_b,
                     parts_per_device)
    return _ms_dsf_solve(dsf, rhs, mesh, axis_slice, axis_p, rtol, maxit)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))
def dist_solve_banded_diff_multislice(
        data: jax.Array, rhs: jax.Array, kl: int, ku: int, mesh: Mesh,
        axis_slice: str = "slice", axis_p: str = "p", block_b: int = None,
        parts_per_device: int = 1, rtol: float = 1e-12,
        maxit: int = 200) -> jax.Array:
    """Differentiable banded solve on a (slice, p) mesh: GMRES with the
    per-slice SPIKE preconditioner forward, the same machinery on A^T for
    the adjoint.  Gradients flow to ``data`` and ``rhs`` and are exact to
    ``rtol`` (tighten it when gradients feed an optimizer)."""
    return _ms_solve(data, rhs, kl, ku, mesh, axis_slice, axis_p, block_b,
                     parts_per_device, rtol, maxit)


def _ms_fwd(data, rhs, kl, ku, mesh, axis_slice, axis_p, block_b,
            parts_per_device, rtol, maxit):
    dsf = _ms_factor(data, kl, ku, mesh, axis_slice, axis_p, block_b,
                     parts_per_device)
    x = _ms_dsf_solve(dsf, rhs, mesh, axis_slice, axis_p, rtol, maxit)
    return x, (dsf, x)


def _ms_bwd(kl, ku, mesh, axis_slice, axis_p, block_b, parts_per_device,
            rtol, maxit, res, g):
    dsf, x = res
    # A^{-T} g: the adjoint GMRES preconditioned by the TRANSPOSE of the
    # forward per-slice factors (dist_spike_transpose_multislice — no
    # refactorization), with the exact A^T cross-slice matvec
    from .spike_dist import dist_spike_transpose_multislice
    dsft = dist_spike_transpose_multislice(
        dsf, mesh, axis_slice, axis_p, inverter="blocked")
    lam = _ms_dsf_solve(dsft, g, mesh, axis_slice, axis_p, rtol, maxit)
    n = x.shape[0]
    w = kl + ku + 1
    xpad = jnp.pad(x, (kl, ku))
    xg = jnp.stack([jax.lax.dynamic_slice_in_dim(xpad, d, n)
                    for d in range(w)], axis=1)
    ddata = -lam[:, None] * xg
    # data cotangent in the PRIMAL data dtype (dsf.Btip preserves it)
    return ddata.astype(dsf.Btip.dtype), lam.astype(x.dtype)


dist_solve_banded_diff_multislice.defvjp(_ms_fwd, _ms_bwd)
