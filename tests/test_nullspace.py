"""Null-space handling (solvers/nullspace.py — PETSc MatNullSpace role):
singular consistent systems solve to the minimal-norm representative, and
inconsistent right-hand sides are projected to consistency, mirroring
MatNullSpaceRemove inside KSPSolve.  The canonical case is the reference's
graph Laplacian with L·1 = 0 (/root/reference/src/spectralPartition.c:264)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spike_petsc_tpu import BandedMatrix
from spike_petsc_tpu.ops.band import banded_matvec
from spike_petsc_tpu.solvers.ksp import make_solver, make_solver_many, solve
from spike_petsc_tpu.solvers.nullspace import NullSpace, make_nullspace
from spike_petsc_tpu.utils.options import Options


def neumann_laplacian(n, dtype=jnp.float64) -> BandedMatrix:
    """1-D Neumann (pure-flux) Laplacian: tridiagonal, symmetric positive
    semidefinite, null space = span{1}."""
    lo = -jnp.ones((n,), dtype)
    hi = -jnp.ones((n,), dtype)
    dg = 2.0 * jnp.ones((n,), dtype)
    dg = dg.at[0].set(1.0).at[-1].set(1.0)
    data = jnp.stack([lo, dg, hi], axis=1)
    return BandedMatrix(data=data, kl=1, ku=1)


def test_make_nullspace_orthonormal():
    ns = make_nullspace(50, constant=True, dtype=jnp.float64)
    assert ns.dim == 1 and ns.constant
    np.testing.assert_allclose(
        float(jnp.linalg.norm(ns.vecs[:, 0])), 1.0, rtol=1e-12)
    # constant + a user vector, orthonormalized together
    v = jnp.arange(50, dtype=jnp.float64)
    ns2 = make_nullspace(50, constant=True, vecs=v)
    Q = np.asarray(ns2.vecs)
    np.testing.assert_allclose(Q.T @ Q, np.eye(2), atol=1e-12)
    # remove() annihilates the span, preserves the complement, batches
    x = jnp.asarray(np.random.default_rng(0).standard_normal((50, 3)))
    y = ns2.remove(x)
    np.testing.assert_allclose(np.asarray(Q.T @ y), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ns2.remove(y)), np.asarray(y),
                               atol=1e-12)


def test_make_nullspace_validation():
    with pytest.raises(ValueError):
        make_nullspace(constant=True)          # no n
    with pytest.raises(ValueError):
        make_nullspace(10)                     # empty
    with pytest.raises(ValueError):
        make_nullspace(10, vecs=jnp.ones((5,)))  # n mismatch


def test_singular_laplacian_solve_minimal_norm():
    """L x = b with b consistent: converges and returns the zero-mean
    representative."""
    n = 200
    L = neumann_laplacian(n)
    ns = make_nullspace(n, constant=True, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(n))
    u = ns.remove(u)                      # zero-mean truth
    b = banded_matvec(L, u)               # consistent by construction
    solver = make_solver(L, ksp_type="cg", pc_type="jacobi",
                         nullspace=ns, rtol=1e-12, maxit=2000, jit=False)
    res = solver(b)
    x = np.asarray(res.x)
    assert abs(x.mean()) < 1e-10          # minimal-norm representative
    np.testing.assert_allclose(x, np.asarray(u), rtol=1e-7, atol=1e-8)


def test_inconsistent_rhs_projected():
    """b with a component along the left null space: the projection makes
    the system consistent; the answer matches the consistent-b solve."""
    n = 128
    L = neumann_laplacian(n)
    ns = make_nullspace(n, constant=True, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    u = ns.remove(jnp.asarray(rng.standard_normal(n)))
    b = banded_matvec(L, u)
    b_bad = b + 3.7                        # inconsistent shift along 1
    solver = make_solver(L, ksp_type="cg", pc_type="jacobi",
                         nullspace=ns, rtol=1e-12, maxit=2000, jit=False)
    xa = np.asarray(solver(b).x)
    xb = np.asarray(solver(b_bad).x)
    np.testing.assert_allclose(xb, xa, rtol=1e-9, atol=1e-9)


def test_pc_output_projected_no_null_drift():
    """Every PCApply output must be projected (PETSc's KSP_PCApply calls
    MatNullSpaceRemove): M^{-1} of a SHIFTED factor maps zero-mean
    residuals to vectors with a nonzero null component, and without the
    projection short-recurrence methods (cg/bcgs) accumulate that drift
    in x unboundedly — before the round-5 fix, f32 CG on this problem
    reached mean ~1e8 before the (then hopeless) final projection."""
    from spike_petsc_tpu.utils.options import Options
    n = 256
    L = neumann_laplacian(n)
    L32 = BandedMatrix(data=L.data.astype(jnp.float32), kl=L.kl, ku=L.ku)
    ns = make_nullspace(n, constant=True, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    u = np.asarray(ns.remove(jnp.asarray(
        rng.standard_normal(n), jnp.float32)))
    b = banded_matvec(L32, jnp.asarray(u))
    opts = Options({"pc_spike_partitions": 8, "pc_spike_shift": "nonzero",
                    "pc_spike_shift_amount": 1e-2})
    solver = make_solver(L32, ksp_type="cg", pc_type="spike",
                         nullspace=ns, rtol=1e-6, maxit=100, jit=False,
                         options=opts)
    res = solver(b + 0.5)                 # inconsistent rhs too
    x = np.asarray(res.x)
    assert int(res.reason) > 0, res.reason
    assert abs(x.mean()) < 1e-6
    assert np.abs(x - u).max() < 1e-3


def test_options_driven_constant_nullspace():
    """-ksp_nullspace_constant builds the constant null space from options
    alone (the L·1=0 case needs no code-level setup)."""
    n = 96
    L = neumann_laplacian(n)
    ns = make_nullspace(n, constant=True, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    u = ns.remove(jnp.asarray(rng.standard_normal(n)))
    b = banded_matvec(L, u)
    opts = Options.from_argv([
        "-ksp_type", "cg", "-pc_type", "jacobi",
        "-ksp_nullspace_constant",
        "-ksp_rtol", "1e-12", "-ksp_max_it", "2000"])
    res = solve(L, b, options=opts)
    x = np.asarray(res.x)
    assert abs(x.mean()) < 1e-10
    np.testing.assert_allclose(x, np.asarray(u), rtol=1e-7, atol=1e-8)


def test_nullspace_solve_jitted():
    """NullSpace is a registered pytree: the jitted solver closure accepts
    it and compiles."""
    n = 64
    L = neumann_laplacian(n)
    ns = make_nullspace(n, constant=True, dtype=jnp.float64)
    u = ns.remove(jnp.asarray(np.random.default_rng(4).standard_normal(n)))
    b = banded_matvec(L, u)
    solver = make_solver(L, ksp_type="cg", pc_type="jacobi",
                         nullspace=ns, rtol=1e-12, maxit=500, jit=True)
    x = np.asarray(solver(b).x)
    np.testing.assert_allclose(x, np.asarray(u), rtol=1e-7, atol=1e-8)


def test_nullspace_many_columns():
    """make_solver_many projects all r columns (NullSpace.remove batches)."""
    n, r = 128, 4
    L = neumann_laplacian(n)
    ns = make_nullspace(n, constant=True, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    U = ns.remove(jnp.asarray(rng.standard_normal((n, r))))
    B = jnp.stack([banded_matvec(L, U[:, j]) for j in range(r)], axis=1)
    solver = make_solver_many(L, ksp_type="cg", pc_type="jacobi",
                              nullspace=ns, rtol=1e-12, maxit=2000,
                              jit=False)
    res = solver(B)
    X = np.asarray(res.x)
    assert np.abs(X.mean(axis=0)).max() < 1e-9
    np.testing.assert_allclose(X, np.asarray(U), rtol=1e-6, atol=1e-7)


def test_distributed_nullspace_solve():
    """make_dist_solver(nullspace=): the Neumann Laplacian solves to the
    zero-mean representative on the 8-device mesh; projections are
    mesh-native (basis row-sharded, one dim-sized psum per apply)."""
    from spike_petsc_tpu.parallel.mesh import make_mesh
    from spike_petsc_tpu.parallel.spike_dist import (dist_spike_factor,
                                                     make_dist_solver)

    n = 1024
    L = neumann_laplacian(n)
    ns = make_nullspace(n, constant=True, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    u = ns.remove(jnp.asarray(rng.standard_normal(n)))
    b = banded_matvec(L, u)
    mesh = make_mesh(8)
    # shift keeps the SPIKE PC itself nonsingular; GMRES handles the
    # (projected) singular operator
    dsf = dist_spike_factor(L, mesh, method="lu", shift="nonzero",
                            shift_amount=1e-2)
    solver = make_dist_solver(dsf, mesh, ksp_type="gmres", nullspace=ns,
                              rtol=1e-12, maxit=200, restart=60)
    res = solver(b)
    x = np.asarray(res.x)
    assert abs(x.mean()) < 1e-9
    np.testing.assert_allclose(x, np.asarray(u), rtol=1e-6, atol=1e-7)
    # inconsistent rhs projects to the same answer
    res2 = solver(b + 2.5)
    np.testing.assert_allclose(np.asarray(res2.x), x, rtol=1e-7, atol=1e-8)


@pytest.mark.slow
def test_multislice_nullspace_solve():
    """Multislice solver with a null space: 2-axis psum projections."""
    from spike_petsc_tpu.parallel.spike_dist import (
        dist_spike_factor_multislice, make_dist_solver_multislice,
        make_mesh_multislice)

    n = 1024
    L = neumann_laplacian(n)
    ns = make_nullspace(n, constant=True, dtype=jnp.float64)
    rng = np.random.default_rng(8)
    u = ns.remove(jnp.asarray(rng.standard_normal(n)))
    b = banded_matvec(L, u)
    mesh = make_mesh_multislice((2, 4))
    dsf = dist_spike_factor_multislice(L, mesh, method="lu",
                                       shift="nonzero", shift_amount=1e-2)
    solver = make_dist_solver_multislice(dsf, mesh, ksp_type="gmres",
                                         nullspace=ns, rtol=1e-12,
                                         maxit=200, restart=60)
    res = solver(b)
    x = np.asarray(res.x)
    assert abs(x.mean()) < 1e-9
    np.testing.assert_allclose(x, np.asarray(u), rtol=1e-6, atol=1e-7)


def test_nonsymmetric_distinct_left_nullspace():
    """A nonsymmetric singular matrix with distinct right/left null spaces:
    pass both; b is projected by the LEFT one, x by the RIGHT one."""
    n = 80
    rng = np.random.default_rng(6)
    # build A = P diag(0, d2..dn) Q^T with orthogonal P, Q -> null(A) =
    # span{q1}, null(A^T) = span{p1}
    P, _ = np.linalg.qr(rng.standard_normal((n, n)))
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.concatenate([[0.0], rng.uniform(1.0, 2.0, n - 1)])
    A = (P * d) @ Q.T
    ns = make_nullspace(vecs=jnp.asarray(Q[:, 0]))
    tns = make_nullspace(vecs=jnp.asarray(P[:, 0]))
    u = Q[:, 1:] @ rng.standard_normal(n - 1)        # in range(Q_2..n)
    b = jnp.asarray(A @ u)
    solver = make_solver(jnp.asarray(A), ksp_type="gmres", pc_type="none",
                         nullspace=ns, transpose_nullspace=tns,
                         rtol=1e-12, maxit=500, restart=80, jit=False)
    res = solver(b + 0.9 * jnp.asarray(P[:, 0]))     # inconsistent part
    x = np.asarray(res.x)
    assert abs(Q[:, 0] @ x) < 1e-8                   # right-null removed
    np.testing.assert_allclose(A @ x, np.asarray(b), rtol=1e-7, atol=1e-7)
