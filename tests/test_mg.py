"""Geometric multigrid PC (PCMG role): V-cycle on Galerkin banded
hierarchies with mesh-size-independent convergence."""

import numpy as np
import pytest
import jax.numpy as jnp

from spike_petsc_tpu import BandedMatrix, Options, solve
from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.solvers.pc import make_pc
from spike_petsc_tpu.solvers.types import reason_str


def banded_of(acsr):
    data, kl, ku = hsp.csr_to_banded_arrays(acsr)
    return BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)


def test_mg_mesh_independent_iterations():
    """The PCMG property: CG+V-cycle iteration counts do not grow with n
    (jacobi-PC CG grows like n for the 1-D Laplacian)."""
    its = {}
    for n in (511, 2048, 8192):
        a = problems.tridiag_laplacian(n)
        u = np.ones(n)
        res = solve(banded_of(a), jnp.asarray(a @ u), ksp_type="cg",
                    pc_type="mg", rtol=1e-10, maxit=100)
        assert int(res.reason) > 0, (n, reason_str(res.reason))
        np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-7,
                                   atol=1e-8)
        its[n] = int(res.its)
    assert max(its.values()) <= min(its.values()) + 2, its
    assert max(its.values()) <= 15, its


def test_mg_sor_smoother_and_options():
    a = problems.tridiag_laplacian(4096)
    u = np.ones(4096)
    res = solve(banded_of(a), jnp.asarray(a @ u), options=Options(
        {"ksp_type": "cg", "pc_type": "mg", "pc_mg_smoother": "sor",
         "pc_mg_smooth_down": "2", "pc_mg_smooth_up": "2",
         "ksp_rtol": "1e-10", "ksp_max_it": "60"}))
    assert int(res.reason) > 0, reason_str(res.reason)
    assert int(res.its) <= 8
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-7, atol=1e-8)
    pc = make_pc("mg", banded_of(a), Options({"pc_mg_levels": "3"}))
    assert pc.info["levels"] == 3


def test_mg_nonsymmetric_with_gmres():
    """Galerkin coarsening of a MILDLY nonsymmetric band (diffusion with a
    weak convective skew) + GMRES: converges fast and mesh-independently.
    Strongly convection-dominated operators are outside geometric MG's
    class (the module docstring documents the operator-class caveat)."""
    import scipy.sparse as sp
    n = 4096
    main = 2.0 * np.ones(n)
    lower = -1.05 * np.ones(n - 1)
    upper = -0.95 * np.ones(n - 1)
    a = sp.diags([lower, main, upper], [-1, 0, 1], format="csr")
    u = np.ones(n)
    res = solve(banded_of(a), jnp.asarray(a @ u), ksp_type="gmres",
                pc_type="mg", rtol=1e-10, maxit=100)
    assert int(res.reason) > 0, reason_str(res.reason)
    assert int(res.its) <= 30
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-6, atol=1e-7)


def test_mg_transpose_exact_adjoint():
    a = problems.nonsym_banded(1024, 2, 2, seed=7)
    pc = make_pc("mg", banded_of(a), Options())
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(1024))
    y = jnp.asarray(rng.standard_normal(1024))
    lhs = float(jnp.vdot(pc.apply(x), y))
    rhs = float(jnp.vdot(x, pc.transpose().apply(y)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_mg_apply_many_matches_vmap():
    a = problems.tridiag_laplacian(512)
    pc = make_pc("mg", banded_of(a), Options())
    R = jnp.asarray(np.random.default_rng(3).standard_normal((512, 3)))
    Z1 = np.asarray(pc.apply_many(R))
    Z2 = np.stack([np.asarray(pc.apply(R[:, j])) for j in range(3)], axis=1)
    np.testing.assert_allclose(Z1, Z2, rtol=1e-13, atol=1e-13)


def test_mg_bicg_uses_transpose():
    """bicg's shadow recurrence exercises PCApplyTranspose on the mg PC."""
    a = problems.nonsym_banded(1024, 2, 2, seed=9)
    u = np.ones(1024)
    res = solve(banded_of(a), jnp.asarray(a @ u), ksp_type="bicg",
                pc_type="mg", rtol=1e-9, maxit=200)
    assert int(res.reason) > 0, reason_str(res.reason)
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-5, atol=1e-6)
