"""Quick-tier smoke coverage for the distributed paths (VERDICT r2 weak #8:
the dist/multislice code was only exercised by the slow tier, so an
iteration loop running `pytest -m "not slow"` could break them invisibly).

Tiny shapes, one mesh layout per surface — these compile in seconds and hit
the persistent XLA cache afterwards; exhaustive coverage stays in the slow
modules (test_parallel, test_dist_parity)."""

import numpy as np
import jax.numpy as jnp

from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.ops.band import BandedMatrix
from spike_petsc_tpu.parallel import (dist_spike_factor, dist_spike_solve,
                                      make_dist_solver, make_mesh)


def _band(acsr):
    data, kl, ku = hsp.csr_to_banded_arrays(acsr)
    return BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)


def test_dist_factor_solve_smoke():
    """Factor + direct solve on a 2-device mesh: the minimal end-to-end
    distributed SPIKE path (per-device factor, tip all_gather, replicated
    reduced solve, correction sweep)."""
    n = 128
    a = problems.spd_banded(n, 2, seed=11)
    bm = _band(a)
    mesh = make_mesh(2, axis="p")
    dsf = dist_spike_factor(bm, mesh, block_b=8, parts_per_device=2)
    u = np.random.default_rng(12).standard_normal(n)
    x = np.asarray(dist_spike_solve(dsf, jnp.asarray(a @ u), mesh))
    np.testing.assert_allclose(x, u, rtol=1e-8, atol=1e-9)


def test_dist_krylov_smoke():
    """In-mesh SPIKE-preconditioned GMRES on 2 devices: ppermute halo
    matvec + psum reductions compile and converge."""
    n = 128
    a = problems.nonsym_banded(n, 2, 2, seed=13)
    bm = _band(a)
    mesh = make_mesh(2, axis="p")
    dsf = dist_spike_factor(bm, mesh, block_b=8)
    res = make_dist_solver(dsf, mesh, ksp_type="gmres", rtol=1e-10,
                           maxit=20)(jnp.asarray(a @ np.ones(n)))
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), np.ones(n), rtol=1e-7,
                               atol=1e-8)


def test_dist_spd_method_smoke():
    """method='spd' symmetric factors through the distributed path: the
    2/3-memory Cholesky-role factorization composes with the mesh solve."""
    n = 128
    a = problems.spd_banded(n, 2, seed=17)
    bm = _band(a)
    mesh = make_mesh(2, axis="p")
    dsf = dist_spike_factor(bm, mesh, block_b=8, method="spd")
    assert dsf.fact.method == "spd" and dsf.fact.U.size == 0
    u = np.random.default_rng(18).standard_normal(n)
    x = np.asarray(dist_spike_solve(dsf, jnp.asarray(a @ u), mesh))
    np.testing.assert_allclose(x, u, rtol=1e-8, atol=1e-9)
