"""Complex-scalar support through the band/blocktri/SPIKE/KSP stack
(PETSc complex-build parity)."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
from spike_petsc_tpu.ops.spike import spike_factor, spike_solve
from spike_petsc_tpu.solvers.krylov import bicgstab, cg, gmres


def _complex_banded(n, k, seed=0, hermitian=False):
    rng = np.random.default_rng(seed)
    a = np.zeros((n, n), dtype=np.complex128)
    for i in range(n):
        lo, hi = max(0, i - k), min(n, i + k + 1)
        a[i, lo:hi] = rng.standard_normal(hi - lo) + \
            1j * rng.standard_normal(hi - lo)
    if hermitian:
        a = 0.5 * (a + a.conj().T)
    a[np.arange(n), np.arange(n)] = np.abs(a).sum(1) + 1.0
    return a


def _band_of(a, k):
    n = a.shape[0]
    data = np.zeros((n, 2 * k + 1), dtype=a.dtype)
    for i in range(n):
        for d in range(-k, k + 1):
            j = i + d
            if 0 <= j < n:
                data[i, d + k] = a[i, j]
    return BandedMatrix(data=jnp.asarray(data), kl=k, ku=k)


def test_complex_banded_matvec():
    n, k = 50, 3
    a = _complex_banded(n, k, seed=1)
    bm = _band_of(a, k)
    x = np.random.default_rng(0).standard_normal(n) + \
        1j * np.random.default_rng(1).standard_normal(n)
    y = np.asarray(banded_matvec(bm, jnp.asarray(x)))
    np.testing.assert_allclose(y, a @ x, rtol=1e-12)


def test_complex_spike_direct_solve():
    n, k = 300, 4
    a = _complex_banded(n, k, seed=2)
    bm = _band_of(a, k)
    sf = spike_factor(bm, K=4, block_b=8)
    rng = np.random.default_rng(3)
    u = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = np.asarray(spike_solve(sf, jnp.asarray(a @ u)))
    np.testing.assert_allclose(x, u, rtol=1e-9, atol=1e-10)


def test_complex_gmres_with_spike_pc():
    n, k = 200, 3
    a = _complex_banded(n, k, seed=4)
    bm = _band_of(a, k)
    sf = spike_factor(bm, K=4, block_b=8)
    rng = np.random.default_rng(5)
    u = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    res = gmres(lambda v: banded_matvec(bm, v), jnp.asarray(a @ u), None,
                lambda v: spike_solve(sf, v), rtol=1e-12, maxit=50)
    assert int(res.reason) > 0
    assert int(res.its) <= 3
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-8, atol=1e-9)
    h = np.asarray(res.history)
    assert h.dtype.kind == "f"          # residual history stays real


def test_complex_gmres_unpreconditioned_matches_scipy():
    import scipy.sparse.linalg as spla
    n, k = 120, 2
    a = _complex_banded(n, k, seed=6)
    bm = _band_of(a, k)
    rng = np.random.default_rng(7)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    res = gmres(lambda v: banded_matvec(bm, v), jnp.asarray(b), None, None,
                rtol=1e-10, restart=30, maxit=500)
    x_sp, info = spla.gmres(sp.csr_matrix(a), b, rtol=1e-10, restart=30,
                            maxiter=500)
    assert info == 0 and int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), x_sp, rtol=1e-6, atol=1e-8)


def test_complex_cg_hermitian():
    n, k = 150, 2
    a = _complex_banded(n, k, seed=8, hermitian=True)
    bm = _band_of(a, k)
    rng = np.random.default_rng(9)
    u = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    res = cg(lambda v: banded_matvec(bm, v), jnp.asarray(a @ u), None, None,
             rtol=1e-11, maxit=500)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-7, atol=1e-8)


def test_complex_bicgstab():
    n, k = 150, 2
    a = _complex_banded(n, k, seed=10)
    bm = _band_of(a, k)
    rng = np.random.default_rng(11)
    u = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    res = bicgstab(lambda v: banded_matvec(bm, v), jnp.asarray(a @ u), None,
                   None, rtol=1e-11, maxit=500)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-6, atol=1e-7)


def test_complex_distributed_solve():
    """Complex scalars through the DISTRIBUTED path: mesh factor, direct
    solve, and the in-mesh Krylov solver (PETSc complex-build parity on
    multiple ranks)."""
    from spike_petsc_tpu.parallel import (dist_spike_factor, dist_spike_solve,
                                          make_dist_solver, make_mesh)
    n, k = 384, 3
    a = _complex_banded(n, k, seed=21)
    bm = _band_of(a, k)
    mesh = make_mesh(8, axis="p")
    dsf = dist_spike_factor(bm, mesh, block_b=8)
    rng = np.random.default_rng(22)
    u = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    rhs = jnp.asarray(a @ u)
    x = np.asarray(dist_spike_solve(dsf, rhs, mesh))
    np.testing.assert_allclose(x, u, rtol=1e-8, atol=1e-9)
    res = make_dist_solver(dsf, mesh, ksp_type="gmres", rtol=1e-10,
                           maxit=20)(rhs)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("name", ["cgnr", "lsqr", "cgs", "tfqmr", "gcr"])
def test_complex_new_ksps(name):
    """The new KSP families on complex operators: conjugation wrapping in
    the normal-equations methods (A^H from the pure transpose), complex
    rho/omega algebra in the transpose-free ones, conjugated Gram row in
    GCR."""
    from spike_petsc_tpu.solvers import krylov

    n, k = 60, 2
    a = _complex_banded(n, k, seed=7)
    A = _band_of(a, k)
    xe = (np.random.default_rng(3).standard_normal(n)
          + 1j * np.random.default_rng(4).standard_normal(n))
    b = jnp.asarray(a @ xe)
    AT = _band_of(a.T, k)
    mv = lambda x: banded_matvec(A, x)
    mvt = lambda y: banded_matvec(AT, y)
    fn = getattr(krylov, name)
    kw = {}
    if name in ("cgnr", "lsqr"):
        kw["matvec_transpose"] = mvt
    res = fn(mv, b, rtol=1e-11, maxit=800, **kw)
    assert int(res.reason) > 0, (name, int(res.reason))
    assert np.linalg.norm(np.asarray(res.x) - xe) < 1e-6, name


def test_complex_batched_bicgstab_many():
    from spike_petsc_tpu.solvers import krylov_many
    import jax

    n, k = 64, 2
    a = _complex_banded(n, k, seed=9)
    A = _band_of(a, k)
    rng = np.random.default_rng(5)
    U = rng.standard_normal((n, 3)) + 1j * rng.standard_normal((n, 3))
    B = jnp.asarray(a @ U)
    mv_many = jax.vmap(lambda x: banded_matvec(A, x), in_axes=1, out_axes=1)
    res = krylov_many.bicgstab_many(mv_many, B, rtol=1e-11, maxit=400)
    assert all(int(r) > 0 for r in np.asarray(res.reason))
    np.testing.assert_allclose(np.asarray(res.x), U, rtol=1e-6, atol=1e-7)
