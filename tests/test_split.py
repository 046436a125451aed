"""Band + outliers split operator (ops/split.py): exact general-sparse
SpMV with the band at vector speed and only outliers on the scalar path."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from spike_petsc_tpu.ops.split import (_SCALAR_COST, SplitBandedMatrix,
                                       split_cost, split_from_csr,
                                       split_matvec)


def _banded_plus_outliers(n, k, nnz_out, seed=0):
    rng = np.random.default_rng(seed)
    diags = [rng.standard_normal(n - abs(d)) for d in range(-k, k + 1)]
    a = sp.diags(diags, range(-k, k + 1), format="lil")
    r = rng.integers(0, n, nnz_out)
    c = rng.integers(0, n, nnz_out)
    a[r, c] = rng.standard_normal(nnz_out)
    return sp.csr_matrix(a)


def test_split_matvec_matches_scipy():
    a = _banded_plus_outliers(500, 3, 40, seed=1)
    sm = split_from_csr(a)
    assert isinstance(sm, SplitBandedMatrix)
    # the chosen band absorbs the dense diagonals; outliers stay sparse
    assert sm.band.kl >= 3 and sm.nnz_out <= 80
    rng = np.random.default_rng(2)
    for _ in range(3):
        x = rng.standard_normal(500)
        np.testing.assert_allclose(np.asarray(split_matvec(sm, jnp.asarray(x))),
                                   a @ x, rtol=1e-6, atol=1e-8)


def test_split_exactness_vs_banded_pre_mat():
    """The split is an OPERATOR representation: unlike the -banded_pre_mat
    truncation, out-of-band entries are preserved exactly."""
    a = _banded_plus_outliers(300, 2, 25, seed=3)
    sm = split_from_csr(a)
    dense = a.toarray()
    x = np.random.default_rng(4).standard_normal(300)
    np.testing.assert_allclose(np.asarray(split_matvec(sm, jnp.asarray(x))),
                               dense @ x, rtol=1e-6, atol=1e-8)


def test_cost_model_prefers_wide_band_for_near_banded():
    # strictly banded matrix: every entry lands in the band, no outliers
    a = _banded_plus_outliers(400, 4, 0, seed=5)
    sm = split_from_csr(a)
    assert sm.nnz_out == 0 and sm.band.kl == 4
    # pure random sparse: no band structure, k stays small and most
    # entries remain outliers (the BCOO comparison in as_matvec rejects it)
    rng = np.random.default_rng(6)
    n, nnz = 2000, 4000
    r = sp.csr_matrix((rng.standard_normal(nnz),
                       (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
                      shape=(n, n))
    smr = split_from_csr(r)
    assert not (split_cost(n, smr.band.kl, smr.nnz_out)
                < 0.7 * _SCALAR_COST * r.nnz)


def test_solve_routes_general_sparse_through_split():
    from spike_petsc_tpu.solvers.ksp import solve
    n = 600
    a = _banded_plus_outliers(n, 3, 30, seed=7)
    # make it solvable: diagonal dominance
    d = np.abs(a).sum(axis=1).A.ravel() + 1.0
    a = sp.csr_matrix(a + sp.diags(d))
    u = np.random.default_rng(8).standard_normal(n)
    b = jnp.asarray(a @ u)
    res = solve(a, b, ksp_type="gmres", pc_type="jacobi", rtol=1e-10,
                maxit=200)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-5, atol=1e-6)


def test_split_complex():
    n, k = 200, 2
    rng = np.random.default_rng(9)
    a = _banded_plus_outliers(n, k, 15, seed=9).astype(np.complex128)
    a = a + 1j * _banded_plus_outliers(n, k, 15, seed=10)
    sm = split_from_csr(sp.csr_matrix(a))
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(split_matvec(sm, jnp.asarray(x))),
                               a @ x, rtol=1e-6, atol=1e-8)


def test_split_plan_rejects_rectangular():
    """Rectangular operators (fieldsplit off-diagonal blocks) must take the
    BCOO route: band storage is square-only (regression — split_matvec
    raised a broadcasting TypeError inside the Schur fieldsplit apply)."""
    import scipy.sparse as sp
    from spike_petsc_tpu.ops.split import split_if_profitable, split_plan
    rng = np.random.default_rng(0)
    a = sp.random(90, 110, density=0.2, random_state=rng, format="csr")
    k, nnz_out, profitable = split_plan(a)
    assert not profitable
    assert split_if_profitable(a) is None
    # and the full operator route still works end-to-end
    from spike_petsc_tpu.solvers.operator import as_matvec
    mv, n, _ = as_matvec(a)
    x = rng.standard_normal(110)
    np.testing.assert_allclose(np.asarray(mv(jnp.asarray(x))), a @ x,
                               rtol=1e-10, atol=1e-12)
