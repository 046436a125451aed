"""Unit tests for band storage and block-tridiagonal kernels vs NumPy/SciPy
oracles — the testing strategy SURVEY.md §4 prescribes for each kernel."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from spike_petsc_tpu.ops import band as B
from spike_petsc_tpu.ops import blocktri as BT
from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems


def random_banded_dense(n, kl, ku, seed=0, dominant=True):
    rng = np.random.default_rng(seed)
    a = np.zeros((n, n))
    for i in range(n):
        lo, hi = max(0, i - kl), min(n, i + ku + 1)
        a[i, lo:hi] = rng.uniform(-1, 1, hi - lo)
    if dominant:
        a[np.arange(n), np.arange(n)] = np.abs(a).sum(1) + 1.0
    return a


@pytest.mark.parametrize("n,kl,ku", [(17, 2, 3), (32, 0, 1), (9, 4, 0), (25, 3, 3)])
def test_band_dense_roundtrip(n, kl, ku):
    a = random_banded_dense(n, kl, ku)
    bm = B.banded_from_dense(jnp.asarray(a), kl, ku)
    np.testing.assert_allclose(np.asarray(B.banded_to_dense(bm)), a, atol=1e-14)


def test_band_from_coo_matches_dense():
    a = random_banded_dense(23, 2, 4, seed=3)
    coo = sp.coo_matrix(a)
    bm = B.banded_from_coo(coo.row, coo.col, coo.data, 23, 2, 4)
    np.testing.assert_allclose(np.asarray(B.banded_to_dense(bm)), a, atol=1e-14)


def test_band_from_coo_drops_out_of_band():
    a = random_banded_dense(12, 3, 3, seed=1)
    coo = sp.coo_matrix(a)
    bm = B.banded_from_coo(coo.row, coo.col, coo.data, 12, 1, 1)
    expect = np.triu(np.tril(a, 1), -1)
    np.testing.assert_allclose(np.asarray(B.banded_to_dense(bm)), expect, atol=1e-14)


@pytest.mark.parametrize("nrhs", [None, 3])
def test_banded_matvec(nrhs):
    n, kl, ku = 31, 3, 2
    a = random_banded_dense(n, kl, ku, seed=5)
    bm = B.banded_from_dense(jnp.asarray(a), kl, ku)
    x = np.random.default_rng(7).standard_normal((n,) if nrhs is None else (n, nrhs))
    y = B.banded_matvec(bm, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), a @ x, rtol=1e-12)


def test_banded_transpose_and_matvec_t():
    n, kl, ku = 19, 2, 4
    a = random_banded_dense(n, kl, ku, seed=9)
    bm = B.banded_from_dense(jnp.asarray(a), kl, ku)
    bt = B.banded_transpose(bm)
    np.testing.assert_allclose(np.asarray(B.banded_to_dense(bt)), a.T, atol=1e-14)
    x = np.random.default_rng(1).standard_normal(n)
    np.testing.assert_allclose(np.asarray(B.banded_matvec_t(bm, jnp.asarray(x))),
                               a.T @ x, rtol=1e-12)


def test_banded_bandwidth_and_diagonal():
    a = random_banded_dense(20, 3, 1, seed=2)
    bm = B.banded_from_dense(jnp.asarray(a), 5, 5)  # over-allocated band
    kl_eff, ku_eff = B.banded_bandwidth(bm)
    assert int(kl_eff) == 3 and int(ku_eff) == 1
    np.testing.assert_allclose(np.asarray(B.banded_diagonal(bm)), np.diag(a))


# ---------------------------------------------------------------------------
# block-tridiagonal
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,kl,ku,b", [(24, 2, 2, 4), (30, 3, 1, 5), (17, 2, 3, 4)])
def test_band_to_blocktri_roundtrip(n, kl, ku, b):
    a = random_banded_dense(n, kl, ku, seed=11)
    bm = B.banded_from_dense(jnp.asarray(a), kl, ku)
    t = BT.band_to_blocktri(bm, b)
    dense = np.asarray(BT.blocktri_to_dense(t))
    npad = t.nb * t.b
    expect = np.eye(npad)
    expect[:n, :n] = a
    np.testing.assert_allclose(dense, expect, atol=1e-14)


def test_blocktri_matvec():
    n, kl, ku, b = 24, 2, 2, 4
    a = random_banded_dense(n, kl, ku, seed=13)
    t = BT.band_to_blocktri(B.banded_from_dense(jnp.asarray(a), kl, ku), b)
    x = np.random.default_rng(3).standard_normal(n)
    y = BT.blocktri_matvec(t, jnp.asarray(x).reshape(t.nb, t.b))
    np.testing.assert_allclose(np.asarray(y).ravel()[:n], a @ x, rtol=1e-12)


@pytest.mark.parametrize("method", ["inv", "lu"])
@pytest.mark.parametrize("nrhs", [None, 2])
def test_blocktri_factor_solve(method, nrhs):
    n, kl, ku, b = 40, 3, 2, 8
    a = random_banded_dense(n, kl, ku, seed=17)
    t = BT.band_to_blocktri(B.banded_from_dense(jnp.asarray(a), kl, ku), b)
    fact = BT.blocktri_factor(t, method=method)
    rng = np.random.default_rng(23)
    shape = (n,) if nrhs is None else (n, nrhs)
    xe = rng.standard_normal(shape)
    rhs = a @ xe
    rhs_pad = np.zeros((t.nb * t.b,) + shape[1:])
    rhs_pad[:n] = rhs
    rhs_blocks = jnp.asarray(rhs_pad).reshape((t.nb, t.b) + shape[1:])
    x = np.asarray(BT.blocktri_solve(fact, rhs_blocks)).reshape(
        (t.nb * t.b,) + shape[1:])[:n]
    np.testing.assert_allclose(x, xe, rtol=1e-9, atol=1e-10)


def test_blocktri_solve_tridiagonal_laplacian():
    """Minimum end-to-end slice direct-solve check (BASELINE config 1)."""
    n = 1000
    acsr = problems.tridiag_laplacian(n)
    data, kl, ku = hsp.csr_to_banded_arrays(acsr)
    bm = B.BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)
    t = BT.band_to_blocktri(bm, 8)
    fact = BT.blocktri_factor(t, method="lu")
    u = np.ones(n)
    rhs = acsr @ u
    rhs_pad = np.zeros(t.nb * t.b)
    rhs_pad[:n] = rhs
    x = np.asarray(BT.blocktri_solve(fact, jnp.asarray(rhs_pad).reshape(t.nb, t.b)))
    np.testing.assert_allclose(x.ravel()[:n], u, rtol=1e-8)


# ---------------------------------------------------------------------------
# host sparse utilities
# ---------------------------------------------------------------------------

def test_compute_bandwidth():
    a = problems.laplacian_2d(7, 5)
    assert hsp.compute_bandwidth(a) == 7
    assert hsp.compute_half_bandwidths(a) == (7, 7)


def test_extract_banded_norm_fraction():
    """Mirrors MatCreateSubMatrixBanded semantics
    (/root/reference/src/matbanded.c:38-57)."""
    a = problems.laplacian_2d(6, 6)
    res = hsp.extract_banded(a, kmax=50, frac=0.95)
    assert res.k <= 6
    assert res.frac >= 0.95 or res.k == 50
    # band really is banded
    assert hsp.compute_bandwidth(res.matrix) <= res.k
    # fraction is exact
    total = np.abs(a.tocoo().data).sum()
    kept = np.abs(res.matrix.tocoo().data).sum()
    np.testing.assert_allclose(res.frac, kept / total, rtol=1e-12)


def test_extract_banded_kmax_fallback():
    a = problems.general_sparse(200, seed=4, band_heavy=False)
    res = hsp.extract_banded(a, kmax=3, frac=0.9999)
    assert res.k == 3
    assert hsp.compute_bandwidth(res.matrix) <= 3


def test_permute_and_scale_roundtrip():
    rng = np.random.default_rng(0)
    a = problems.nonsym_banded(30, 2, 2, seed=8)
    p = rng.permutation(30)
    pa = hsp.permute(a, p)
    np.testing.assert_allclose(pa.toarray(), a.toarray()[p][:, p])
    dr, dc = rng.uniform(0.5, 2, 30), rng.uniform(0.5, 2, 30)
    sa = hsp.diagonal_scale(a, dr, dc)
    np.testing.assert_allclose(sa.toarray(), np.diag(dr) @ a.toarray() @ np.diag(dc))


def test_diag_diagnostics():
    a = problems.mc64_doc_example()
    assert hsp.count_zero_diagonals(a) == 2  # rows 0 and 2 have no diagonal
    assert hsp.diagonal_norm1(a) == 2.0


def test_extract_banded_device_matches_host():
    import jax.numpy as jnp
    a = problems.laplacian_2d(6, 6)
    coo = a.tocoo()
    bm, k, frac = B.extract_banded_device(
        jnp.asarray(coo.row), jnp.asarray(coo.col), jnp.asarray(coo.data),
        n=a.shape[0], kmax=50, frac=0.95)
    host = hsp.extract_banded(a, kmax=50, frac=0.95)
    assert int(k) == host.k
    np.testing.assert_allclose(float(frac), host.frac, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(B.banded_to_dense(bm)),
                               host.matrix.toarray(), atol=1e-14)


def test_extract_banded_device_kmax_fallback():
    import jax.numpy as jnp
    a = problems.general_sparse(200, seed=4, band_heavy=False)
    coo = a.tocoo()
    bm, k, frac = B.extract_banded_device(
        jnp.asarray(coo.row), jnp.asarray(coo.col), jnp.asarray(coo.data),
        n=200, kmax=3, frac=0.9999)
    assert int(k) == 3
    kl_eff, ku_eff = B.banded_bandwidth(bm)
    assert int(kl_eff) <= 3 and int(ku_eff) <= 3


@pytest.mark.parametrize("n,kl,ku", [(17, 2, 3), (9, 4, 0), (32, 0, 1)])
def test_banded_diagonal_scale_vs_dense(n, kl, ku):
    a = random_banded_dense(n, kl, ku, seed=5)
    rng = np.random.default_rng(7)
    dr = rng.uniform(0.5, 2.0, n)
    dc = rng.uniform(0.5, 2.0, n)
    bm = B.banded_from_dense(jnp.asarray(a), kl, ku)
    got = B.banded_to_dense(B.banded_diagonal_scale(
        bm, jnp.asarray(dr), jnp.asarray(dc)))
    np.testing.assert_allclose(np.asarray(got), dr[:, None] * a * dc[None, :],
                               atol=1e-12)
    # either factor alone
    got_r = B.banded_to_dense(B.banded_diagonal_scale(bm, dr=jnp.asarray(dr)))
    np.testing.assert_allclose(np.asarray(got_r), dr[:, None] * a, atol=1e-12)
    got_c = B.banded_to_dense(B.banded_diagonal_scale(bm, dc=jnp.asarray(dc)))
    np.testing.assert_allclose(np.asarray(got_c), a * dc[None, :], atol=1e-12)


def test_ksp_diagonal_scale_option():
    """-ksp_diagonal_scale: solves the symmetrically rescaled system and
    returns the UNSCALED solution (PETSc KSPSetDiagonalScale semantics)."""
    from spike_petsc_tpu.solvers.ksp import solve
    from spike_petsc_tpu.utils.options import Options
    n = 200
    a = random_banded_dense(n, 2, 2, seed=11)
    # wreck the scaling: rows/cols spanning 8 orders of magnitude
    s = 10.0 ** np.linspace(-4, 4, n)
    a = s[:, None] * a * s[None, :]
    bm = B.banded_from_dense(jnp.asarray(a), 2, 2)
    x_true = np.random.default_rng(3).standard_normal(n)
    b = a @ x_true
    opts = Options.from_argv(["-ksp_diagonal_scale",
                              "-ksp_diagonal_scale_fix"])
    res = solve(bm, jnp.asarray(b), options=opts, ksp_type="gmres",
                pc_type="jacobi", rtol=1e-12, maxit=500)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6)


def test_banded_shift_scale_axpy_vs_dense():
    """MatShift / MatScale / MatAXPY analogs in band storage."""
    a = random_banded_dense(15, 2, 3, seed=9)
    c = random_banded_dense(15, 1, 4, seed=10)
    bm_a = B.banded_from_dense(jnp.asarray(a), 2, 3)
    bm_c = B.banded_from_dense(jnp.asarray(c), 1, 4)
    np.testing.assert_allclose(
        np.asarray(B.banded_to_dense(B.banded_shift(bm_a, 2.5))),
        a + 2.5 * np.eye(15), atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(B.banded_to_dense(B.banded_scale(bm_a, -3.0))),
        -3.0 * a, atol=1e-14)
    got = B.banded_axpy(bm_a, 0.5, bm_c)
    assert (got.kl, got.ku) == (2, 4)
    np.testing.assert_allclose(np.asarray(B.banded_to_dense(got)),
                               a + 0.5 * c, atol=1e-14)
    with pytest.raises(ValueError, match="size mismatch"):
        B.banded_axpy(bm_a, 1.0, B.banded_from_dense(
            jnp.asarray(random_banded_dense(9, 1, 1)), 1, 1))
