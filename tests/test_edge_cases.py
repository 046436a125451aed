"""Edge-case hardening: degenerate sizes, one-sided bands, option parsing."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from spike_petsc_tpu import (BandedMatrix, Options, banded_from_dense, solve,
                             spike_factor, spike_solve)
from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems


def test_single_element_system():
    bm = BandedMatrix(data=jnp.asarray([[0.0, 4.0, 0.0]]), kl=1, ku=1)
    sf = spike_factor(bm, K=1)
    x = np.asarray(spike_solve(sf, jnp.asarray([8.0])))
    np.testing.assert_allclose(x, [2.0])


@pytest.mark.parametrize("kl,ku", [(0, 2), (2, 0), (0, 0)])
def test_one_sided_bands(kl, ku):
    """Pure upper/lower-triangular bands and pure diagonal."""
    n = 40
    rng = np.random.default_rng(0)
    a = np.zeros((n, n))
    for i in range(n):
        lo, hi = max(0, i - kl), min(n, i + ku + 1)
        a[i, lo:hi] = rng.uniform(0.5, 1.0, hi - lo)
    a[np.arange(n), np.arange(n)] = 3.0
    bm = banded_from_dense(jnp.asarray(a), kl, ku)
    sf = spike_factor(bm, K=2, block_b=4)
    u = rng.standard_normal(n)
    x = np.asarray(spike_solve(sf, jnp.asarray(a @ u)))
    np.testing.assert_allclose(x, u, rtol=1e-9, atol=1e-10)


def test_k_larger_than_practical_is_rejected():
    bm = banded_from_dense(jnp.eye(16) * 2, 2, 2)
    with pytest.raises(ValueError, match="partition rows"):
        spike_factor(bm, K=8, block_b=2)


def test_block_smaller_than_tip_rejected():
    bm = banded_from_dense(jnp.eye(64) * 2, 4, 4)
    with pytest.raises(ValueError, match="block size"):
        spike_factor(bm, K=2, block_b=2)


def test_options_bad_bool():
    o = Options({"flag": "maybe"})
    with pytest.raises(ValueError, match="boolean"):
        o.get_bool("flag")


def test_options_negative_numbers_as_values():
    o = Options.from_argv(["-shift", "-1.5", "-count", "-3"])
    assert o.get_real("shift") == -1.5
    assert o.get_int("count") == -3


def test_extract_banded_frac_one():
    a = problems.laplacian_2d(5, 5)
    res = hsp.extract_banded(a, kmax=50, frac=1.0)
    np.testing.assert_allclose(res.matrix.toarray(), a.toarray())
    assert res.frac == 1.0


def test_ordering_identity_on_diagonal_matrix():
    from spike_petsc_tpu.ordering import mc64
    a = sp.diags(np.arange(1.0, 11.0)).tocsr()
    res = mc64(a, job=5)
    np.testing.assert_array_equal(res.rperm, np.arange(10))
    sa = res.apply(a, scale=True)
    np.testing.assert_allclose(np.abs(sa.diagonal()), 1.0)


def test_solve_with_zero_rhs():
    a = problems.spd_banded(50, 2, seed=0)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    bm = BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)
    res = solve(bm, jnp.zeros(50), ksp_type="gmres", pc_type="lu")
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-12)


def test_solve_nonzero_initial_guess():
    a = problems.spd_banded(80, 2, seed=1)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    bm = BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)
    u = np.random.default_rng(2).uniform(size=80)
    x0 = u + 1e-3
    res = solve(bm, jnp.asarray(a @ u), x0=jnp.asarray(x0), ksp_type="cg",
                pc_type="jacobi", rtol=1e-12, maxit=200)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-7, atol=1e-9)
