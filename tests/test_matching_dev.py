"""Device auction matching vs exact MC64 job-5 optimum, plus aux-subsystem
tests (profiling scopes, factorization health, shadow runs)."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.ordering import mc64
from spike_petsc_tpu.parallel.matching_dev import auction_match


def _is_perm(p):
    return np.array_equal(np.sort(p), np.arange(len(p)))


def test_auction_doc_example_optimal():
    a = problems.mc64_doc_example()
    res = auction_match(a)
    assert _is_perm(res.rperm)
    pa = res.apply(a)
    np.testing.assert_allclose(np.prod(np.abs(pa.diagonal())), 32.0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auction_near_optimal_product(seed):
    n = 60
    rng = np.random.default_rng(seed)
    a = sp.random(n, n, density=0.15, random_state=rng,
                  data_rvs=lambda k: rng.uniform(0.1, 10, k))
    a = a + sp.csr_matrix((rng.uniform(0.5, 5, n),
                           (np.arange(n), rng.permutation(n))), shape=(n, n))
    a = a.tocsr()
    exact = mc64(a, job=5)
    approx = auction_match(a, eps=1e-6 / n)
    lp_exact = np.sum(np.log(np.abs(exact.apply(a).diagonal())))
    lp_approx = np.sum(np.log(np.abs(approx.apply(a).diagonal())))
    assert lp_approx >= lp_exact - 1e-3   # within n*eps of optimal
    assert _is_perm(approx.rperm)


def test_auction_scaling_invariant():
    a = problems.illscaled_nonsym(80, 3, 3, seed=4)
    res = auction_match(a, eps=1e-7)
    sa = res.apply(a, scale=True)
    d = np.abs(sa.diagonal())
    # eps-CS: matched scaled entries within a whisker of 1, all <= 1 + eps
    np.testing.assert_allclose(d, 1.0, rtol=1e-4)
    assert np.abs(sa.toarray()).max() <= 1.0 + 1e-4


def test_auction_improves_diagonal_weight():
    a = problems.illscaled_nonsym(150, 4, 4, seed=6)
    res = auction_match(a)
    assert hsp.diagonal_weight_product(res.apply(a)) >= \
        hsp.diagonal_weight_product(a)


# ---------------------------------------------------------------------------
# auxiliary subsystems
# ---------------------------------------------------------------------------

def test_profiling_scopes_and_events():
    from spike_petsc_tpu.utils import profiling as prof
    prof.clear()
    with prof.scope("factor"):
        _ = jnp.ones(4).sum()
    with prof.scope("factor"):
        _ = jnp.ones(4).sum()
    prof.log_event("solve_done", its=3, rnorm=1e-9)
    rep = prof.stage_report()
    assert "factor" in rep and "2" in rep
    assert prof.event_log()[-1]["event"] == "solve_done"


def test_factor_health_ok_and_singular():
    from spike_petsc_tpu.ops.band import BandedMatrix
    from spike_petsc_tpu.ops.blocktri import band_to_blocktri, blocktri_factor
    from spike_petsc_tpu.utils.debug import OK, SINGULAR, factor_health

    data, kl, ku = hsp.csr_to_banded_arrays(problems.tridiag_laplacian(32))
    t = band_to_blocktri(BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku), 4)
    h = factor_health(blocktri_factor(t))
    assert int(h.status) == OK

    # singular leading block -> non-finite inverse
    bad = t.D.at[0].set(0.0)
    from spike_petsc_tpu.ops.blocktri import BlockTridiagonal
    tb = BlockTridiagonal(D=bad, L=t.L, U=t.U)
    h2 = factor_health(blocktri_factor(tb))
    assert int(h2.status) == SINGULAR


def test_shadow_check_flags_precision():
    from spike_petsc_tpu.utils.debug import shadow_check

    def sumsq(x):
        return (x * x).sum()

    x32 = jnp.linspace(0, 1, 1000, dtype=jnp.float32)
    _, dev = shadow_check(sumsq, x32)
    assert dev < 1e-4  # f32 vs f64 deviation is small but measurable


def test_check_finite_raises():
    from spike_petsc_tpu.utils.debug import check_finite
    with pytest.raises(FloatingPointError):
        check_finite(np.array([1.0, np.nan]), "x")
