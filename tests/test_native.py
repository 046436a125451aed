"""Native C++ assignment engine vs the Python reference implementation."""

import numpy as np
import pytest
import scipy.sparse as sp

from spike_petsc_tpu.native import loader
from spike_petsc_tpu.ordering.matching import sparse_assignment


def _rand_cost_csc(n, seed):
    rng = np.random.default_rng(seed)
    a = sp.random(n, n, density=0.1, random_state=rng,
                  data_rvs=lambda k: rng.uniform(0.1, 10, k))
    a = a + sp.csr_matrix((rng.uniform(0.5, 5, n),
                           (np.arange(n), rng.permutation(n))), shape=(n, n))
    csc = sp.csc_matrix(a)
    return csc, np.abs(csc.data) + 0.01


@pytest.fixture(scope="module")
def native_fn():
    fn = loader.get_assignment()
    if fn is None:
        pytest.skip("native toolchain unavailable")
    return fn


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python(native_fn, seed):
    n = 80
    csc, cost = _rand_cost_csc(n, seed)
    ptr = csc.indptr.astype(np.int64)
    rows = csc.indices.astype(np.int64)
    m_c, u_c, v_c, ok_c = native_fn(n, ptr, rows, cost)
    m_p, u_p, v_p, ok_p = sparse_assignment(n, ptr, rows, cost)
    assert ok_c and ok_p
    cm = sp.csc_matrix((cost, rows, ptr), shape=(n, n))
    total_c = sum(cm[m_c[j], j] for j in range(n))
    total_p = sum(cm[m_p[j], j] for j in range(n))
    np.testing.assert_allclose(total_c, total_p, rtol=1e-12)
    # dual feasibility for the native duals
    coo = cm.tocoo()
    rc = coo.data - u_c[coo.row] - v_c[coo.col]
    assert (rc >= -1e-9).all()


def test_native_used_by_mc64():
    """mc64 must transparently dispatch to the native engine when built."""
    from spike_petsc_tpu.ordering import mc64
    from spike_petsc_tpu.models import problems
    a = problems.illscaled_nonsym(150, 3, 3, seed=2)
    res = mc64(a, job=5)
    sa = res.apply(a, scale=True)
    np.testing.assert_allclose(np.abs(sa.diagonal()), 1.0, rtol=1e-9)


def test_native_speed_advantage():
    fn = loader.get_assignment()
    if fn is None:
        pytest.skip("native toolchain unavailable")
    import time
    n = 1500
    csc, cost = _rand_cost_csc(n, 7)
    ptr = csc.indptr.astype(np.int64)
    rows = csc.indices.astype(np.int64)
    t0 = time.perf_counter()
    fn(n, ptr, rows, cost)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    sparse_assignment(n, ptr, rows, cost)
    t_python = time.perf_counter() - t0
    assert t_native < t_python  # typically 50-500x
