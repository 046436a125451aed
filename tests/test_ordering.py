"""Ordering pipeline tests vs SciPy oracles and MC64 documented behavior.

Key invariants (SURVEY.md §4 inline checks):
- matchings are valid permutations with every column matched
  (/root/reference/src/petsc_mat_awbm.c:195-199)
- diagonal weight product increases after permutation
  (/root/reference/src/wbm.c:530-551)
- job-5 scalings give unit matched diagonal, off-diagonals <= 1
- RCM/Fiedler reduce bandwidth/profile
"""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.csgraph import min_weight_full_bipartite_matching

from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.ordering import (awbm, fiedler, get_ordering, mc64, rcm,
                                      spectral_partition)
from spike_petsc_tpu.ordering.matching import sparse_assignment
from spike_petsc_tpu.utils.options import Options


def _is_perm(p):
    return np.array_equal(np.sort(p), np.arange(len(p)))


def _rand_sparse(n, seed, density=0.15, ensure_perfect=True):
    rng = np.random.default_rng(seed)
    a = sp.random(n, n, density=density, random_state=rng,
                  data_rvs=lambda k: rng.uniform(0.1, 10, k)).tocsr()
    if ensure_perfect:
        p = rng.permutation(n)
        a = a + sp.csr_matrix((rng.uniform(0.5, 5, n),
                               (np.arange(n), p)), shape=(n, n))
    return a.tocsr()


# ---------------------------------------------------------------------------
# exact assignment engine
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sparse_assignment_matches_scipy(seed):
    n = 40
    a = _rand_sparse(n, seed)
    csc = sp.csc_matrix(a)
    cost = np.abs(csc.data) + 0.01  # positive costs
    csc_cost = sp.csc_matrix((cost, csc.indices, csc.indptr), shape=(n, n))
    match, u, v, feasible = sparse_assignment(
        n, csc.indptr.astype(np.int64), csc.indices.astype(np.int64), cost)
    assert feasible and _is_perm(match)
    ours = cost_of(csc_cost, match)
    rr, cc = min_weight_full_bipartite_matching(csc_cost)
    theirs = csc_cost[rr, cc].sum()
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)
    # dual feasibility + complementary slackness
    coo = csc_cost.tocoo()
    rc = coo.data - u[coo.row] - v[coo.col]
    assert (rc >= -1e-9).all()
    matched_rc = np.array([csc_cost[match[j], j] - u[match[j]] - v[j]
                           for j in range(n)])
    np.testing.assert_allclose(matched_rc, 0, atol=1e-9)


def cost_of(csc_cost, match):
    return sum(csc_cost[match[j], j] for j in range(len(match)))


# ---------------------------------------------------------------------------
# MC64 jobs
# ---------------------------------------------------------------------------

def test_mc64_doc_example_job5():
    """HSL MC64 documented 3x3 example (/root/reference/src/wbm.c:485-498):
    optimal product matching must select 8, 1, 4 -> permuted diag."""
    a = problems.mc64_doc_example()
    res = mc64(a, job=5)
    pa = res.apply(a)
    diag = np.abs(pa.diagonal())
    # max product over perfect matchings: |8 * 1 * 4| = 32
    np.testing.assert_allclose(np.prod(diag), 32.0)
    # scalings: unit diagonal, offdiag <= 1
    sa = res.apply(a, scale=True)
    np.testing.assert_allclose(np.abs(sa.diagonal()), 1.0, rtol=1e-12)
    assert np.abs(sa.toarray()).max() <= 1.0 + 1e-9


@pytest.mark.parametrize("job", [1, 2, 3, 4, 5])
def test_mc64_jobs_valid_permutations(job):
    a = _rand_sparse(60, seed=7)
    res = mc64(a, job=job)
    assert _is_perm(res.rperm) and _is_perm(res.cperm)
    pa = res.apply(a)
    assert hsp.count_zero_diagonals(pa) == 0


def test_mc64_job2_bottleneck_optimal():
    a = _rand_sparse(30, seed=9)
    res = mc64(a, job=2)
    pa = res.apply(a)
    bot = np.abs(pa.diagonal()).min()
    np.testing.assert_allclose(bot, res.info["bottleneck"], rtol=1e-12)
    # brute-force oracle on small matrix via linear_sum_assignment on -log
    from scipy.optimize import linear_sum_assignment
    dense = np.abs(a.toarray())
    # bottleneck via binary search on the dense matrix
    vals = np.unique(dense[dense > 0])
    best = 0.0
    for t in vals:
        m = sp.csr_matrix((dense >= t).astype(float))
        mt = sp.csgraph.maximum_bipartite_matching(m, perm_type="row")
        if (mt >= 0).all():
            best = t
    np.testing.assert_allclose(bot, best, rtol=1e-12)


def test_mc64_job5_improves_diagonal_weight():
    a = problems.illscaled_nonsym(80, 3, 3, seed=1)
    before = hsp.diagonal_weight_product(a)
    res = mc64(a, job=5)
    after = hsp.diagonal_weight_product(res.apply(a))
    assert after >= before


def test_mc64_job5_scaling_invariant_illscaled():
    a = problems.illscaled_nonsym(100, 4, 2, seed=3)
    res = mc64(a, job=5)
    sa = res.apply(a, scale=True)
    d = np.abs(sa.diagonal())
    np.testing.assert_allclose(d, 1.0, rtol=1e-9)
    assert np.abs(sa.toarray()).max() <= 1.0 + 1e-9


def test_mc64_structurally_singular_completion():
    # column 2 empty -> structurally singular; must still return a permutation
    a = sp.csr_matrix((np.array([1.0, 2.0, 3.0]),
                       (np.array([0, 1, 2]), np.array([0, 1, 0]))),
                      shape=(3, 3))
    res = mc64(a, job=5)
    assert _is_perm(res.rperm)
    assert res.info.get("structurally_singular")


# ---------------------------------------------------------------------------
# AWBM
# ---------------------------------------------------------------------------

def test_awbm_valid_and_improves_diagonal():
    a = problems.illscaled_nonsym(120, 3, 3, seed=5)
    res = awbm(a)
    assert _is_perm(res.rperm)
    before = hsp.diagonal_weight_product(a)
    after = hsp.diagonal_weight_product(res.apply(a))
    assert after > before
    phases = res.info["matched_per_phase"]
    assert phases == sorted(phases)  # monotone progress across phases


def test_awbm_scaling_bounds():
    a = _rand_sparse(50, seed=11)
    res = awbm(a)
    sa = res.apply(a, scale=True)
    # awbm scalings bound all magnitudes by 1 (tight only on optimal edges)
    assert np.abs(sa.toarray()).max() <= 1.0 + 1e-9


def test_awbm_near_optimal_on_doc_example():
    a = problems.mc64_doc_example()
    res = awbm(a)
    pa = res.apply(a)
    assert hsp.count_zero_diagonals(pa) == 0


# ---------------------------------------------------------------------------
# RCM / Fiedler / spectral partition
# ---------------------------------------------------------------------------

def test_rcm_reduces_bandwidth():
    a = problems.general_sparse(150, seed=2)
    rng = np.random.default_rng(0)
    p = rng.permutation(150)
    scrambled = hsp.permute(a, p, p)
    res = rcm(scrambled)
    assert _is_perm(res.rperm)
    assert hsp.compute_bandwidth(res.apply(scrambled)) < \
        hsp.compute_bandwidth(scrambled)


def test_rcm_fallback_matches_scipy_quality():
    a = problems.laplacian_2d(8, 8)
    from spike_petsc_tpu.ordering.rcm import rcm as rcm_fn
    bw_scipy = hsp.compute_bandwidth(rcm_fn(a, use_scipy=True).apply(a))
    bw_ours = hsp.compute_bandwidth(rcm_fn(a, use_scipy=False).apply(a))
    assert bw_ours <= 2 * max(bw_scipy, 8)


@pytest.mark.parametrize("method", ["dense", "lanczos", "lobpcg"])
def test_fiedler_reduces_bandwidth_on_scrambled_laplacian(method):
    a = problems.tridiag_laplacian(200)
    rng = np.random.default_rng(3)
    p = rng.permutation(200)
    scrambled = hsp.permute(a, p, p)
    res = fiedler(scrambled, method=method)
    assert _is_perm(res.rperm)
    # 1D path graph: perfect Fiedler ordering restores bandwidth 1
    assert res.info["bandwidth_out"] <= 2
    assert res.info["bandwidth_in"] > res.info["bandwidth_out"]


def test_fiedler_profile_reporting():
    a = problems.laplacian_2d(10, 10)
    res = fiedler(a)
    for key in ("profile_in", "profile_out", "bandwidth_in", "bandwidth_out",
                "lambda2"):
        assert key in res.info
    assert res.info["lambda2"] > 0


def test_spectral_partition_two_blocks():
    a = problems.laplacian_2d(12, 6)
    res = spectral_partition(a, levels=1, balanced=True)
    assert _is_perm(res.perm)
    assert len(res.sizes) == 2 and abs(res.sizes[0] - res.sizes[1]) <= 1
    assert res.info["edge_cut"] > 0


def test_spectral_partition_recursive():
    a = problems.laplacian_2d(16, 4)
    res = spectral_partition(a, levels=2)
    assert len(res.sizes) == 4
    assert sum(res.sizes) == a.shape[0]
    assert _is_perm(res.perm)


def test_registry_dispatch():
    a = problems.laplacian_2d(6, 6)
    for name in ("natural", "wbm", "awbm", "rcm", "fiedler", "spectral"):
        res = get_ordering(a, name, Options())
        assert _is_perm(res.rperm), name


def test_multilevel_fiedler_scrambled_path():
    """MC73-parity scheme: heavy-edge coarsening + coarsest exact solve +
    LOBPCG refinement must restore a 1D path's ordering."""
    n = 3000
    a = problems.tridiag_laplacian(n)
    rng = np.random.default_rng(7)
    p = rng.permutation(n)
    scrambled = hsp.permute(a, p, p)
    from spike_petsc_tpu.ordering.fiedler import fiedler
    res = fiedler(scrambled, method="multilevel")
    assert _is_perm(res.rperm)
    assert res.info["bandwidth_out"] <= 5
    assert res.info["bandwidth_in"] > 100


def test_multilevel_fiedler_device_refine():
    """The jittable LOBPCG refiner (refine='device', BCOO matvecs on the
    accelerator) must match the host refiner's ordering quality."""
    n = 1500
    a = problems.tridiag_laplacian(n)
    rng = np.random.default_rng(11)
    p = rng.permutation(n)
    scrambled = hsp.permute(a, p, p)
    from spike_petsc_tpu.ordering.fiedler import fiedler
    res = fiedler(scrambled, method="multilevel", refine="device")
    assert _is_perm(res.rperm)
    assert res.info["bandwidth_out"] <= 5


def test_multilevel_fiedler_large_coarsest_lanczos():
    """A large coarsest level (coarsening stalls on some weight patterns)
    must route to shift-invert Lanczos, not an O(n^3) dense eigh — and
    produce the same ordering quality.  (BENCH r5 dissect: a ~5k-node
    stalled coarsest level spent 19.6 s of a 30 s multilevel run in eigh.)"""
    from spike_petsc_tpu.ordering.fiedler import (_fiedler_multilevel,
                                                  graph_laplacian)
    n = 3000
    a = problems.tridiag_laplacian(n)
    rng = np.random.default_rng(13)
    p = rng.permutation(n)
    scrambled = hsp.permute(a, p, p)
    lap = graph_laplacian(scrambled)
    # coarsest=1200 forces the coarsest-level solve onto a >512-node graph
    vec, lam2 = _fiedler_multilevel(lap, tol=1e-8, seed=0, coarsest=1200)
    order = np.argsort(vec)
    where = np.empty(n, dtype=np.int64)
    where[order] = np.arange(n)
    coo = scrambled.tocoo()
    bw = int(np.max(np.abs(where[coo.row] - where[coo.col])))
    assert bw <= 5          # the 1D path ordering is fully restored
    assert lam2 >= 0


def test_heavy_edge_coarsen_shrinks():
    from spike_petsc_tpu.ordering.fiedler import heavy_edge_coarsen
    a = problems.laplacian_2d(20, 20)
    adj = -a.copy(); adj.setdiag(0); adj.eliminate_zeros()
    adj.data = np.abs(adj.data)
    coarse, parent = heavy_edge_coarsen(adj.tocsr())
    n, nc = adj.shape[0], coarse.shape[0]
    assert nc < n and nc >= n // 2
    assert parent.max() == nc - 1
    # coarse weights conserve fine edge weight across groups
    assert coarse.sum() <= adj.sum() + 1e-9


def test_multilevel_fiedler_2d_quality():
    a = problems.laplacian_2d(40, 40)
    rng = np.random.default_rng(9)
    p = rng.permutation(a.shape[0])
    scrambled = hsp.permute(a, p, p)
    from spike_petsc_tpu.ordering.fiedler import fiedler
    res_ml = fiedler(scrambled, method="multilevel")
    res_exact = fiedler(scrambled, method="lanczos")
    # multilevel within 2.5x of the exact spectral ordering's bandwidth
    assert res_ml.info["bandwidth_out"] <= 2.5 * res_exact.info["bandwidth_out"] + 10


def test_mc64_job3_matches_job2_bottleneck():
    """Jobs 2 and 3 are two algorithms for the same objective
    (/root/reference/src/hslmc64.c:1002 vs :1432): the bottleneck VALUES
    must agree on every instance (matchings may differ)."""
    import scipy.sparse as sp
    from spike_petsc_tpu.ordering.mc64 import mc64
    rng = np.random.default_rng(7)
    for trial in range(6):
        n = 40
        a = sp.random(n, n, density=0.15, random_state=rng,
                      data_rvs=lambda k: rng.uniform(0.1, 10.0, k))
        a = (a + sp.diags(rng.uniform(0.01, 1.0, n))).tocsr()
        r2 = mc64(a, job=2)
        r3 = mc64(a, job=3)
        assert r2.info["bottleneck"] == r3.info["bottleneck"], \
            f"trial {trial}: {r2.info} vs {r3.info}"
        # both must be valid perfect matchings on nonzero entries
        ad = a.toarray()
        for res in (r2, r3):
            perm = res.rperm
            assert sorted(perm) == list(range(n))
            dvals = np.abs(ad[perm, np.arange(n)])
            assert dvals.min() >= res.info["bottleneck"] - 1e-14


def test_mc64_job3_bottleneck_optimal_small():
    """Brute-force optimality check of the job-3 bottleneck value."""
    from itertools import permutations
    import scipy.sparse as sp
    from spike_petsc_tpu.ordering.mc64 import mc64
    rng = np.random.default_rng(3)
    n = 6
    for _ in range(5):
        d = rng.uniform(0.1, 1.0, (n, n)) * (rng.random((n, n)) < 0.6)
        np.fill_diagonal(d, rng.uniform(0.05, 1.0, n))
        a = sp.csr_matrix(d)
        best = 0.0
        for p in permutations(range(n)):
            vals = np.abs(d[list(p), range(n)])
            if (vals > 0).all():
                best = max(best, vals.min())
        r3 = mc64(a, job=3)
        np.testing.assert_allclose(r3.info["bottleneck"], best, rtol=1e-12)


def test_symmetric_expand_triangular_input():
    """mc34-style expansion: a lower-triangular-stored symmetric matrix
    matches as if fully stored (/root/reference/src/hslmc64.c:2680,
    petsc_mat_wbm.c:29)."""
    import scipy.sparse as sp
    from spike_petsc_tpu.ordering.matching import symmetric_expand
    from spike_petsc_tpu.ordering.mc64 import mc64
    rng = np.random.default_rng(11)
    n = 30
    full = problems.spd_banded(n, 3, seed=5)
    lower = sp.tril(full).tocsr()

    exp = symmetric_expand(lower)
    np.testing.assert_allclose(exp.toarray(), full.toarray())

    # matching the triangle as-stored vs symmetrized differs; symmetrized
    # must reproduce the full-pattern bottleneck value
    r_full = mc64(full, job=3)
    r_sym = mc64(lower, job=3, symmetrize=True)
    assert r_sym.info["bottleneck"] == r_full.info["bottleneck"]

    # job 5 through the registry option
    from spike_petsc_tpu.ordering import get_ordering
    from spike_petsc_tpu.utils.options import Options
    res = get_ordering(lower, "wbm",
                       Options({"mat_ordering_wbm_symmetrize": "1"}))
    assert sorted(res.rperm) == list(range(n))
