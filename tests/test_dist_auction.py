import numpy as np
import scipy.sparse as sp

def test_dist_auction_matches_exact():
    from spike_petsc_tpu.parallel.matching_dev import auction_match_dist, auction_match
    from spike_petsc_tpu.parallel import make_mesh
    from spike_petsc_tpu.ordering import mc64
    from spike_petsc_tpu.models import problems
    from spike_petsc_tpu import sparse as hsp
    mesh = make_mesh(8, axis="p")
    a = problems.illscaled_nonsym(96, 3, 3, seed=2)
    res = auction_match_dist(a, mesh, eps=1e-6/96)
    assert np.array_equal(np.sort(res.rperm), np.arange(96))
    lp_d = np.sum(np.log(np.abs(res.apply(a).diagonal())))
    lp_e = np.sum(np.log(np.abs(mc64(a, job=5).apply(a).diagonal())))
    assert lp_d >= lp_e - 1e-3, (lp_d, lp_e)
    sa = res.apply(a, scale=True)
    np.testing.assert_allclose(np.abs(sa.diagonal()), 1.0, rtol=1e-3)
    assert np.abs(sa.toarray()).max() <= 1.0 + 1e-3
    print("dist auction OK:", res.info)
