"""Cyclic-reduction block-tridiagonal solver vs block-Thomas oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.ops.band import BandedMatrix
from spike_petsc_tpu.ops.blocktri import (band_to_blocktri, blocktri_factor,
                                          blocktri_matvec, blocktri_solve)
from spike_petsc_tpu.ops.cyclic import cr_factor, cr_solve


def _blocktri_of(n, kl, ku, b, seed=0, dominance=1.5):
    a = problems.nonsym_banded(n, kl, ku, seed=seed, dominance=dominance)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    bm = BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)
    return band_to_blocktri(bm, b)


@pytest.mark.parametrize("nb_target,b", [(7, 4), (8, 4), (15, 8), (20, 4),
                                          (1, 4), (3, 8)])
def test_cr_matches_thomas(nb_target, b):
    n = nb_target * b
    t = _blocktri_of(n, 2, 2, b, seed=1)
    fac_cr = cr_factor(t)
    fac_th = blocktri_factor(t, method="lu")
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((t.nb, b)))
    x_cr = np.asarray(cr_solve(fac_cr, rhs))
    x_th = np.asarray(blocktri_solve(fac_th, rhs))
    np.testing.assert_allclose(x_cr, x_th, rtol=1e-9, atol=1e-10)


def test_cr_multi_rhs():
    b = 4
    t = _blocktri_of(40, 2, 2, b, seed=3)
    fac = cr_factor(t)
    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.standard_normal((t.nb, b, 3)))
    x = cr_solve(fac, rhs)
    y = blocktri_matvec(t, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(rhs), rtol=1e-9,
                               atol=1e-10)


def test_cr_batched_vmap():
    """CR under vmap over a partition batch (the SPIKE reduced-system use)."""
    b = 4
    ts = [_blocktri_of(28, 1, 1, b, seed=s) for s in (5, 6)]
    import jax.tree_util as jtu
    batched = jtu.tree_map(lambda *xs: jnp.stack(xs), *ts)
    facs = jax.vmap(cr_factor)(batched)
    rng = np.random.default_rng(2)
    rhs = jnp.asarray(rng.standard_normal((2, ts[0].nb, b)))
    xs = jax.vmap(cr_solve)(facs, rhs)
    for i, t in enumerate(ts):
        ref = blocktri_solve(blocktri_factor(t, method="lu"), rhs[i])
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(ref),
                                   rtol=1e-9, atol=1e-10)


def test_cr_jittable():
    b = 8
    t = _blocktri_of(64, 3, 3, b, seed=7)
    fac = jax.jit(cr_factor)(t)
    rhs = jnp.asarray(np.random.default_rng(3).standard_normal((t.nb, b)))
    x = jax.jit(cr_solve)(fac, rhs)
    ref = blocktri_solve(blocktri_factor(t, method="lu"), rhs)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-9,
                               atol=1e-10)


def test_spike_method_cr_matches_scipy():
    """Full SPIKE with cyclic-reduction partition factorizations."""
    import scipy.linalg as sla
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve
    n, k = 400, 3
    a = problems.nonsym_banded(n, k, k, seed=9)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    bm = BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)
    sf = spike_factor(bm, K=4, block_b=8, method="cr")
    rng = np.random.default_rng(2)
    rhs = rng.standard_normal(n)
    x = np.asarray(spike_solve(sf, jnp.asarray(rhs)))
    ab = np.zeros((2 * k + 1, n))
    dense = a.toarray()
    for d in range(-k, k + 1):
        ab[k - d, max(0, d):n + min(0, d)] = np.diag(dense, d)
    xs = sla.solve_banded((k, k), ab, rhs)
    np.testing.assert_allclose(x, xs, rtol=1e-8, atol=1e-9)


def test_spike_method_cr_multi_rhs():
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve_many
    n = 300
    a = problems.spd_banded(n, 4, seed=11)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    bm = BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)
    sf = spike_factor(bm, K=4, block_b=8, method="cr")
    rng = np.random.default_rng(3)
    U = rng.standard_normal((n, 3))
    X = np.asarray(spike_solve_many(sf, jnp.asarray(a @ U)))
    np.testing.assert_allclose(X, U, rtol=1e-8, atol=1e-9)


def test_spike_cr_bf16_factors():
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve
    from spike_petsc_tpu.ops.band import banded_matvec
    n = 400
    a = problems.spd_banded(n, 3, seed=15)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    bm = BandedMatrix(data=jnp.asarray(data, jnp.float32), kl=kl, ku=ku)
    sf = spike_factor(bm, K=4, block_b=8, method="cr",
                      store_dtype=jnp.bfloat16)
    u = np.random.default_rng(4).standard_normal(n).astype(np.float32)
    x = np.asarray(spike_solve(sf, banded_matvec(bm, jnp.asarray(u))))
    rel = np.linalg.norm(x - u) / np.linalg.norm(u)
    assert rel < 5e-2
