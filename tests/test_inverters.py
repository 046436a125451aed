"""Batched-inverse engines (blocktri.batched_inverse / newton_inv) and the
fused manual-DMA Pallas sweep kernel (ops/pallas/fused_sweep.py).

The Newton–Schulz inverter is the TPU factor hot path (measured 10.7x faster
than the blocked-Schur recursion at [8128,128,128] f32 on v5e); these tests
pin its convergence contract on CPU in f64.  The fused kernel runs in Pallas
interpret mode here and is cross-checked against blocktri_solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spike_petsc_tpu.ops.blocktri import (
    BlockTridiagonal, batched_inverse, blocktri_factor, blocktri_solve,
    newton_inv)
from spike_petsc_tpu.ops.pallas.fused_sweep import blocktri_solve_fused_pallas


def _dd_blocks(key, nb, b, dtype=jnp.float64, margin=0.5):
    S = jax.random.uniform(key, (nb, b, b), dtype, minval=-1.0, maxval=1.0)
    rs = jnp.sum(jnp.abs(S), axis=-1)
    return S.at[:, jnp.arange(b), jnp.arange(b)].set(rs + margin)


def test_newton_jacobi_dd_converges():
    S = _dd_blocks(jax.random.PRNGKey(0), 5, 16)
    X = newton_inv(S, max_steps=30)
    err = float(jnp.max(jnp.abs(S @ X - jnp.eye(16))))
    assert err < 1e-12


def test_newton_fixed_schedule_matches_adaptive():
    """Fixed cheap+polish schedule (no while_loop on the scan critical
    path) reaches the same accuracy as the adaptive iteration on the
    diagonally-dominant operating regime; gradients flow via the shared
    implicit JVP."""
    from spike_petsc_tpu.ops.blocktri import newton_inv_fixed

    S = _dd_blocks(jax.random.PRNGKey(4), 6, 16)
    X = newton_inv_fixed(S)
    err = float(jnp.max(jnp.abs(S @ X - jnp.eye(16))))
    assert err < 1e-12
    # implicit-JVP: d(S^-1) = -X dS X
    dS = jax.random.normal(jax.random.PRNGKey(5), S.shape, S.dtype) * 1e-3
    _, dX = jax.jvp(newton_inv_fixed, (S,), (dS,))
    expected = -(X @ dS @ X)
    np.testing.assert_allclose(np.asarray(dX), np.asarray(expected),
                               rtol=1e-8, atol=1e-12)
    # dispatch by name
    X2 = batched_inverse(S, inverter="newton_fixed")
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X), rtol=1e-12)


def test_newton_pan_general():
    S = jax.random.normal(jax.random.PRNGKey(1), (4, 12, 12), jnp.float64)
    X = newton_inv(S, init="pan", max_steps=80)
    err = float(jnp.max(jnp.abs(S @ X - jnp.eye(12))))
    assert err < 1e-10


def test_newton_complex():
    key = jax.random.PRNGKey(2)
    S = _dd_blocks(key, 3, 8).astype(jnp.complex128)
    S = S + 0.1j * jax.random.normal(jax.random.fold_in(key, 1), (3, 8, 8))
    X = newton_inv(S, max_steps=30)
    err = float(jnp.max(jnp.abs(S @ X - jnp.eye(8))))
    assert err < 1e-12


def test_newton_singular_exits_finite_time():
    # all-zero blocks: the divergence guard must exit, not hang; output is
    # garbage by contract (factor_health is the detection layer)
    X = newton_inv(jnp.zeros((2, 8, 8)), max_steps=30)
    assert X.shape == (2, 8, 8)


def test_batched_inverse_engines_agree():
    S = _dd_blocks(jax.random.PRNGKey(3), 4, 32)
    Xl = batched_inverse(S, "lapack")
    Xb = batched_inverse(S, "blocked")
    Xn = batched_inverse(S, "newton")
    np.testing.assert_allclose(np.asarray(Xb), np.asarray(Xl), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Xn), np.asarray(Xl), atol=1e-10)


def _factored(key, K, nb, b, dtype):
    def mk(k):
        D = (jax.random.uniform(k, (nb, b, b), dtype)
             + jnp.eye(b, dtype=dtype) * (2.0 * b))
        L = jax.random.uniform(jax.random.fold_in(k, 1), (nb, b, b),
                               dtype).at[0].set(0)
        U = jax.random.uniform(jax.random.fold_in(k, 2), (nb, b, b),
                               dtype).at[nb - 1].set(0)
        return BlockTridiagonal(D=D, L=L, U=U)
    ts = [mk(jax.random.fold_in(key, i)) for i in range(K)]
    T = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *ts)
    return jax.vmap(lambda t: blocktri_factor(t, method="inv"))(T)


@pytest.mark.parametrize("mode", ["mxu", "vpu"])
def test_fused_sweep_matches_scan(mode):
    key = jax.random.PRNGKey(0)
    K, nb, b = 4, 7, 8
    fact = _factored(key, K, nb, b, jnp.float64)
    rhs = jax.random.uniform(jax.random.fold_in(key, 9), (K, nb, b),
                             jnp.float64)
    x_ref = jax.vmap(blocktri_solve)(fact, rhs)
    x = blocktri_solve_fused_pallas(fact, rhs, mode=mode)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-10)


def test_fused_sweep_single_block():
    key = jax.random.PRNGKey(4)
    fact = _factored(key, 2, 1, 8, jnp.float64)
    rhs = jax.random.uniform(jax.random.fold_in(key, 9), (2, 1, 8),
                             jnp.float64)
    x_ref = jax.vmap(blocktri_solve)(fact, rhs)
    x = blocktri_solve_fused_pallas(fact, rhs)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-10)


def test_fused_sweep_nb_smaller_than_nbuf():
    key = jax.random.PRNGKey(5)
    fact = _factored(key, 2, 3, 8, jnp.float64)
    rhs = jax.random.uniform(jax.random.fold_in(key, 9), (2, 3, 8),
                             jnp.float64)
    x_ref = jax.vmap(blocktri_solve)(fact, rhs)
    x = blocktri_solve_fused_pallas(fact, rhs, nbuf=6)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-10)


def test_fused_sweep_rejects_lu_factors():
    key = jax.random.PRNGKey(6)
    K, nb, b = 2, 3, 8

    def mk(k):
        D = (jax.random.uniform(k, (nb, b, b), jnp.float64)
             + jnp.eye(b) * (2.0 * b))
        return BlockTridiagonal(D=D, L=jnp.zeros((nb, b, b)),
                                U=jnp.zeros((nb, b, b)))
    T = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x),
        *[mk(jax.random.fold_in(key, i)) for i in range(K)])
    fact = jax.vmap(lambda t: blocktri_factor(t, method="lu"))(T)
    with pytest.raises(ValueError, match="inv"):
        blocktri_solve_fused_pallas(fact, jnp.zeros((K, nb, b)))


def test_spike_factor_inverter_newton_end_to_end():
    from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve

    n, hw = 600, 5
    key = jax.random.PRNGKey(7)
    w = 2 * hw + 1
    data = jax.random.uniform(key, (n, w), jnp.float64, minval=-1, maxval=1)
    data = data.at[:, hw].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    band = BandedMatrix(data=data, kl=hw, ku=hw)
    x_true = jnp.ones((n,), jnp.float64)
    rhs = banded_matvec(band, x_true)
    for method in ("inv", "cr"):
        sf = spike_factor(band, K=4, block_b=8, method=method,
                          inverter="newton")
        x = spike_solve(sf, rhs)
        assert float(jnp.max(jnp.abs(x - x_true))) < 1e-9, method


def test_fused_many_matches_xla():
    from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve_many

    n, hw = 600, 5
    key = jax.random.PRNGKey(11)
    w = 2 * hw + 1
    data = jax.random.uniform(key, (n, w), jnp.float64, minval=-1, maxval=1)
    data = data.at[:, hw].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    band = BandedMatrix(data=data, kl=hw, ku=hw)
    X = jax.random.uniform(jax.random.fold_in(key, 1), (n, 4), jnp.float64)
    B = jax.vmap(lambda x: banded_matvec(band, x), in_axes=1, out_axes=1)(X)
    sf = spike_factor(band, K=4, block_b=8)
    x_xla = spike_solve_many(sf, B, impl="xla")
    x_pal = spike_solve_many(sf, B, impl="pallas_fused")
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_xla),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(X), atol=1e-9)


def test_fused_many_rhs_chunking(monkeypatch):
    """Large r no longer falls back to kt=1 / VMEM overflow: the RHS dim is
    chunked, each chunk re-streaming the factors (ROADMAP r3 item 3).
    Forced here by shrinking the VMEM budget so r=6 needs 3 chunks."""
    from spike_petsc_tpu.ops.pallas import fused_sweep
    from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve_many

    n, hw = 600, 5
    key = jax.random.PRNGKey(13)
    w = 2 * hw + 1
    data = jax.random.uniform(key, (n, w), jnp.float64, minval=-1, maxval=1)
    data = data.at[:, hw].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    band = BandedMatrix(data=data, kl=hw, ku=hw)
    X = jax.random.uniform(jax.random.fold_in(key, 2), (n, 6), jnp.float64)
    B = jax.vmap(lambda x: banded_matvec(band, x), in_axes=1, out_axes=1)(X)
    sf = spike_factor(band, K=4, block_b=8)
    nb, b = sf.nb, sf.b
    kt_full, rc_full = fused_sweep._pick_kt_many(4, nb, b, 6, 8, 4, 8)
    assert rc_full == 6
    # budget that fits 2 RHS columns but not 6 at kt=1
    need2 = (1 * nb * 2 * b * 8) * 5 + 3 * 4 * 1 * b * b * 8
    monkeypatch.setattr(fused_sweep, "_VMEM_BUDGET", need2)
    kt, rc = fused_sweep._pick_kt_many(4, nb, b, 6, 8, 4, 8)
    assert rc < 6
    x_pal = spike_solve_many(sf, B, impl="pallas_fused")
    x_xla = spike_solve_many(sf, B, impl="xla")
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_xla),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(X), atol=1e-9)


def test_pallas_impl_rejects_cr_factors():
    from spike_petsc_tpu.ops.band import BandedMatrix
    from spike_petsc_tpu.ops.spike import (spike_factor, spike_solve,
                                           spike_solve_many)

    n, hw = 256, 3
    key = jax.random.PRNGKey(12)
    w = 2 * hw + 1
    data = jax.random.uniform(key, (n, w), jnp.float64, minval=-1, maxval=1)
    data = data.at[:, hw].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    sf = spike_factor(BandedMatrix(data=data, kl=hw, ku=hw), K=4,
                      block_b=8, method="cr")
    with pytest.raises(ValueError, match="method='inv'"):
        spike_solve(sf, jnp.ones((n,)), impl="pallas_fused")
    with pytest.raises(ValueError, match="method='inv'"):
        spike_solve_many(sf, jnp.ones((n, 2)), impl="pallas_fused")


def test_auto_impl_falls_back_when_vmem_infeasible(monkeypatch):
    """Small-K/large-nb factors must auto-route to the XLA scan instead of
    overflowing the fused kernel's VMEM scratch (code-review r2)."""
    from spike_petsc_tpu.ops import spike as spk
    from spike_petsc_tpu.ops.pallas import fused_sweep
    from spike_petsc_tpu.ops.band import BandedMatrix
    from spike_petsc_tpu.models import problems
    from spike_petsc_tpu import sparse as hsp

    a = problems.spd_banded(512, 3, seed=2)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    bm = BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)
    sf = spk.spike_factor(bm, K=4, block_b=128)
    assert fused_sweep.fused_sweep_feasible(sf.fact, sf.b)
    monkeypatch.setattr(fused_sweep, "_VMEM_BUDGET", 1024)
    assert not fused_sweep.fused_sweep_feasible(sf.fact, sf.b)
    monkeypatch.setattr(spk.jax, "default_backend", lambda: "tpu")
    assert spk._resolve_impl(sf, "auto") == "xla"
    with pytest.raises(ValueError, match="infeasible"):
        fused_sweep._pick_kt(4, sf.nb, sf.b, 8, 4, 8)
    with pytest.raises(ValueError, match="infeasible"):
        fused_sweep._pick_kt_many(4, sf.nb, sf.b, 2, 8, 4, 8)


def test_newton_probe_covers_fixed_engine():
    """The PC safety-net probe must fire for every newton-family engine —
    especially 'newton_fixed', which has no internal convergence check."""
    from spike_petsc_tpu.solvers.pc import _newton_probe_active
    assert _newton_probe_active("newton")
    assert _newton_probe_active("newton_fixed")
    assert _newton_probe_active("newton_pan")
    assert not _newton_probe_active("blocked")
    assert not _newton_probe_active("lapack")
