"""Blocktri-native assembly path: spike_factor_blocks (no band->blocktri
conversion), blocktri_to_band interop, and the device generator — the
native-workflow answer to the conversion-bound factor (VERDICT r2 item 5;
the step the reference performs as PCSetUp_Banded's LU,
/root/reference/src/matbanded.c:165-178)."""

import numpy as np
import jax.numpy as jnp

from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
from spike_petsc_tpu.ops.blocktri import (band_to_blocktri, blocktri_matvec,
                                          blocktri_to_band)
from spike_petsc_tpu.ops.spike import (spike_factor, spike_factor_blocks,
                                       spike_solve, spike_solve_many)


def test_blocktri_to_band_roundtrip():
    n, kl, ku = 96, 3, 5
    a = problems.nonsym_banded(n, kl, ku, seed=3)
    data, kl2, ku2 = hsp.csr_to_banded_arrays(a)
    band = BandedMatrix(data=jnp.asarray(data), kl=kl2, ku=ku2)
    T = band_to_blocktri(band, 8)
    back = blocktri_to_band(T, kl2, ku2)
    np.testing.assert_allclose(np.asarray(back.data)[:n],
                               np.asarray(band.data), rtol=0, atol=0)


def test_factor_blocks_matches_band_entry():
    """Factoring from global blocktri blocks must give bit-equal results to
    the band entry (same partition math, conversion skipped)."""
    n, k, K, b = 512, 4, 8, 8
    a = problems.spd_banded(n, k, seed=7)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    band = BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)
    sf_band = spike_factor(band, K=K, block_b=b, store_spikes=True)
    # build the GLOBAL padded blocktri exactly as the band entry does
    from spike_petsc_tpu.ops.band import pad_banded
    npad = sf_band.K * sf_band.m
    Tg = band_to_blocktri(pad_banded(band, npad), b)
    sf_blk = spike_factor_blocks(Tg, n=n, K=K, kl=kl, ku=ku,
                                 store_spikes=True)
    assert (sf_blk.K, sf_blk.m, sf_blk.b, sf_blk.k) == \
        (sf_band.K, sf_band.m, sf_band.b, sf_band.k)
    np.testing.assert_array_equal(np.asarray(sf_blk.fact.F),
                                  np.asarray(sf_band.fact.F))
    np.testing.assert_array_equal(np.asarray(sf_blk.Btip),
                                  np.asarray(sf_band.Btip))
    rng = np.random.default_rng(0)
    u = rng.standard_normal(n)
    rhs = jnp.asarray(a @ u)
    x = np.asarray(spike_solve(sf_blk, rhs))
    np.testing.assert_allclose(x, u, rtol=1e-8, atol=1e-9)
    np.testing.assert_array_equal(x, np.asarray(spike_solve(sf_band, rhs)))


def test_factor_blocks_options_surface():
    """The blocktri entry honors the full option set (truncated, bf16
    storage, multi-RHS solves)."""
    n, k, K, b = 640, 3, 8, 8
    a = problems.spd_banded(n, k, seed=11)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    band = BandedMatrix(data=jnp.asarray(data, jnp.float32), kl=kl, ku=ku)
    from spike_petsc_tpu.ops.band import pad_banded
    from spike_petsc_tpu.ops.spike import _partition_geometry
    _, _, m = _partition_geometry(n, K, kl, ku, b)
    Tg = band_to_blocktri(pad_banded(band, K * m), b)
    sf = spike_factor_blocks(Tg, n=n, K=K, kl=kl, ku=ku, store_spikes=True,
                             spike_dtype=jnp.bfloat16)
    assert sf.V.dtype == jnp.bfloat16
    rng = np.random.default_rng(1)
    U = rng.standard_normal((n, 3)).astype(np.float32)
    B = np.stack([np.asarray(a @ U[:, j], dtype=np.float32)
                  for j in range(3)], axis=1)
    X = np.asarray(spike_solve_many(sf, jnp.asarray(B)))
    assert np.linalg.norm(X - U) / np.linalg.norm(U) < 5e-3
    # store_lt on the native entry: the L blocks are RIGHT THERE at
    # assembly — the regular-form transpose needs no band at any point
    from spike_petsc_tpu.ops.blocktri import BlockTriFactor
    from spike_petsc_tpu.ops.spike import spike_transpose
    sf_lt = spike_factor_blocks(Tg, n=n, K=K, kl=kl, ku=ku, store_lt=True)
    sft = spike_transpose(sf_lt)
    assert isinstance(sft.fact, BlockTriFactor)
    g = rng.standard_normal(n).astype(np.float32)
    lam = np.asarray(spike_solve(sft, jnp.asarray(g)))
    err = np.linalg.norm(a.toarray().T @ lam - g) / np.linalg.norm(g)
    assert err < 1e-5, err


def test_device_generator_native_assembly():
    """blocktri_diagdom_device: masks respect the band structure, the
    derived band matches blocktri_matvec, and the factor solves it."""
    n, kl, ku, K, b = 1000, 3, 2, 8, 8
    T, npad = problems.blocktri_diagdom_device(n, kl, ku, K, b, seed=5)
    assert npad == T.nb * b and npad >= n
    # band interop: matvecs agree
    band = blocktri_to_band(T, kl, ku)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(npad)
    y_bt = np.asarray(blocktri_matvec(T, jnp.asarray(x).reshape(T.nb, b)))
    y_bd = np.asarray(banded_matvec(band, jnp.asarray(x)))
    np.testing.assert_allclose(y_bt.reshape(-1), y_bd, rtol=1e-12,
                               atol=1e-12)
    # padding rows are identity
    assert np.allclose(y_bt.reshape(-1)[n:], x[n:])
    # native factor + solve
    sf = spike_factor_blocks(T, n=n, K=K, kl=kl, ku=ku, store_spikes=True)
    u = rng.standard_normal(npad)
    u[n:] = 0.0
    rhs = blocktri_matvec(T, jnp.asarray(u).reshape(T.nb, b)).reshape(-1)
    x_s = np.asarray(spike_solve(sf, rhs[:n]))
    # generator default dtype is f32 — norm-based check at the f32 floor
    assert np.linalg.norm(x_s - u[:n]) / np.linalg.norm(u[:n]) < 1e-5
