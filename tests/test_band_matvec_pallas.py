"""Pallas banded matvec (ops/pallas/band_matvec.py) vs the XLA reference.

Runs in interpret mode on the CPU mesh; the kernel's TPU bandwidth story
is measured in experiments/lab_band_mv.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
from spike_petsc_tpu.ops.pallas.band_matvec import (
    banded_matvec_pallas, banded_matvec_prepared, banded_mv_feasible,
    prepare_banded_mv)


def _band(n, kl, ku, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    w = kl + ku + 1
    data = rng.standard_normal((n, w)).astype(dtype)
    i = np.arange(n)[:, None]
    col = i + np.arange(w)[None, :] - kl
    data = np.where((col >= 0) & (col < n), data, 0)
    return BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)


@pytest.mark.parametrize("n,kl,ku", [
    (1024, 6, 6),        # narrow symmetric
    (2000, 0, 3),        # upper-only
    (3000, 5, 0),        # lower-only
    (1500, 150, 80),     # asymmetric wide (w > 128: two lane phases)
    (999, 1, 1),         # tridiagonal, n not a tile multiple
    (4096, 100, 100),    # the bench band shape (scaled down)
])
def test_matches_xla_reference(n, kl, ku):
    bm = _band(n, kl, ku)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ref = np.asarray(banded_matvec(bm, x))
    got = np.asarray(banded_matvec_pallas(bm, x))
    np.testing.assert_allclose(got, ref, rtol=2e-5,
                               atol=2e-5 * np.max(np.abs(ref)))


def test_prepared_reuse_and_small_S_override():
    bm = _band(2048, 10, 10, seed=2)
    prep = prepare_banded_mv(bm, S=8)
    rng = np.random.default_rng(3)
    for _ in range(2):
        x = jnp.asarray(rng.standard_normal(bm.n).astype(np.float32))
        ref = np.asarray(banded_matvec(bm, x))
        got = np.asarray(banded_matvec_prepared(prep, x))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-4)


def test_bf16_storage_promotes_to_f32_accumulation():
    bm = _band(1024, 4, 4, seed=4)
    bm16 = BandedMatrix(data=bm.data.astype(jnp.bfloat16), kl=4, ku=4)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(1024),
                    jnp.float32)
    ref = np.asarray(banded_matvec(
        BandedMatrix(data=bm16.data.astype(jnp.float32), kl=4, ku=4), x))
    got = np.asarray(banded_matvec_prepared(prepare_banded_mv(bm16), x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_feasibility_gates():
    assert not banded_mv_feasible(_band(100, 2, 2))        # n too small
    assert banded_mv_feasible(_band(1024, 2, 2))
    assert not banded_mv_feasible(600, n=10_000, dtype=jnp.float32)  # too wide
    wide = _band(1024, 300, 300)
    assert not banded_mv_feasible(wide)
    # infeasible inputs fall back to the XLA form instead of raising
    x = jnp.ones((wide.n,), jnp.float32)
    np.testing.assert_allclose(np.asarray(banded_matvec_pallas(wide, x)),
                               np.asarray(banded_matvec(wide, x)),
                               rtol=1e-6)
    with pytest.raises(ValueError):
        prepare_banded_mv(wide)
