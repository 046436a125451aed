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


class _Ref:
    """Minimal Ref stand-in: drives the kernel function eagerly, outside
    pallas_call.  Necessary for precision assertions — XLA:CPU codegen
    reassociates floating point inside large compiled clusters and erases
    the kernel's error-free transforms shape-dependently (the eager jaxpr
    is exact; Mosaic on real TPU compiles kernels directly and is
    unaffected — validated by experiments/lab_band_mv.py on hardware)."""

    def __init__(self, v):
        self.v = v

    def __getitem__(self, idx):
        return self.v[idx]

    def __setitem__(self, idx, val):
        self.v = val


def _run_df64_eager(prep, x):
    from spike_petsc_tpu.ops.pallas.band_matvec import _kernel_df64
    w, S, n = prep.w, prep.S, prep.n
    qmax = (w - 1) // 128
    Sg = prep.d3hi.shape[1]
    NBg = Sg // S
    xp = jnp.pad(jnp.asarray(x, jnp.float64),
                 (prep.kl, (NBg + 1) * S * 128 - prep.kl - n))
    xph = xp.astype(jnp.float32)
    xpl = (xp - xph.astype(xp.dtype)).astype(jnp.float32)
    xph = xph.reshape(-1, 128)
    xpl = xpl.reshape(-1, 128)
    ys = []
    for i in range(NBg):
        oh, ol = _Ref(None), _Ref(None)
        _kernel_df64(_Ref(prep.d3hi[:, i * S:(i + 1) * S]),
                     _Ref(prep.d3lo[:, i * S:(i + 1) * S]),
                     _Ref(xph[i * S:(i + 1) * S]),
                     _Ref(xpl[i * S:(i + 1) * S]),
                     _Ref(xph[(i + 1) * S:(i + 2) * S]),
                     _Ref(xpl[(i + 1) * S:(i + 2) * S]),
                     oh, ol, w=w, S=S, qmax=qmax)
        ys.append(oh.v.astype(jnp.float64) + ol.v.astype(jnp.float64))
    return jnp.concatenate(ys, axis=0).reshape(-1)[:n]


@pytest.mark.parametrize("n,kl,ku", [
    (2048, 6, 6),
    (1024, 63, 63),
    (4096, 100, 100),    # the bench shape: two lane phases, two grid steps
    (1500, 150, 80),
    (1024, 255, 255),    # four lane phases
])
def test_df64_matvec_matches_true_f64(n, kl, ku):
    """Emulated-f64 (double-f32) banded matvec: ~1e-13 relative agreement
    with the native-f64 reference — the residual-matvec engine of the
    on-TPU high-accuracy refinement path.  Precision asserted on the eager
    kernel jaxpr; the compiled interpret path is checked for value-level
    plumbing only (see _Ref for why)."""
    from spike_petsc_tpu.ops.pallas.band_matvec import (
        banded_matvec_prepared_f64, prepare_banded_mv_f64)
    bm32 = _band(n, kl, ku, seed=9)
    bm = BandedMatrix(data=bm32.data.astype(jnp.float64) * (1 + 1e-9),
                      kl=kl, ku=ku)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal(n), jnp.float64)
    ref = np.asarray(banded_matvec(bm, x))
    scale = np.max(np.abs(ref))
    prep = prepare_banded_mv_f64(bm)
    rel = np.max(np.abs(np.asarray(_run_df64_eager(prep, x)) - ref)) / scale
    assert rel < 3e-13, rel
    # it genuinely beats plain f32 (the compensation is live)
    got32 = np.asarray(banded_matvec(
        BandedMatrix(data=bm.data.astype(jnp.float32), kl=kl, ku=ku),
        x.astype(jnp.float32))).astype(np.float64)
    rel32 = np.max(np.abs(got32 - ref)) / scale
    assert rel < 1e-4 * rel32, (rel, rel32)
    # compiled interpret path: correct values (indexing/plumbing), at
    # whatever precision XLA:CPU happens to preserve
    got = np.asarray(banded_matvec_prepared_f64(prep, x))
    assert np.max(np.abs(got - ref)) / scale < 1e-5


def test_df64_infeasible_raises():
    from spike_petsc_tpu.ops.pallas.band_matvec import prepare_banded_mv_f64
    bm = BandedMatrix(data=jnp.zeros((2048, 601), jnp.float64), kl=300,
                      ku=300)
    with pytest.raises(ValueError):
        prepare_banded_mv_f64(bm)
