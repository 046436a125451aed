"""Manual-DMA blocktri matvec kernels (ops/pallas/matvec.py) vs the XLA
blocktri_matvec oracle — run in Pallas interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spike_petsc_tpu.ops.blocktri import BlockTridiagonal, blocktri_matvec
from spike_petsc_tpu.ops.pallas.matvec import (blocktri_matvec_dma,
                                               blocktri_matvec_dma_chunked,
                                               blocktri_matvec_pallas,
                                               mv_padded_nb)


def _rand_T(nb, b, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    D = jnp.asarray(rng.standard_normal((nb, b, b)), dtype)
    L = jnp.asarray(rng.standard_normal((nb, b, b)), dtype).at[0].set(0)
    U = jnp.asarray(rng.standard_normal((nb, b, b)), dtype).at[nb - 1].set(0)
    return BlockTridiagonal(D=D, L=L, U=U)


@pytest.mark.parametrize("nb,b", [(5, 8), (130, 8), (64, 16)])
def test_dma_matvec_matches_xla(nb, b):
    T = _rand_T(nb, b, seed=nb)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((nb, b)),
                    jnp.float32)
    y0 = np.asarray(blocktri_matvec(T, x))
    for f in (blocktri_matvec_pallas, blocktri_matvec_dma):
        np.testing.assert_allclose(np.asarray(f(T, x)), y0, rtol=2e-5,
                                   atol=2e-5)


def test_dma_matvec_prepadded_fast_path():
    """Pre-padding to mv_padded_nb must be a no-op for the result."""
    nb, b = 40, 8
    T = _rand_T(nb, b, seed=3)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((nb, b)),
                    jnp.float32)
    nbp = mv_padded_nb(nb, b)
    pad = lambda a: jnp.pad(a, ((0, nbp - nb), (0, 0), (0, 0)))
    Tp = BlockTridiagonal(D=pad(T.D), L=pad(T.L), U=pad(T.U))
    xp = jnp.pad(x, ((0, nbp - nb), (0, 0)))
    y = np.asarray(blocktri_matvec_dma(Tp, xp))[:nb]
    np.testing.assert_allclose(y, np.asarray(blocktri_matvec(T, x)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("Kc,nbk,b", [(4, 7, 8), (8, 16, 8)])
def test_dma_matvec_chunked(Kc, nbk, b):
    """Chunked entry ([Kc, nbk, b, b], the dist layout) must equal the flat
    global matvec — chunk boundaries carry coupling through L/U."""
    nb = Kc * nbk
    T = _rand_T(nb, b, seed=Kc)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((nb, b)),
                    jnp.float32)
    Tc = BlockTridiagonal(D=T.D.reshape(Kc, nbk, b, b),
                          L=T.L.reshape(Kc, nbk, b, b),
                          U=T.U.reshape(Kc, nbk, b, b))
    y = np.asarray(blocktri_matvec_dma_chunked(Tc, x.reshape(Kc, nbk, b)))
    np.testing.assert_allclose(y.reshape(nb, b),
                               np.asarray(blocktri_matvec(T, x)),
                               rtol=2e-5, atol=2e-5)


def test_dma_matvec_bf16_blocks():
    """bf16-stored blocks promote in-register; carry follows x (f32)."""
    nb, b = 16, 8
    T32 = _rand_T(nb, b, seed=9)
    T16 = BlockTridiagonal(D=T32.D.astype(jnp.bfloat16),
                           L=T32.L.astype(jnp.bfloat16),
                           U=T32.U.astype(jnp.bfloat16))
    x = jnp.asarray(np.random.default_rng(5).standard_normal((nb, b)),
                    jnp.float32)
    y = blocktri_matvec_dma(T16, x)
    assert y.dtype == jnp.float32
    ref = np.asarray(blocktri_matvec(
        BlockTridiagonal(D=T16.D.astype(jnp.float32),
                         L=T16.L.astype(jnp.float32),
                         U=T16.U.astype(jnp.float32)), x))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_mv_geometry_terminates_and_falls_back_for_large_blocks():
    """code-review r3: b >= ~352 f32 (or ~256 f64) made _pick_mv_geometry
    loop forever (kt never reached 1, and matrix buffers don't shrink with
    Kc).  Infeasible blocks must yield None and the public entry points
    must fall back to the XLA matvec instead of hanging."""
    import numpy as np
    import jax.numpy as jnp
    from spike_petsc_tpu.ops.blocktri import BlockTridiagonal, blocktri_matvec
    from spike_petsc_tpu.ops.pallas.matvec import (_pick_mv_geometry,
                                                   blocktri_matvec_dma,
                                                   mv_padded_nb)

    # the verified non-terminating configs are now FEASIBLE at kt=1 (the
    # old loop stopped halving kt at 2 and doubled Kc forever)
    for nb_, b_, item in [(1000, 384, 4), (1000, 256, 8)]:
        geom = _pick_mv_geometry(nb_, b_, item, 4)
        assert geom is not None and geom[1] == 1, (nb_, b_, geom)
    # feasible config still returns a power-of-two-compatible geometry
    geom = _pick_mv_geometry(1000, 128, 4, 4)
    assert geom is not None and geom[0] % geom[1] == 0
    # blocks whose kt=1 buffers alone exceed any VMEM budget: None
    assert _pick_mv_geometry(1000, 768, 4, 4) is None
    # padded-count query degrades to "no padding" for the XLA path
    assert mv_padded_nb(1000, 768, 4) == 1000

    rng = np.random.default_rng(0)
    nb, b = 6, 768
    T = BlockTridiagonal(
        D=jnp.asarray(rng.standard_normal((nb, b, b)), jnp.float32),
        L=jnp.asarray(rng.standard_normal((nb, b, b)), jnp.float32),
        U=jnp.asarray(rng.standard_normal((nb, b, b)), jnp.float32))
    x = jnp.asarray(rng.standard_normal((nb, b)), jnp.float32)
    y = blocktri_matvec_dma(T, x)          # must not hang: XLA fallback
    np.testing.assert_allclose(np.asarray(y), np.asarray(blocktri_matvec(T, x)),
                               rtol=1e-5, atol=1e-5)
