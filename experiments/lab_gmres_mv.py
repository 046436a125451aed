"""Measure the GMRES end-to-end wall with the Pallas blocktri matvec vs the
shifted-axpy banded matvec at the bench config (VERDICT r2 item 3: the
84.6 ms GMRES wall is matvec-bound; target <= 35 ms).

Also times the native-assembly factor entry (spike_factor_blocks on
blocktri_diagdom_device) vs the band entry (item 5: target <= 80 ms).
"""
import os
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from spike_petsc_tpu.models.problems import blocktri_diagdom_device
    from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
    from spike_petsc_tpu.ops.blocktri import BlockTridiagonal, band_to_blocktri
    from spike_petsc_tpu.ops.pallas.matvec import blocktri_matvec_pallas
    from spike_petsc_tpu.ops.spike import (spike_factor, spike_factor_blocks,
                                           spike_solve)
    from spike_petsc_tpu.solvers.krylov import gmres

    n = int(os.environ.get("N", 1_000_000))
    k = 100
    K = 64
    w = 2 * k + 1
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), dtype, minval=-1.0, maxval=1.0)
    data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    band = BandedMatrix(data=data, kl=k, ku=k)
    rhs = banded_matvec(band, jnp.ones((n,), dtype))
    _ = np.asarray(rhs[:8])

    @jax.jit
    def _digest(x):
        return x.ravel()[:1024] * 1.0

    def sync(tree):
        leaf = next(l for l in jax.tree_util.tree_leaves(tree)
                    if hasattr(l, "ravel") and getattr(l, "size", 0))
        return np.asarray(_digest(leaf))

    def timed(fn, rep=3):
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter()
            sync(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    @partial(jax.jit, static_argnames=("K", "kl", "ku"))
    def factor_fn(d, K, kl, ku):
        return spike_factor(BandedMatrix(data=d, kl=kl, ku=ku), K=K,
                            block_b=128, method="inv", store_spikes=True,
                            spike_dtype=jnp.bfloat16)

    timed(lambda: factor_fn(data, K, k, k), rep=1)
    sf = factor_fn(data, K, k, k)
    sync(sf)
    t_factor_band = timed(lambda: factor_fn(data, K, k, k))

    # --- GMRES with banded matvec (round-2 bench form) ---
    @jax.jit
    def gmres_band(band_data, sf_in, b_in):
        bnd = BandedMatrix(data=band_data, kl=k, ku=k)
        r = gmres(lambda v: banded_matvec(bnd, v), b_in, None,
                  lambda v: spike_solve(sf_in, v), rtol=1e-8, maxit=30,
                  restart=30)
        return r.its, r.rnorm

    timed(lambda: gmres_band(data, sf, rhs), rep=1)
    t_g_band = timed(lambda: gmres_band(data, sf, rhs))

    # --- GMRES with Pallas blocktri matvec (conversion outside jit) ---
    conv = jax.jit(lambda d: band_to_blocktri(
        BandedMatrix(data=d, kl=k, ku=k), 128))
    T = conv(data)
    sync(T)
    t_conv = timed(lambda: conv(data))
    nb, bb = T.nb, T.b

    @jax.jit
    def gmres_pallas(TD, TL, TU, sf_in, b_in):
        Tm = BlockTridiagonal(D=TD, L=TL, U=TU)

        def mv(v):
            xb = jnp.pad(v, (0, nb * bb - n)).reshape(nb, bb)
            return blocktri_matvec_pallas(Tm, xb).reshape(-1)[:n]
        r = gmres(mv, b_in, None, lambda v: spike_solve(sf_in, v),
                  rtol=1e-8, maxit=30, restart=30)
        return r.its, r.rnorm

    timed(lambda: gmres_pallas(T.D, T.L, T.U, sf, rhs), rep=1)
    t_g_pallas = timed(lambda: gmres_pallas(T.D, T.L, T.U, sf, rhs))
    its, rn = gmres_pallas(T.D, T.L, T.U, sf, rhs)
    its = int(np.asarray(its))
    rel = float(np.asarray(rn)) / float(np.asarray(jnp.linalg.norm(rhs)))

    # --- raw matvec timing (chained) ---
    @partial(jax.jit, static_argnames=("r",))
    def mv_loop_band(d, x, r):
        bnd = BandedMatrix(data=d, kl=k, ku=k)
        return jax.lax.fori_loop(0, r, lambda i, y: banded_matvec(bnd, y), x)

    @partial(jax.jit, static_argnames=("r",))
    def mv_loop_pallas(TD, TL, TU, x, r):
        Tm = BlockTridiagonal(D=TD, L=TL, U=TU)
        return jax.lax.fori_loop(
            0, r, lambda i, y: blocktri_matvec_pallas(Tm, y), x)

    xb0 = jnp.ones((nb, bb), dtype)
    for loop, args in (("band", (data, rhs)), ("pallas", (T.D, T.L, T.U, xb0))):
        pass
    timed(lambda: mv_loop_band(data, rhs, 2), rep=1)
    timed(lambda: mv_loop_band(data, rhs, 22), rep=1)
    tb = (timed(lambda: mv_loop_band(data, rhs, 22), rep=5)
          - timed(lambda: mv_loop_band(data, rhs, 2), rep=5)) / 20
    timed(lambda: mv_loop_pallas(T.D, T.L, T.U, xb0, 2), rep=1)
    timed(lambda: mv_loop_pallas(T.D, T.L, T.U, xb0, 22), rep=1)
    tp = (timed(lambda: mv_loop_pallas(T.D, T.L, T.U, xb0, 22), rep=5)
          - timed(lambda: mv_loop_pallas(T.D, T.L, T.U, xb0, 2), rep=5)) / 20
    bytes_T = 3 * nb * bb * bb * 4

    # --- native-assembly factor ---
    Tn, npad = blocktri_diagdom_device(n, k, k, K, 128, seed=0)
    sync(Tn)

    @partial(jax.jit, static_argnames=("K",))
    def factor_blocks_fn(TD, TL, TU, K):
        Tm = BlockTridiagonal(D=TD, L=TL, U=TU)
        return spike_factor_blocks(Tm, n=n, K=K, kl=k, ku=k, method="inv",
                                   store_spikes=True,
                                   spike_dtype=jnp.bfloat16)

    timed(lambda: factor_blocks_fn(Tn.D, Tn.L, Tn.U, K), rep=1)
    t_factor_native = timed(lambda: factor_blocks_fn(Tn.D, Tn.L, Tn.U, K))

    print(f"factor band entry:    {t_factor_band*1e3:8.2f} ms")
    print(f"factor native entry:  {t_factor_native*1e3:8.2f} ms")
    print(f"band->blocktri conv:  {t_conv*1e3:8.2f} ms")
    print(f"matvec band (axpy):   {tb*1e3:8.3f} ms")
    print(f"matvec pallas:        {tp*1e3:8.3f} ms "
          f"({bytes_T/tp/1e9:.0f} GB/s)")
    print(f"gmres band matvec:    {t_g_band*1e3:8.2f} ms")
    print(f"gmres pallas matvec:  {t_g_pallas*1e3:8.2f} ms "
          f"(its={its}, rel={rel:.2e})")


if __name__ == "__main__":
    main()
