"""Differenced-chained-loop timing of the preconditioned GMRES solve (the
tunnel adds 25-100 ms per dispatch; the round-2 gmres_wall_ms never
cancelled it the way the solve metric does).  Also scans restart: the
fixed-shape basis ops cost O(restart * n) per iteration regardless of j.
"""
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
    from spike_petsc_tpu.ops.blocktri import BlockTridiagonal, band_to_blocktri
    from spike_petsc_tpu.ops.pallas.matvec import blocktri_matvec_pallas
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve
    from spike_petsc_tpu.solvers.krylov import gmres

    n, k, K = 1_000_000, 100, 64
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

    sf = jax.jit(partial(
        spike_factor, K=K, block_b=128, method="inv", store_spikes=True,
        spike_dtype=jnp.bfloat16), static_argnames=())(band)
    sync(sf)
    T = jax.jit(lambda d: band_to_blocktri(
        BandedMatrix(data=d, kl=k, ku=k), 128))(data)
    sync(T)
    nb, bb = T.nb, T.b

    # baseline tunnel latency: a do-nothing dispatch on resident data
    t0 = timed(lambda: rhs, rep=5)
    print(f"dispatch+readback floor: {t0*1e3:8.2f} ms")

    def run(restart, r_chain, mv_kind):
        @partial(jax.jit, static_argnames=("r", "restart"))
        def loop(TD, TL, TU, band_data, sf_in, b_in, r, restart):
            Tm = BlockTridiagonal(D=TD, L=TL, U=TU)
            bnd = BandedMatrix(data=band_data, kl=k, ku=k)

            def mv_pallas(v):
                xb = jnp.pad(v, (0, nb * bb - n)).reshape(nb, bb)
                return blocktri_matvec_pallas(Tm, xb).reshape(-1)[:n]
            mv = mv_pallas if mv_kind == "pallas" else (
                lambda v: banded_matvec(bnd, v))

            def body(i, bcur):
                res = gmres(mv, bcur, None, lambda v: spike_solve(sf_in, v),
                            rtol=1e-8, maxit=30, restart=restart)
                # re-feed a solution-derived rhs to chain without fusing away
                return bcur + 0.0 * res.x
            return jax.lax.fori_loop(0, r, body, b_in)
        f = lambda r: loop(T.D, T.L, T.U, data, sf, rhs, r, restart)
        timed(lambda: f(1), rep=1)
        timed(lambda: f(r_chain), rep=1)
        t1 = timed(lambda: f(1), rep=3)
        t2 = timed(lambda: f(r_chain), rep=3)
        per = (t2 - t1) / (r_chain - 1)
        print(f"gmres {mv_kind:6s} restart={restart:2d}: "
              f"{per*1e3:8.2f} ms/solve  (1-shot wall {t1*1e3:7.2f})")
        return per

    run(30, 5, "band")
    run(30, 5, "pallas")
    run(8, 5, "pallas")
    run(4, 5, "pallas")


if __name__ == "__main__":
    main()
