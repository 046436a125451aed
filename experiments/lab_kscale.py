"""K-scaling lab: solve latency vs partition count, CR vs Thomas reduced.

The reduced interface system has K-1 block rows of size 2k; a sequential
Thomas scan over it puts a K-linear term in every solve, while cyclic
reduction keeps it log-depth (the recursive-SPIKE role).  This measures the
flagship solve at K = 64..512 under both reduced-system factorizations.
"""
from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve

    n = int(os.environ.get("LAB_N", 1_000_000))
    k = int(os.environ.get("LAB_HALFBW", 100))
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

    def timed(fn):
        t0 = time.perf_counter()
        sync(fn())
        return time.perf_counter() - t0

    def per_iter(loop_fn, small=2, big=12, reps=3):
        timed(lambda: loop_fn(small))
        timed(lambda: loop_fn(big))
        ts = min(timed(lambda: loop_fn(small)) for _ in range(reps))
        tb = min(timed(lambda: loop_fn(big)) for _ in range(reps))
        dt = max(tb - ts, 1e-9) / (big - small)
        if dt < 1e-5:
            dt = max(tb / big, ts / small)
        return dt

    results = {}
    for K in (64, 128, 256, 512):
        for reduced in ("cr", "thomas"):
            @partial(jax.jit, static_argnames=("kk", "red"))
            def factor_fn(d, kk, red):
                return spike_factor(BandedMatrix(data=d, kl=k, ku=k), K=kk,
                                    block_b=128, method="inv",
                                    store_spikes=True, reduced=red)

            try:
                sf = factor_fn(data, K, reduced)
                sync(sf)
                factor_dt = min(
                    timed(lambda: factor_fn(data, K, reduced))
                    for _ in range(3))

                @partial(jax.jit, static_argnames=("r",))
                def loop(sf_in, b0, r):
                    return jax.lax.fori_loop(
                        0, r, lambda i, y: spike_solve(sf_in, y), b0)
                dt = per_iter(lambda r: loop(sf, rhs, r))
                x = spike_solve(sf, rhs)
                rel = float(np.asarray(
                    jnp.linalg.norm(banded_matvec(band, x) - rhs)
                    / jnp.linalg.norm(rhs)))
            except Exception as e:  # noqa: BLE001
                print(f"K{K}_{reduced} FAILED:", repr(e)[:200], flush=True)
                continue
            name = f"K{K}_{reduced}"
            results[name] = {"solve_ms": round(dt * 1e3, 3),
                             "factor_ms": round(factor_dt * 1e3, 2),
                             "rel": rel}
            print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
