"""Dissect the assembled stored-spikes fused solve: time partial pipelines.

Stages: P = fused pallas pass, R = reduced solve, C = corrections einsum.
Times P, P+R, P+R+C (= full spike_solve) in the same chained harness.
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
    from spike_petsc_tpu.ops.spike import (spike_factor, _reduced_solve,
                                           _make_batched_solve)

    n = int(os.environ.get("LAB_N", 1_000_000))
    k = int(os.environ.get("LAB_HALFBW", 100))
    K = int(os.environ.get("LAB_PARTS", 64))
    w = 2 * k + 1
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), dtype, minval=-1.0, maxval=1.0)
    data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    band = BandedMatrix(data=data, kl=k, ku=k)
    rhs = banded_matvec(band, jnp.ones((n,), dtype))
    _ = np.asarray(rhs[:8])

    @partial(jax.jit, static_argnames=("kk",))
    def factor_fn(d, kk):
        return spike_factor(BandedMatrix(data=d, kl=k, ku=k), K=kk,
                            block_b=128, method="inv", store_spikes=True,
                            inverter="newton")

    sf = factor_fn(data, K)
    nb, b, m = sf.nb, sf.b, sf.m

    @jax.jit
    def _digest(x):
        return x.ravel()[:1024] * 1.0

    def sync(tree):
        leaf = next(l for l in jax.tree_util.tree_leaves(tree)
                    if hasattr(l, "ravel") and getattr(l, "size", 0))
        return np.asarray(_digest(leaf))

    sync(sf)

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

    from spike_petsc_tpu.ops.pallas.fused_sweep import (
        blocktri_solve_fused_pallas)

    # NOTE: sf must be threaded as a jit ARGUMENT (closure capture would
    # serialize the 2.4 GB factor into the axon remote-compile POST)
    def stage_P(sf_in, y):
        rp = jnp.zeros((K * m,), y.dtype).at[:n].set(y)
        g = blocktri_solve_fused_pallas(sf_in.fact, rp.reshape(K, nb, b))
        return g.reshape(-1)[:n]

    def stage_PR(sf_in, y):
        rp = jnp.zeros((K * m,), y.dtype).at[:n].set(y)
        g = blocktri_solve_fused_pallas(sf_in.fact, rp.reshape(K, nb, b))
        xbp, xtn = _reduced_solve(sf_in, g[:, nb - 1, b - k:], g[:, 0, :k])
        g = g.at[:, 0, 0].add(xbp[:, 0] + xtn[:, 0])
        return g.reshape(-1)[:n]

    def stage_PRC(sf_in, y):
        rp = jnp.zeros((K * m,), y.dtype).at[:n].set(y)
        g = blocktri_solve_fused_pallas(sf_in.fact, rp.reshape(K, nb, b))
        xbp, xtn = _reduced_solve(sf_in, g[:, nb - 1, b - k:], g[:, 0, :k])
        x = (g - jnp.einsum("pnbk,pk->pnb", sf_in.V, xtn)
               - jnp.einsum("pnbk,pk->pnb", sf_in.W, xbp))
        return x.reshape(-1)[:n]

    results = {}
    for name, fn in [("P", stage_P), ("PR", stage_PR), ("PRC", stage_PRC)]:
        @partial(jax.jit, static_argnames=("r",))
        def loop(sf_in, b0, r, fn=fn):
            return jax.lax.fori_loop(0, r, lambda i, y: fn(sf_in, y), b0)
        dt = per_iter(lambda r: loop(sf, rhs, r))
        results[name] = round(dt * 1e3, 3)
        print(name, results[name], "ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
