"""Dissect spike_factor(method='inv', store_spikes=True) stage times at the
bench config: partition factorization (Newton-Schulz Schur inverses), V/W
spike solves, reduced-system assembly+factor.  Chained-loop differenced
timing per stage (tunnel-safe, same methodology as bench.py).
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

    from spike_petsc_tpu.ops.band import BandedMatrix, pad_banded
    from spike_petsc_tpu.ops.blocktri import band_to_blocktri, blocktri_factor
    from spike_petsc_tpu.ops.spike import (_extract_tips, _spike_columns,
                                           spike_factor)

    n = int(os.environ.get("LAB_N", 1_000_000))
    k = int(os.environ.get("LAB_HALFBW", 100))
    K = int(os.environ.get("LAB_PARTS", 64))
    b = 128
    w = 2 * k + 1
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), dtype, minval=-1.0, maxval=1.0)
    data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)

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

    m = -(-(-(-n // K) // b) * b)
    m = (-(-(-(-n // K)) // b)) * b  # ceil(ceil(n/K)/b)*b
    m = ((n + K - 1) // K + b - 1) // b * b
    nb = m // b

    # stage jits ------------------------------------------------------------
    @jax.jit
    def stage_blocks(d):
        band = pad_banded(BandedMatrix(data=d, kl=k, ku=k), K * m)
        local = band.data.reshape(K, m, band.width)
        return jax.vmap(lambda dd: band_to_blocktri(
            BandedMatrix(data=dd, kl=k, ku=k), b))(local)

    @jax.jit
    def stage_factor(blocks):
        return jax.vmap(partial(blocktri_factor, method="inv",
                                inverter="auto"))(blocks)

    @jax.jit
    def stage_tips(d):
        band = pad_banded(BandedMatrix(data=d, kl=k, ku=k), K * m)
        return _extract_tips(band.data, K, m, k, k, k)

    @jax.jit
    def stage_spikes(fact, Btip, Ctip):
        return _spike_columns(fact, Btip, Ctip, nb, b, k, dtype)

    def per_call(fn, reps=3):
        timed(fn)                    # compile+run
        return min(timed(fn) for _ in range(reps))

    res = {}
    blocks = stage_blocks(data); sync(blocks)
    res["blocks_ms"] = round(per_call(lambda: stage_blocks(data)) * 1e3, 2)
    fact = stage_factor(blocks); sync(fact)
    res["partition_factor_ms"] = round(
        per_call(lambda: stage_factor(blocks)) * 1e3, 2)
    tips = stage_tips(data); sync(tips)
    res["tips_ms"] = round(per_call(lambda: stage_tips(data)) * 1e3, 2)
    vw = stage_spikes(fact, *tips); sync(vw)
    res["spike_solves_ms"] = round(
        per_call(lambda: stage_spikes(fact, *tips)) * 1e3, 2)

    @partial(jax.jit, static_argnames=("kk",))
    def full(d, kk):
        return spike_factor(BandedMatrix(data=d, kl=k, ku=k), K=kk,
                            block_b=b, method="inv", store_spikes=True)
    sf = full(data, K); sync(sf)
    res["full_factor_ms"] = round(per_call(lambda: full(data, K)) * 1e3, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
