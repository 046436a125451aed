"""Measure the spd (Cholesky-role) SPIKE path on hardware vs method='inv'.

Run on the TPU: factor memory (2 vs 3 block arrays), factor time, and
solve time through the fused kernels (the spd backward sweep re-streams F
transposed instead of a stored U — same streamed bytes, 2/3 storage).

  python experiments/lab_spd.py            # defaults: N=1e6, bw=201, K=64
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
    K = int(os.environ.get("LAB_PARTS", 64))
    w = 2 * k + 1
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    # symmetric diagonally-dominant band: mirror the upper triangle
    half = jax.random.uniform(key, (n, k), dtype, minval=-1.0, maxval=1.0)
    data = jnp.zeros((n, w), dtype)
    data = data.at[:, k + 1:].set(half)
    # lower entries mirror: A[i, i-d] = A[i-d, i] -> data[i, k-d] =
    # data[i-d, k+d]
    for d in range(1, k + 1):
        data = data.at[d:, k - d].set(half[:-d, d - 1])
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

    out = {}
    for method in ("spd", "inv"):
        @partial(jax.jit, static_argnames=("m",))
        def factor_fn(d, m):
            return spike_factor(BandedMatrix(data=d, kl=k, ku=k), K=K,
                                block_b=128, method=m, store_spikes=True,
                                spike_dtype=jnp.bfloat16,
                                inverter="newton_fixed")

        timed(lambda: factor_fn(data, method))          # compile
        f_s = min(timed(lambda: factor_fn(data, method)) for _ in range(3))
        sf = factor_fn(data, method)
        sync(sf)
        fact_bytes = sum(l.size * l.dtype.itemsize for l in
                         jax.tree_util.tree_leaves(sf.fact))

        @partial(jax.jit, static_argnames=("r",))
        def solve_loop(s, b, r):
            return jax.lax.fori_loop(
                0, r, lambda i, y: spike_solve(s, y), b)

        timed(lambda: solve_loop(sf, rhs, 2))
        timed(lambda: solve_loop(sf, rhs, 22))
        t1 = min(timed(lambda: solve_loop(sf, rhs, 2)) for _ in range(5))
        t2 = min(timed(lambda: solve_loop(sf, rhs, 22)) for _ in range(5))
        s_s = max(t2 - t1, 1e-9) / 20.0
        if s_s < 1e-5:
            s_s = t2 / 22.0
        x = solve_loop(sf, rhs, 1)
        rel = float(np.asarray(jnp.linalg.norm(banded_matvec(band, x) - rhs)
                               / jnp.linalg.norm(rhs)))
        out[method] = dict(factor_ms=round(f_s * 1e3, 2),
                           solve_ms=round(s_s * 1e3, 3),
                           fact_bytes_mb=round(fact_bytes / 2**20, 1),
                           relres=rel)
        del sf
    print(json.dumps(out))


if __name__ == "__main__":
    main()
