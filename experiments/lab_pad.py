"""Isolate the cost of the pad/reshape/slice wrapping around the fused pass.

A: carry [K,nb,b], no pad/slice (lab_fused harness)
B: carry [n], zeros.at[:n].set + reshape in, reshape + [:n] out (spike_solve)
C: carry [n] with n == K*m exactly (pad becomes full overwrite)
D: like B, but pad via jnp.pad instead of scatter-into-zeros
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

    from spike_petsc_tpu.ops.band import BandedMatrix
    from spike_petsc_tpu.ops.spike import spike_factor
    from spike_petsc_tpu.ops.pallas.fused_sweep import (
        blocktri_solve_fused_pallas)

    n = 1_000_000
    k, K = 100, 64
    w = 2 * k + 1
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), dtype, minval=-1.0, maxval=1.0)
    data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)

    @partial(jax.jit, static_argnames=("kk",))
    def factor_fn(d, kk):
        return spike_factor(BandedMatrix(data=d, kl=k, ku=k), K=kk,
                            block_b=128, method="inv", inverter="newton")

    sf = factor_fn(data, K)
    nb, b, m = sf.nb, sf.b, sf.m
    rhs = jnp.ones((n,), dtype)
    rblk = jnp.ones((K, nb, b), dtype)

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

    results = {}

    def run(name, body, carry):
        @partial(jax.jit, static_argnames=("r",))
        def loop(sf_in, c0, r):
            return jax.lax.fori_loop(0, r, lambda i, y: body(sf_in, y), c0)
        dt = per_iter(lambda r: loop(sf, carry, r))
        results[name] = round(dt * 1e3, 3)
        print(name, results[name], "ms", flush=True)

    def body_A(sf_in, y):
        return blocktri_solve_fused_pallas(sf_in.fact, y)

    def body_B(sf_in, y):
        rp = jnp.zeros((K * m,), y.dtype).at[:n].set(y)
        g = blocktri_solve_fused_pallas(sf_in.fact, rp.reshape(K, nb, b))
        return g.reshape(-1)[:n]

    nfull = K * m

    def body_C(sf_in, y):
        g = blocktri_solve_fused_pallas(sf_in.fact, y.reshape(K, nb, b))
        return g.reshape(-1)

    def body_D(sf_in, y):
        rp = jnp.pad(y, (0, K * m - n))
        g = blocktri_solve_fused_pallas(sf_in.fact, rp.reshape(K, nb, b))
        return g.reshape(-1)[:n]

    run("A_blocked_carry", body_A, rblk)
    run("B_pad_scatter", body_B, rhs)
    run("C_exact_size", body_C, jnp.ones((nfull,), dtype))
    run("D_pad_op", body_D, rhs)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
