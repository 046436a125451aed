"""Perf lab round 2: assembled spike_solve configs + factor times w/ newton.

Candidates for the new bench default at N=1e6, bw=201, K=64:
  solve:  method x store_spikes x impl(auto->pallas_fused for inv)
  factor: inverter newton vs blocked, method cr vs inv
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
    cases = [
        ("cr_newton_spikes", dict(method="cr", store_spikes=True,
                                  inverter="newton"), "xla"),
        ("inv_newton_spikes_fused", dict(method="inv", store_spikes=True,
                                         inverter="newton"), "pallas_fused"),
        ("inv_newton_recompute_fused", dict(method="inv", store_spikes=False,
                                            inverter="newton"),
         "pallas_fused"),
        ("inv_blocked_spikes_fused", dict(method="inv", store_spikes=True,
                                          inverter="blocked"),
         "pallas_fused"),
        ("inv_newton_spikes_bf16vw", dict(method="inv", store_spikes=True,
                                          inverter="newton",
                                          spike_dtype="bf16"),
         "pallas_fused"),
    ]
    only = os.environ.get("LAB_ONLY")
    for name, kw, impl in cases:
        if only and only not in name:
            continue
        kw = dict(kw)
        spike_bf16 = kw.pop("spike_dtype", None) == "bf16"

        @partial(jax.jit, static_argnames=("kk",))
        def factor_fn(d, kk, kw=kw, spike_bf16=spike_bf16):
            sf = spike_factor(BandedMatrix(data=d, kl=k, ku=k), K=kk,
                              block_b=128, **kw)
            if spike_bf16 and sf.V is not None:
                sf = sf.__class__(
                    fact=sf.fact, Btip=sf.Btip, Ctip=sf.Ctip,
                    red_fact=sf.red_fact, red_Dinv=sf.red_Dinv,
                    V=sf.V.astype(jnp.bfloat16),
                    W=sf.W.astype(jnp.bfloat16),
                    n=sf.n, K=sf.K, m=sf.m, b=sf.b, k=sf.k,
                    truncated=sf.truncated)
            return sf

        try:
            t0 = time.perf_counter()
            sf = factor_fn(data, K)
            sync(sf)
            compile_s = time.perf_counter() - t0
            factor_s = min(timed(lambda: factor_fn(data, K))
                           for _ in range(3))

            @partial(jax.jit, static_argnames=("r",))
            def solve_loop(sf, b0, r, impl=impl):
                return jax.lax.fori_loop(
                    0, r, lambda i, y: spike_solve(sf, y, impl=impl), b0)

            dt = per_iter(lambda r: solve_loop(sf, rhs, r))
            x = solve_loop(sf, rhs, 1)
            rel = float(np.asarray(
                jnp.linalg.norm(banded_matvec(band, x) - rhs)
                / jnp.linalg.norm(rhs)))
        except Exception as e:  # noqa: BLE001
            print(name, "FAILED:", repr(e)[:300], flush=True)
            continue
        results[name] = {"solve_ms": round(dt * 1e3, 3),
                         "factor_ms": round(factor_s * 1e3, 1),
                         "rel_residual": rel,
                         "compile_s": round(compile_s, 1)}
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
