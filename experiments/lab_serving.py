"""Serving-path lab: multi-RHS solve throughput (spike_solve_many).

Measures per-batch latency and per-solve amortized cost for r right-hand
sides, XLA scan vs fused multi-RHS Pallas kernel, plus bf16-stored factors.
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
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve_many

    n = int(os.environ.get("LAB_N", 1_000_000))
    k = int(os.environ.get("LAB_HALFBW", 100))
    K = int(os.environ.get("LAB_PARTS", 64))
    w = 2 * k + 1
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), dtype, minval=-1.0, maxval=1.0)
    data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    band = BandedMatrix(data=data, kl=k, ku=k)

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

    def per_iter(loop_fn, small=2, big=8, reps=3):
        timed(lambda: loop_fn(small))
        timed(lambda: loop_fn(big))
        ts = min(timed(lambda: loop_fn(small)) for _ in range(reps))
        tb = min(timed(lambda: loop_fn(big)) for _ in range(reps))
        dt = max(tb - ts, 1e-9) / (big - small)
        if dt < 1e-5:
            dt = max(tb / big, ts / small)
        return dt

    results = {}
    stores = {'f32': None, 'bf16': jnp.bfloat16}
    sel = os.environ.get('LAB_STORES', 'f32,bf16').split(',')
    for store in (stores[x] for x in sel):
        @partial(jax.jit, static_argnames=("kk",))
        def factor_fn(d, kk, store=store):
            return spike_factor(BandedMatrix(data=d, kl=k, ku=k), K=kk,
                                block_b=128, method="inv",
                                store_spikes=True, store_dtype=store)
        sf = factor_fn(data, K)
        sync(sf)
        sname = "bf16" if store is not None else "f32"
        for r in tuple(int(x) for x in os.environ.get('LAB_RS', '8,32').split(',')):
            X = jax.random.uniform(jax.random.fold_in(key, r), (n, r), dtype)
            B = jnp.stack([banded_matvec(band, X[:, i])
                           for i in range(r)], axis=1)
            _ = sync(B)
            for impl in ("xla", "pallas_fused"):
                @partial(jax.jit, static_argnames=("reps",))
                def loop(sf_in, b0, reps, impl=impl):
                    def body(i, y):
                        return spike_solve_many(sf_in, y, impl=impl)
                    return jax.lax.fori_loop(0, reps, body, b0)
                name = f"{sname}_r{r}_{impl}"
                try:
                    dt = per_iter(lambda rr: loop(sf, B, rr))
                    x = spike_solve_many(sf, B, impl=impl)
                    rel = float(np.asarray(jnp.linalg.norm(x - X)
                                           / jnp.linalg.norm(X)))
                except Exception as e:  # noqa: BLE001
                    print(name, "FAILED:", repr(e)[:200], flush=True)
                    continue
                results[name] = {
                    "batch_ms": round(dt * 1e3, 3),
                    "per_solve_ms": round(dt * 1e3 / r, 4),
                    "rel_err": rel}
                print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
