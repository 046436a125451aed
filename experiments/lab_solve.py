"""Perf lab: solve-path variants at the bench config (N=1e6, bw=201, K=64).

Measures per-solve wall-clock for several SPIKE solve strategies on the real
TPU, using the same chained-fori_loop differenced timing as bench.py (the
axon tunnel makes block_until_ready unreliable).

Run: python experiments/lab_solve.py
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
        """Differenced per-iteration time of loop_fn(r)."""
        timed(lambda: loop_fn(small))
        timed(lambda: loop_fn(big))
        ts = min(timed(lambda: loop_fn(small)) for _ in range(reps))
        tb = min(timed(lambda: loop_fn(big)) for _ in range(reps))
        dt = max(tb - ts, 1e-9) / (big - small)
        if dt < 1e-5:
            dt = max(tb / big, ts / small)
        return dt

    def factor_bytes(tree):
        return sum(l.size * l.dtype.itemsize
                   for l in jax.tree_util.tree_leaves(tree))

    results = {}

    def report(name, secs, gbytes=None):
        ms = secs * 1e3
        line = {"ms": round(ms, 3)}
        if gbytes is not None:
            line["gb_read"] = round(gbytes, 3)
            line["eff_gbs"] = round(gbytes / secs, 1)
        results[name] = line
        print(name, json.dumps(line), flush=True)

    # --- variants -----------------------------------------------------------
    cases = [
        ("cr_recompute", dict(method="cr", store_spikes=False)),
        ("cr_spikes", dict(method="cr", store_spikes=True)),
        ("inv_recompute", dict(method="inv", store_spikes=False)),
        ("inv_spikes", dict(method="inv", store_spikes=True)),
        ("inv_spikes_pallas", dict(method="inv", store_spikes=True),
         "pallas"),
        ("inv_recompute_pallas", dict(method="inv", store_spikes=False),
         "pallas"),
    ]
    only = os.environ.get("LAB_ONLY")
    for case in cases:
        name, kw = case[0], case[1]
        impl = case[2] if len(case) > 2 else "xla"
        if only and only not in name:
            continue

        @partial(jax.jit, static_argnames=("kk",))
        def factor_fn(d, kk):
            return spike_factor(BandedMatrix(data=d, kl=k, ku=k), K=kk,
                                block_b=128, **kw)

        t0 = time.perf_counter()
        sf = factor_fn(data, K)
        sync(sf)
        compile_s = time.perf_counter() - t0

        @partial(jax.jit, static_argnames=("r",))
        def solve_loop(sf, b, r):
            return jax.lax.fori_loop(
                0, r, lambda i, y: spike_solve(sf, y, impl=impl), b)

        fb = factor_bytes(sf.fact)
        vwb = (factor_bytes((sf.V, sf.W)) if sf.V is not None else 0)
        passes = 1 if sf.V is not None else 2
        gb = (passes * fb + vwb) / 1e9
        try:
            dt = per_iter(lambda r: solve_loop(sf, rhs, r))
        except Exception as e:  # noqa: BLE001
            print(name, "FAILED:", repr(e)[:200], flush=True)
            continue
        # accuracy
        x = solve_loop(sf, rhs, 1)
        rel = float(np.asarray(
            jnp.linalg.norm(banded_matvec(band, x) - rhs)
            / jnp.linalg.norm(rhs)))
        report(name, dt, gb)
        results[name]["rel_residual"] = rel
        results[name]["factor_compile_s"] = round(compile_s, 1)
        print(f"  rel_residual={rel:.2e}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
