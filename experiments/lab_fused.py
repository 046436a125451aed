"""Perf lab: fused manual-DMA Pallas sweep on the real TPU.

Times blocktri_solve_fused_pallas at the bench config's per-partition solve
([K=64, nb=123, b=128] f32 'inv' factors, 1.55 GB streamed) across
mode/nbuf knobs, against the XLA scan and grid-pipelined Pallas baselines.
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
    from spike_petsc_tpu.ops.spike import spike_factor, _batched_tri_solve
    from spike_petsc_tpu.ops.pallas.fused_sweep import (
        blocktri_solve_fused_pallas)
    from spike_petsc_tpu.ops.pallas.sweeps import (
        blocktri_solve_batched_pallas)

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
                            block_b=128, method="inv")

    sf = factor_fn(data, K)
    nb = sf.nb
    rblk = jnp.zeros((K * sf.m,), dtype).at[:n].set(rhs).reshape(K, nb, sf.b)

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

    fbytes = sum(a.size * a.dtype.itemsize for a in (sf.fact.F, sf.fact.Sinv,
                                                     sf.fact.U))
    gb = fbytes / 1e9
    print(f"factor bytes: {gb:.3f} GB", flush=True)

    x_ref = None
    results = {}

    def run(name, solver):
        nonlocal x_ref

        @partial(jax.jit, static_argnames=("r",))
        def loop(f, b0, r):
            def body(i, y):
                x = solver(f, y)
                return y * 0.0 + x.astype(y.dtype)
            return jax.lax.fori_loop(0, r, body, b0)

        try:
            dt = per_iter(lambda r: loop(sf.fact, rblk, r))
            x = solver(sf.fact, rblk)
            if x_ref is None:
                x_ref = x
                diff = 0.0
            else:
                diff = float(jnp.max(jnp.abs(x - x_ref)))
        except Exception as e:  # noqa: BLE001
            print(name, "FAILED:", repr(e)[:300], flush=True)
            return
        results[name] = {"ms": round(dt * 1e3, 3),
                         "eff_gbs": round(gb / dt, 1),
                         "maxdiff": diff}
        print(name, json.dumps(results[name]), flush=True)

    only = os.environ.get("LAB_ONLY", "")
    cases = {
        "xla_scan": lambda f, b: _batched_tri_solve(f, b),
        "pallas_grid": lambda f, b: blocktri_solve_batched_pallas(f, b),
        "fused_mxu_nbuf4": lambda f, b: blocktri_solve_fused_pallas(
            f, b, mode="mxu", nbuf=4),
        "fused_vpu_nbuf4": lambda f, b: blocktri_solve_fused_pallas(
            f, b, mode="vpu", nbuf=4),
        "fused_mxu_nbuf6": lambda f, b: blocktri_solve_fused_pallas(
            f, b, mode="mxu", nbuf=6),
        "fused_mxu_nbuf2": lambda f, b: blocktri_solve_fused_pallas(
            f, b, mode="mxu", nbuf=2),
    }
    for name, solver in cases.items():
        if only and only not in name:
            continue
        run(name, solver)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
