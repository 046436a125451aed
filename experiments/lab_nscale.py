"""N-scaling: solve/factor latency vs problem size at bw=201 (bench config
family).  Solve should scale linearly with the factor bytes streamed
(memory-bound); factor carries the K-independent conversion+Newton floor.
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

    k = int(os.environ.get("LAB_HALFBW", 100))
    w = 2 * k + 1
    dtype = jnp.float32

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

    results = {}
    sizes = {250_000: 16, 1_000_000: 64, 2_000_000: 128, 4_000_000: 256}
    sel = [int(x) for x in os.environ.get(
        "LAB_SIZES", "250000,1000000,2000000,4000000").split(",")]
    for n, K in ((nn, sizes[nn]) for nn in sel):
        key = jax.random.PRNGKey(0)
        data = jax.random.uniform(key, (n, w), dtype, minval=-1.0,
                                  maxval=1.0)
        data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
        band = BandedMatrix(data=data, kl=k, ku=k)
        rhs = banded_matvec(band, jnp.ones((n,), dtype))
        _ = np.asarray(rhs[:8])

        @partial(jax.jit, static_argnames=("kk",))
        def factor_fn(d, kk):
            return spike_factor(BandedMatrix(data=d, kl=k, ku=k), K=kk,
                                block_b=128, method="inv",
                                store_spikes=True,
                                spike_dtype=jnp.bfloat16)

        @partial(jax.jit, static_argnames=("r",))
        def loop(sf, b0, r):
            return jax.lax.fori_loop(0, r,
                                     lambda i, y: spike_solve(sf, y), b0)

        try:
            sf = factor_fn(data, K)
            sync(sf)
            fdt = min(timed(lambda: factor_fn(data, K)) for _ in range(3))
            for r in (2, 12):
                timed(lambda: loop(sf, rhs, r))
            ts = min(timed(lambda: loop(sf, rhs, 2)) for _ in range(3))
            tb = min(timed(lambda: loop(sf, rhs, 12)) for _ in range(3))
            dt = (tb - ts) / 10
            if dt < 5e-5:      # tunnel noise collapsed the difference
                dt = max(tb / 12.0, ts / 2.0)
            x = spike_solve(sf, rhs)
            rel = float(np.asarray(jnp.linalg.norm(
                banded_matvec(band, x) - rhs) / jnp.linalg.norm(rhs)))
        except Exception as e:  # noqa: BLE001
            print(f"N{n} FAILED:", repr(e)[:200], flush=True)
            continue
        name = f"N{n}_K{K}"
        results[name] = {"solve_ms": round(dt * 1e3, 3),
                         "factor_ms": round(fdt * 1e3, 2), "rel": rel}
        print(name, json.dumps(results[name]), flush=True)
        del sf, data, band, rhs

    print(json.dumps(results))


if __name__ == "__main__":
    main()
