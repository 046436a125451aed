"""Perf lab: isolate spike_solve overheads beyond the factor-streaming pass.

Measures, at the bench config:
  1. the reduced-system solve alone ([K-1, 2k] CR vs truncated inverse)
  2. the V/W spike-correction application in several layouts/dtypes
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

    n = int(os.environ.get("LAB_N", 1_000_000))
    k = int(os.environ.get("LAB_HALFBW", 100))
    K = int(os.environ.get("LAB_PARTS", 64))
    b = 128
    nb = -(-(-(-n // K) // b))  # ceil(ceil(n/K)/b)
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)

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

    def per_iter(loop_fn, small=2, big=22, reps=3):
        timed(lambda: loop_fn(small))
        timed(lambda: loop_fn(big))
        ts = min(timed(lambda: loop_fn(small)) for _ in range(reps))
        tb = min(timed(lambda: loop_fn(big)) for _ in range(reps))
        dt = max(tb - ts, 1e-9) / (big - small)
        if dt < 1e-5:
            dt = max(tb / big, ts / small)
        return dt

    results = {}

    def report(name, secs, gbytes=None):
        line = {"ms": round(secs * 1e3, 3)}
        if gbytes:
            line["eff_gbs"] = round(gbytes / secs, 1)
        results[name] = line
        print(name, json.dumps(line), flush=True)

    # ---- 1. reduced system -------------------------------------------------
    from spike_petsc_tpu.ops.blocktri import BlockTridiagonal
    from spike_petsc_tpu.ops.cyclic import cr_factor, cr_solve

    twok = 2 * k
    Km1 = K - 1
    D = (jax.random.uniform(key, (Km1, twok, twok), dtype)
         + jnp.eye(twok, dtype=dtype) * twok)
    L = jax.random.uniform(jax.random.fold_in(key, 1),
                           (Km1, twok, twok), dtype) * 0.01
    L = L.at[0].set(0)
    U = jax.random.uniform(jax.random.fold_in(key, 2),
                           (Km1, twok, twok), dtype) * 0.01
    U = U.at[Km1 - 1].set(0)
    red = BlockTridiagonal(D=D, L=L, U=U)
    rf = cr_factor(red, inverter="newton")
    rhs_red = jax.random.uniform(jax.random.fold_in(key, 3), (Km1, twok),
                                 dtype)
    sync(rf)

    @partial(jax.jit, static_argnames=("r",))
    def red_loop(rf, b0, r):
        return jax.lax.fori_loop(0, r, lambda i, y: cr_solve(rf, y) * 1.0,
                                 b0)
    report("reduced_cr_solve", per_iter(lambda r: red_loop(rf, rhs_red, r)))

    Dinv = jnp.linalg.inv(D)

    @partial(jax.jit, static_argnames=("r",))
    def trunc_loop(Di, b0, r):
        return jax.lax.fori_loop(
            0, r, lambda i, y: jnp.einsum("jpq,jq->jp", Di, y), b0)
    report("reduced_truncated", per_iter(lambda r: trunc_loop(Dinv, rhs_red,
                                                              r)))

    # ---- 2. spike correction -----------------------------------------------
    V = jax.random.uniform(jax.random.fold_in(key, 4), (K, nb, b, k), dtype)
    W = jax.random.uniform(jax.random.fold_in(key, 5), (K, nb, b, k), dtype)
    xt = jax.random.uniform(jax.random.fold_in(key, 6), (K, k), dtype)
    xb = jax.random.uniform(jax.random.fold_in(key, 7), (K, k), dtype)
    g = jax.random.uniform(jax.random.fold_in(key, 8), (K, nb, b), dtype)
    gb = 2 * V.size * V.dtype.itemsize / 1e9

    @partial(jax.jit, static_argnames=("r",))
    def corr_einsum(V, W, g, xt, xb, r):
        def body(i, gg):
            return (gg - jnp.einsum("pnbk,pk->pnb", V, xt)
                    - jnp.einsum("pnbk,pk->pnb", W, xb))
        return jax.lax.fori_loop(0, r, body, g)
    report("corr_einsum_pnbk", per_iter(
        lambda r: corr_einsum(V, W, g, xt, xb, r)), gb)

    # k-on-sublane layout: V2 [K, k, nb*b]
    V2 = V.reshape(K, nb * b, k).swapaxes(1, 2)
    W2 = W.reshape(K, nb * b, k).swapaxes(1, 2)
    g2 = g.reshape(K, nb * b)

    @partial(jax.jit, static_argnames=("r",))
    def corr_km(V2, W2, g2, xt, xb, r):
        def body(i, gg):
            return (gg - jnp.einsum("pkm,pk->pm", V2, xt)
                    - jnp.einsum("pkm,pk->pm", W2, xb))
        return jax.lax.fori_loop(0, r, body, g2)
    report("corr_einsum_pkm", per_iter(
        lambda r: corr_km(V2, W2, g2, xt, xb, r)), gb)

    # merged VW [K, 2k, m] with one einsum
    VW = jnp.concatenate([V2, W2], axis=1)
    xtb = jnp.concatenate([xt, xb], axis=1)

    @partial(jax.jit, static_argnames=("r",))
    def corr_merged(VW, g2, xtb, r):
        def body(i, gg):
            return gg - jnp.einsum("pkm,pk->pm", VW, xtb)
        return jax.lax.fori_loop(0, r, body, g2)
    report("corr_einsum_merged", per_iter(
        lambda r: corr_merged(VW, g2, xtb, r)), gb)

    # bf16 variants
    VWh = VW.astype(jnp.bfloat16)

    @partial(jax.jit, static_argnames=("r",))
    def corr_merged_bf16(VWh, g2, xtb, r):
        def body(i, gg):
            return gg - jnp.einsum("pkm,pk->pm", VWh,
                                   xtb.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
        return jax.lax.fori_loop(0, r, body, g2)
    report("corr_merged_bf16", per_iter(
        lambda r: corr_merged_bf16(VWh, g2, xtb, r)), gb / 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
