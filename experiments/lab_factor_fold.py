"""Dissect the folded band->blocktri conversion inside the factor scan.

Variants at the bench config (N=1e6, w=201, K=64, b=128, inv+waux):
  native   — blocks assembled on device (no conversion): the 65.6 ms floor
  fused    — per-step skew inside the scan (blocktri_factor_inv_waux_band)
  skewed   — ONE global pad+reshape skew to [K, nb, b, 3b] outside the
             scan; the scan streams [b, 3b] rows and takes static slices
  matpath  — the materialized band_to_blocktri conversion + waux factor
Plus the primitive costs: global skew alone, band transpose alone.

Run on the TPU:  python experiments/lab_factor_fold.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timed(fn, sync, reps=3):
    fn()  # compile
    sync()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        sync()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    only = set((os.environ.get("VARIANTS") or
                "skew,transpose,fused,skewed,matpath,parity").split(","))
    from spike_petsc_tpu.ops.band import BandedMatrix
    from spike_petsc_tpu.ops.blocktri import (
        band_to_blocktri, blocktri_factor_inv_waux,
        blocktri_factor_inv_waux_band, _sweep_matvec, BlockTriFactor,
        batched_inverse)

    n = int(os.environ.get("N", 1_000_000))
    k = int(os.environ.get("HALFBW", 100))
    K, b = 64, 128
    w = 2 * k + 1
    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), jnp.float32, -1.0, 1.0)
    data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    m = -(-n // (K * b)) * b
    npad = K * m
    nb = m // b
    pad = jnp.zeros((npad - n, w), jnp.float32).at[:, k].set(1.0)
    dpad = jnp.concatenate([data, pad], axis=0)
    local4 = dpad.reshape(K, nb, b, w)
    Cb = jnp.zeros((K, b, k), jnp.float32)

    def digest(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:64])

    # --- primitive: global skew [K, nb, b, w] -> [K, nb, b, 3b] ----------
    @jax.jit
    def gskew(ld):
        W2 = 3 * b + 1
        Z = jnp.pad(ld, ((0, 0), (0, 0), (0, 0), (b - k, W2 - (b - k) - w)))
        return Z.reshape(K, nb, b * W2)[:, :, : 3 * b * b].reshape(
            K, nb, b, 3 * b)

    out = {}
    if "skew" in only:
        sk = gskew(local4)
        out["global_skew_ms"] = timed(lambda: gskew(local4),
                                      lambda: digest(sk)) * 1e3
        print("global_skew_ms", out["global_skew_ms"], flush=True)
        del sk

    # --- primitive: band transpose [K, nb, b, w] -> [nb, K, b, w] --------
    @jax.jit
    def btr(ld):
        return jnp.swapaxes(ld, 0, 1)

    if "transpose" in only:
        tr = btr(local4)
        out["band_transpose_ms"] = timed(lambda: btr(local4),
                                         lambda: digest(tr)) * 1e3
        print("band_transpose_ms", out["band_transpose_ms"], flush=True)
        del tr

    # --- fused (current) --------------------------------------------------
    @jax.jit
    def f_fused(ld, cb):
        return jax.vmap(partial(blocktri_factor_inv_waux_band,
                                kl=k, ku=k, b=b))(ld, cb)

    r = None
    if "fused" in only:
        r = f_fused(local4, Cb)
        out["fused_ms"] = timed(lambda: f_fused(local4, Cb),
                                lambda: digest(r)) * 1e3
        print("fused_ms", out["fused_ms"], flush=True)

    # --- skewed: global skew outside, scan slices -------------------------
    def factor_scan_skewed(sk_p, y0):
        dtype = sk_p.dtype

        def step(carry, S):
            s_prev_inv, y_prev, u_prev = carry
            l, d, u = S[:, :b], S[:, b:2 * b], S[:, 2 * b:]
            f = l @ s_prev_inv
            s = d - f @ u_prev
            s_inv = batched_inverse(s[None], "auto")[0]
            y = -_sweep_matvec(f, y_prev)
            return (s_inv, y, u), (f, s_inv, y, u_prev)

        d0, u0 = sk_p[0, :, b:2 * b], sk_p[0, :, 2 * b:]
        s0_inv = batched_inverse(d0[None], "auto")[0]
        (_, _, _), (f_rest, sinv_rest, y_rest, u_head) = jax.lax.scan(
            step, (s0_inv, y0, u0), sk_p[1:])
        F = jnp.concatenate([jnp.zeros((1, b, b), dtype), f_rest], axis=0)
        Sinv = jnp.concatenate([s0_inv[None], sinv_rest], axis=0)
        y = jnp.concatenate([y0[None], y_rest], axis=0)
        U = jnp.concatenate([u_head, jnp.zeros((1, b, b), dtype)], axis=0)
        z = jnp.zeros((nb, 0, 0), dtype)
        zp = jnp.zeros((nb, 0), jnp.int32)
        return BlockTriFactor(F=F, U=U, Sinv=Sinv, Slu=z, piv=zp,
                              method="inv", nshift=None), y

    @jax.jit
    def f_skewed(ld, cb):
        sk_ = gskew.__wrapped__(ld)
        return jax.vmap(factor_scan_skewed)(sk_, cb)

    if "skewed" in only:
        r2 = f_skewed(local4, Cb)
        out["skewed_ms"] = timed(lambda: f_skewed(local4, Cb),
                                 lambda: digest(r2)) * 1e3
        print("skewed_ms", out["skewed_ms"], flush=True)
        del r2

    # --- materialized conversion + waux (old default path) ----------------
    @jax.jit
    def f_mat(ld, cb):
        blocks = jax.vmap(
            lambda d: band_to_blocktri(
                BandedMatrix(data=d.reshape(m, w), kl=k, ku=k), b))(ld)
        return jax.vmap(blocktri_factor_inv_waux)(blocks, cb)

    if "matpath" in only:
        r3 = f_mat(local4, Cb)
        out["matpath_ms"] = timed(lambda: f_mat(local4, Cb),
                                  lambda: digest(r3)) * 1e3
        print("matpath_ms", out["matpath_ms"], flush=True)
        if "parity" in only and r is not None:
            df = float(jnp.max(jnp.abs(r[0].F - r3[0].F)))
            ds = float(jnp.max(jnp.abs(r[0].Sinv - r3[0].Sinv)))
            out["fused_vs_mat_maxdiff"] = max(df, ds)
        del r3

    for kk, vv in out.items():
        print(f"{kk}: {vv:.3f}")


if __name__ == "__main__":
    main()
