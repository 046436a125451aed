"""Pallas barrel-shift skew kernel: band rows -> dense [L|D|U] block rows.

The band->blocktri conversion is EXACTLY a per-row lane shift: block row p
of the [b, 3b] dense triplet holds the band row's w entries at lane offset
(b - kl) + p (the pad-and-reshape identity of ops.blocktri._skew_block_rows).
XLA realizes that as a lane-misaligned pad + relayout at ~50-80 GB/s (the
~30-45 ms conversion share of tpu_factor_ms, VERDICT r4 #3).  A shift by the
ROW INDEX decomposes into log2(b) conditional full-tile rotations (a barrel
shifter): 7 pltpu.roll + iota-select stages for b=128, all dense VPU work on
lane-aligned [*, 3b] tiles — no ragged concats (those crash Mosaic), no
relayouts, contiguous HBM in/out.

Measures: kernel ms (vs the 2.3 GB HBM floor), parity vs the XLA gskew, and
the full factor path (kernel + skewed scan) vs the in-scan fused variant
(blocktri_factor_inv_waux_band) and the blocktri-native floor.

MEASURED (v5e, 2026-08-21, N=1e6 w=201 K=64 b=128):
    kernel_ms 38.6 (61 GB/s; compile 389 s)   parity exact
    fused_ms 65.4   skewed_ms 70.3 (= kernel + scan; compile 5 s)
VERDICT: the barrel shifter is NOT the answer — per-element lane-crossbar
cost (8 rotations + 7 selects over 384 lanes) lands at the same ~60 GB/s
every other formulation reaches, and Mosaic's compile time is pathological.
Together with lab_convert (XLA gather 44-63 ms, global lane-pad 34 ms,
one-hot MXU 44-63 ms, 3-stage Mosaic pipeline 113-900 s compiles) this
closes the conversion question with a measured BOUND: the band->blocktri
layout move is lane-crossbar-throughput-bound at ~60-100 GB/s in every
known XLA/Mosaic realization — only ~3 ms of it is HBM.  The in-scan fused
skew (the shipped default) already hides all but ~24 ms of that inside the
factor scan (tpu_factor_ms 93.9 band-entry vs 69.5 native); the remaining
delta is the irreducible crossbar traffic, not missing engineering.
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
from jax.experimental import pallas as pl


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll_lanes(x, s: int, roll: bool):
    if roll:
        from jax.experimental.pallas import tpu as pltpu
        return pltpu.roll(x, jnp.int32(s), 1)
    return jnp.roll(x, s, axis=1)


def _skew_kernel(in_ref, o_ref, *, b: int, w: int, off: int, roll: bool):
    G = in_ref.shape[0]
    X = in_ref[...].reshape(G * b, w)
    Y = jnp.pad(X, ((0, 0), (0, 3 * b - w)))
    Y = _roll_lanes(Y, off, roll)
    p = jax.lax.broadcasted_iota(jnp.int32, (G * b, 3 * b), 0) % b
    s = 1
    while s < b:
        Y = jnp.where((p & s) != 0, _roll_lanes(Y, s, roll), Y)
        s *= 2
    o_ref[...] = Y.reshape(G, b, 3 * b)


@partial(jax.jit, static_argnames=("b", "kl", "ku", "G"))
def band_skew_pallas(data2, b: int, kl: int, ku: int, G: int = 8):
    """[Nb*b, w] band rows -> [Nb, b, 3b] dense [L|D|U] block rows."""
    w = kl + ku + 1
    N = data2.shape[0]
    Nb = N // b
    off = b - kl
    grid = (Nb // G,)
    return pl.pallas_call(
        partial(_skew_kernel, b=b, w=w, off=off, roll=not _use_interpret()),
        grid=grid,
        in_specs=[pl.BlockSpec((G, b, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((G, b, 3 * b), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Nb, b, 3 * b), data2.dtype),
        interpret=_use_interpret(),
    )(data2.reshape(Nb, b, w))


def timed(fn, sync, reps=3):
    fn()
    sync()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        sync()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    plat = os.environ.get("PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)   # axon ignores env vars
    from spike_petsc_tpu.ops.blocktri import (
        BlockTriFactor, _sweep_matvec, batched_inverse,
        blocktri_factor_inv_waux_band)

    only = set((os.environ.get("VARIANTS") or
                "kernel,parity,fused,skewed").split(","))
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
    G = int(os.environ.get("G", 8))

    def digest(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:64])

    out = {}

    # --- kernel alone -----------------------------------------------------
    if "kernel" in only:
        t0 = time.perf_counter()
        sk = band_skew_pallas(dpad, b, k, k, G=G)
        digest(sk)
        out["kernel_compile_s"] = time.perf_counter() - t0
        print(f"kernel_compile_s: {out['kernel_compile_s']:.1f}", flush=True)
        ms = timed(lambda: band_skew_pallas(dpad, b, k, k, G=G),
                   lambda: digest(sk)) * 1e3
        out["kernel_ms"] = ms
        gb = (npad * w + npad * 3 * b) * 4 / 1e9
        out["kernel_gbps"] = gb / (ms / 1e3)
        print(f"kernel_ms: {ms:.3f}  ({out['kernel_gbps']:.0f} GB/s of "
              f"{gb:.2f} GB)", flush=True)
        del sk

    # --- parity vs the XLA gskew -----------------------------------------
    if "parity" in only:
        @jax.jit
        def gskew(ld):
            W2 = 3 * b + 1
            Kx, nbx = ld.shape[0], ld.shape[1]
            Z = jnp.pad(ld, ((0, 0), (0, 0), (0, 0),
                             (b - k, W2 - (b - k) - w)))
            return Z.reshape(Kx, nbx, b * W2)[:, :, : 3 * b * b].reshape(
                Kx, nbx, b, 3 * b)

        nsmall = 4 * b * 8
        dsm = dpad[:nsmall]
        ref = gskew(dsm.reshape(1, nsmall // b, b, w))[0]
        got = band_skew_pallas(dsm, b, k, k, G=4)
        diff = float(jnp.max(jnp.abs(ref - got)))
        out["parity_maxdiff"] = diff
        print(f"parity_maxdiff: {diff:.3e}", flush=True)
        assert diff == 0.0, "skew kernel mismatch"

    # --- factor: fused in-scan skew (current default) ---------------------
    @jax.jit
    def f_fused(ld, cb):
        return jax.vmap(partial(blocktri_factor_inv_waux_band,
                                kl=k, ku=k, b=b))(ld, cb)

    r = None
    if "fused" in only:
        r = f_fused(local4, Cb)
        out["fused_ms"] = timed(lambda: f_fused(local4, Cb),
                                lambda: digest(r)) * 1e3
        print(f"fused_ms: {out['fused_ms']:.3f}", flush=True)

    # --- factor: pallas skew + scan over [b, 3b] rows ---------------------
    def factor_scan_skewed(sk_p, y0):
        dtype = sk_p.dtype

        def step(carry, S):
            s_prev_inv, y_prev, u_prev = carry
            l, d, u = S[:, :b], S[:, b:2 * b], S[:, 2 * b:]
            f = l @ s_prev_inv
            s = d - f @ u_prev
            s_inv = batched_inverse(s[None], "auto")[0]
            y = -_sweep_matvec(f, y_prev)
            return (s_inv, y, u), (f, s_inv, y)

        d0, u0 = sk_p[0, :, b:2 * b], sk_p[0, :, 2 * b:]
        s0_inv = batched_inverse(d0[None], "auto")[0]
        (_, _, _), (f_rest, sinv_rest, y_rest) = jax.lax.scan(
            step, (s0_inv, y0, u0), sk_p[1:])
        F = jnp.concatenate([jnp.zeros((1, b, b), dtype), f_rest], axis=0)
        Sinv = jnp.concatenate([s0_inv[None], sinv_rest], axis=0)
        y = jnp.concatenate([y0[None], y_rest], axis=0)
        z = jnp.zeros((nb, 0, 0), dtype)
        zp = jnp.zeros((nb, 0), jnp.int32)
        return BlockTriFactor(F=F, U=None, Sinv=Sinv, Slu=z, piv=zp,
                              method="inv", nshift=None), y

    @jax.jit
    def f_skewed(d2, cb):
        sk_ = band_skew_pallas.__wrapped__(d2, b, k, k, G=G)
        sk_ = sk_.reshape(K, nb, b, 3 * b)
        fact, y = jax.vmap(factor_scan_skewed)(sk_, cb)
        # U blocks: lane-aligned slice of the skewed rows (zero-cost view
        # next to the scan); last block's U is a partition edge -> dropped
        U = sk_[:, :, :, 2 * b:]
        return BlockTriFactor(F=fact.F, U=U, Sinv=fact.Sinv, Slu=fact.Slu,
                              piv=fact.piv, method="inv", nshift=None), y

    if "skewed" in only:
        t0 = time.perf_counter()
        r2 = f_skewed(dpad, Cb)
        digest(r2)
        out["skewed_compile_s"] = time.perf_counter() - t0
        out["skewed_ms"] = timed(lambda: f_skewed(dpad, Cb),
                                 lambda: digest(r2)) * 1e3
        print(f"skewed_ms: {out['skewed_ms']:.3f}  (compile "
              f"{out['skewed_compile_s']:.1f}s)", flush=True)
        if r is not None:
            df = float(jnp.max(jnp.abs(r[0].F - r2[0].F)))
            ds = float(jnp.max(jnp.abs(r[0].Sinv - r2[0].Sinv)))
            dy = float(jnp.max(jnp.abs(r[1] - r2[1])))
            out["skewed_vs_fused_maxdiff"] = max(df, ds, dy)
            print(f"skewed_vs_fused_maxdiff: {out['skewed_vs_fused_maxdiff']:.3e}",
                  flush=True)
        del r2

    for kk, vv in out.items():
        print(f"{kk}: {vv:.4g}" if isinstance(vv, float) else f"{kk}: {vv}")


if __name__ == "__main__":
    main()
