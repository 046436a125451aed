"""Band->blocktri conversion strategies, measured on the real TPU.

The conversion feeds the factor pipeline; at N=1e6 bw=201 it was 69 ms as a
dynamic gather (round-1 impl) out of a 140 ms factor.  Candidates:

  gather     dynamic-index gather over the band columns (round-1 impl)
  skew       pad + flat-reshape skew, blocks become static slices
  slices     per-row static slices, python-unrolled over p (128 slices)
  slices_t   like slices but building [b, nb, b] then transposing
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
    w = 2 * k + 1
    kl = ku = k
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    m = ((n + K - 1) // K + b - 1) // b * b
    nbK = K * (m // b)
    data = jax.random.uniform(key, (nbK * b, w), dtype)
    dat3 = data.reshape(nbK, b, w)

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

    def per_call(fn, reps=3):
        timed(fn)
        return min(timed(fn) for _ in range(reps))

    @jax.jit
    def conv_gather(d3):
        p = jnp.arange(b)[:, None]
        q = jnp.arange(b)[None, :]

        def gather(o):
            j = o * b + q - p + kl
            valid = (j >= 0) & (j < w)
            jc = jnp.clip(j, 0, w - 1)
            return jnp.where(valid, d3[:, p, jc], 0)

        return gather(0), gather(1), gather(-1)

    @jax.jit
    def conv_skew(d3):
        pl = max(2 * b - kl - 1, 0)
        pr = max(2 * b - ku, 1)
        wp = pl + w + pr
        padded = jnp.pad(d3, ((0, 0), (0, 0), (pl, pr)))
        skew = padded.reshape(nbK, b * wp)[:, :b * (wp - 1)].reshape(
            nbK, b, wp - 1)
        base = pl + kl
        return (skew[:, :, base:base + b],
                skew[:, :, base + b:base + 2 * b],
                skew[:, :, base - b:base])

    @jax.jit
    def conv_slices(d3):
        padded = jnp.pad(d3, ((0, 0), (0, 0), (2 * b, 2 * b)))

        def block(o):
            rows = [padded[:, p:p + 1, 2 * b + kl + o * b - p:
                           2 * b + kl + o * b - p + b] for p in range(b)]
            return jnp.concatenate(rows, axis=1)

        return block(0), block(1), block(-1)

    @jax.jit
    def conv_slices_t(d3):
        padded = jnp.pad(d3, ((0, 0), (0, 0), (2 * b, 2 * b)))

        def block(o):
            rows = [padded[:, p, 2 * b + kl + o * b - p:
                           2 * b + kl + o * b - p + b] for p in range(b)]
            return jnp.stack(rows, axis=0).swapaxes(0, 1)

        return block(0), block(1), block(-1)

    def make_conv_mxu(precision):
        # one-hot contraction: out[n, p, q'] = sum_j d3[n, p, j] E[p, j, q']
        # with E[p, j, q'] = [q' - b - p == j - kl] covering block offsets
        # -1, 0, +1 as q' slabs.  Rides the MXU; exact whenever each MXU
        # pass multiplies by exact 1.0 (bf16 splits reconstruct x * 1).
        p = np.arange(b)[:, None, None]
        j = np.arange(w)[None, :, None]
        qp = np.arange(3 * b)[None, None, :]
        E = jnp.asarray((qp - b - p == j - kl).astype(np.float32))

        @jax.jit
        def conv(d3):
            out = jax.lax.dot_general(
                d3, E, dimension_numbers=(((2,), (1,)), ((), ())),
                precision=precision)
            # d3 [nbK, b, w] x E [b, w, 3b] -> [nbK, b, b, 3b] contracting j
            # with p free on both sides; take the matching-p diagonal via
            # batched dims instead:
            return out

        @jax.jit
        def conv_batched(d3):
            # batch over p: lhs dim 1 <-> rhs dim 0
            out = jax.lax.dot_general(
                d3, E, dimension_numbers=(((2,), (1,)), ((1,), (0,))),
                precision=precision)                  # [b, nbK, 3b]
            out = jnp.swapaxes(out, 0, 1)             # [nbK, b, 3b]
            return (out[:, :, b:2 * b], out[:, :, 2 * b:],
                    out[:, :, :b])
        return conv_batched

    def make_conv_pallas(Kt):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(d_ref, o_ref):
            p = pl.program_id(1)
            j = jax.lax.broadcasted_iota(jnp.int32, (w, 3 * b), 0)
            q = jax.lax.broadcasted_iota(jnp.int32, (w, 3 * b), 1)
            E = (q == j - kl + b + p).astype(jnp.float32)
            x = d_ref[:, 0, :]
            o_ref[:, 0, :] = jax.lax.dot(
                x, E, precision=jax.lax.Precision.HIGHEST)

        @jax.jit
        def conv(d3):
            out = pl.pallas_call(
                kern,
                grid=(nbK // Kt, b),
                in_specs=[pl.BlockSpec((Kt, 1, w), lambda nc, p: (nc, p, 0))],
                out_specs=pl.BlockSpec((Kt, 1, 3 * b),
                                       lambda nc, p: (nc, p, 0)),
                out_shape=jax.ShapeDtypeStruct((nbK, b, 3 * b), jnp.float32),
            )(d3)
            return (out[:, :, b:2 * b], out[:, :, 2 * b:], out[:, :, :b])
        return conv

    def make_conv_pallas2(Kt):
        from jax.experimental import pallas as pl

        wpad = 256
        prec = jax.lax.Precision.HIGHEST

        def kern(d_ref, o_ref):
            p = pl.program_id(1)
            j = jax.lax.broadcasted_iota(jnp.int32, (wpad, 3 * b), 0)
            q = jax.lax.broadcasted_iota(jnp.int32, (wpad, 3 * b), 1)
            E = (q == j - kl + b + p).astype(jnp.float32)
            o_ref[...] = jax.lax.dot(d_ref[...], E, precision=prec)

        @jax.jit
        def conv(d3):
            dp = jnp.pad(d3, ((0, 0), (0, 0), (0, wpad - w)))
            d2 = dp.reshape(nbK, b * wpad)
            out = pl.pallas_call(
                kern,
                grid=(nbK // Kt, b),
                in_specs=[pl.BlockSpec((Kt, wpad), lambda nc, p: (nc, p))],
                out_specs=pl.BlockSpec((Kt, 3 * b), lambda nc, p: (nc, p)),
                out_shape=jax.ShapeDtypeStruct((nbK, b * 3 * b),
                                               jnp.float32),
            )(d2)
            o3 = out.reshape(nbK, b, 3 * b)
            return (o3[:, :, b:2 * b], o3[:, :, 2 * b:], o3[:, :, :b])
        return conv

    res = {}
    ref = None
    for name, fn in [("pallas2_kt328", make_conv_pallas2(328)),
                     ("pallas2_kt984", make_conv_pallas2(984)),
                     ("gather", conv_gather), ("skew", conv_skew),
                     ("slices", conv_slices), ("slices_t", conv_slices_t),
                     ("mxu_high", make_conv_mxu(jax.lax.Precision.HIGH)),
                     ("mxu_highest", make_conv_mxu(jax.lax.Precision.HIGHEST))]:
        out = fn(dat3)
        sync(out)
        if ref is None:
            ref = [np.asarray(o[:2]) for o in out]
        elif name != "mxu_high":   # bf16_3x drops the 3rd split: ~1e-5 off
            for r, o in zip(ref, out):
                np.testing.assert_allclose(np.asarray(o[:2]), r, atol=0)
        res[name + "_ms"] = round(per_call(lambda: fn(dat3)) * 1e3, 2)
        print(name, res[name + "_ms"], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
