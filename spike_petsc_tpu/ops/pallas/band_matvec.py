"""Pallas banded matvec: y[i] = sum_d data[i, d] * x[i + d - kl].

The minimal-traffic SpMV for band storage.  The XLA shifted-axpy form
(ops/band.py banded_matvec) reads the band once but materializes w
lane-misaligned shifted operands and measures only ~20-50 GB/s on v5e; the
block-tridiagonal conversion route (solvers/operator.py) reaches kernel
bandwidth but inflates storage to 3*128 floats per row (1.9x the band at
w=201, 30x at w=13).  This kernel streams exactly the n*w band entries:

* setup (once per operator): transpose the [n, w] diagonal-offset storage
  to diagonal-major [w, Sg, 128] tiles (``prepare_banded_mv``) — each
  diagonal is then lane-contiguous and every grid step's block is one
  dense DMA;
* per call: pad x by kl in front (so window t of the flattened tile grid
  reads xp[t] with zero lane phase) and run an auto-pipelined grid over
  row tiles of T = S*128 elements;
* in-kernel: the shift by diagonal offset d = 128 q + p decomposes into a
  lane-phase concat (one per distinct p, shared by all q — at most
  min(w, 128) shuffles) plus free sublane slices, accumulating
  acc += diag_tile[d] * window[q : q + S] on the VPU.

This fills the MatMult role of the reference's hot loop
(/root/reference/src/testbed.c:310) for bands of ANY width, where the
blocktri route only paid off at w >= ~96.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ._specs import im32

from ..band import BandedMatrix, banded_matvec


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lane_shift(xw, p: int, roll: bool):
    """[R, 128] -> [R-1, 128] flat lane shift: row s holds
    xw_flat[s*128 + p : s*128 + p + 128].

    ``roll=True`` (the Mosaic path) realizes it as two full-width lane
    rotations + an iota select — the ragged two-piece lane concat
    (xw[:-1, p:] ‖ xw[1:, :p]) crashes the TPU compiler outright
    (tpu_compile_helper exit 1, measured on v5e libtpu 2026-08); interpret
    mode lacks pltpu.roll, so it keeps the concat."""
    if roll:
        from jax.experimental.pallas import tpu as pltpu
        # int32 shift: under x64 a Python int traces as i64 and
        # tpu.dynamic_rotate rejects it
        s = jnp.int32(128 - p)
        a = pltpu.roll(xw[:-1], s, 1)
        b = pltpu.roll(xw[1:], s, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        return jnp.where(lane < 128 - p, a, b)
    return jnp.concatenate([xw[:-1, p:], xw[1:, :p]], axis=1)


def _kernel(d3_ref, xa_ref, xb_ref, o_ref, *, w: int, S: int, qmax: int,
            roll: bool = False):
    # window of S + qmax + 1 sublane rows starting at this tile's origin:
    # body block + the head of the NEXT body block (same array, two specs)
    xw = jnp.concatenate([xa_ref[...], xb_ref[: qmax + 1]], axis=0)
    acc = jnp.zeros((S, 128), jnp.float32)
    for p in range(min(w, 128)):
        if p == 0:
            xr = xw                                     # [S + qmax + 1, 128]
        else:
            # flat shift by p lanes: row s of xr holds xw_flat[s*128 + p ...]
            xr = _lane_shift(xw, p, roll)
        for q in range(qmax + 1):
            d = 128 * q + p
            if d < w:
                acc = acc + d3_ref[d].astype(jnp.float32) * xr[q:q + S]
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_S(w: int, itemsize: int) -> int:
    """Sublane rows per grid step: the largest multiple of 8 whose
    double-buffered [w, S, 128] diagonal block fits the VMEM budget."""
    from .fused_sweep import _budget
    S = max(8, int(_budget() * 0.7) // (2 * w * 128 * itemsize) // 8 * 8)
    return min(S, 512)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PreparedBandMV:
    """One-time diagonal-major layout for the Pallas banded matvec.

    Attributes:
      d3: [w, NBg * S, 128]; d3[d, a, l] = A[128 a + l, 128 a + l + d - kl]
          (zero where out of range).
      kl/ku/n: the source band's shape (static).
      S: sublane rows per grid step (static).
    """

    d3: jax.Array
    kl: int = field(metadata=dict(static=True))
    ku: int = field(metadata=dict(static=True))
    n: int = field(metadata=dict(static=True))
    S: int = field(metadata=dict(static=True))

    @property
    def w(self) -> int:
        return self.kl + self.ku + 1


def default_band_mv_S(w: int, n: int, dtype=jnp.float32) -> int:
    """Default sublane rows per grid step for an n-row band of width w.

    The SINGLE source of truth for the kernel's tile sizing: used by
    ``prepare_banded_mv`` (``S=None``) and by the distributed factories in
    ``parallel/spike_dist.py``, whose per-shard tiles must match the kernel
    layout exactly.  Caps at one-tile coverage of the n rows."""
    return min(_pick_S(w, jnp.dtype(dtype).itemsize),
               max(8, -(-n // 128) // 8 * 8))


def banded_mv_feasible(bm_or_w, n: int = None, dtype=jnp.float32) -> bool:
    """True when the Pallas banded kernel handles this band: fixed-width
    dtypes only (no emulated f64 pairs on TPU), w small enough that the
    unrolled lane-phase loop stays compilable, n big enough to fill a tile."""
    if isinstance(bm_or_w, BandedMatrix):
        w, n, dtype = bm_or_w.width, bm_or_w.n, bm_or_w.dtype
    else:
        w = int(bm_or_w)
        if n is None:
            raise ValueError(
                "banded_mv_feasible(width) needs n= (the feasibility gate "
                "includes a minimum problem size)")
    return (jnp.dtype(dtype).itemsize <= 4 and 3 <= w <= 512
            and n >= 2 * 128)


def prepare_banded_mv(bm: BandedMatrix, S: int = None) -> PreparedBandMV:
    """Transpose band storage to the kernel's diagonal-major tile layout.

    One pass over the band (cheap next to the blocktri conversion this
    replaces); hold the result for the lifetime of the operator — Krylov
    loops amortize it over every iteration.
    """
    if not banded_mv_feasible(bm):
        raise ValueError(
            f"banded Pallas matvec infeasible for w={bm.width}, n={bm.n}, "
            f"dtype={bm.dtype}; use ops.band.banded_matvec")
    w, n = bm.width, bm.n
    if S is None:
        S = default_band_mv_S(w, n, bm.dtype)
    T = S * 128
    NBg = -(-n // T)
    d3 = jnp.pad(bm.data, ((0, NBg * T - n), (0, 0))).T.reshape(w, NBg * S, 128)
    return PreparedBandMV(d3=d3, kl=bm.kl, ku=bm.ku, n=n, S=S)


@jax.jit
def banded_matvec_prepared(prep: PreparedBandMV, x: jax.Array) -> jax.Array:
    """y = A @ x from the prepared layout; x [n] in a fixed-width dtype."""
    w, S, n = prep.w, prep.S, prep.n
    qmax = (w - 1) // 128
    Sg = prep.d3.shape[1]
    NBg = Sg // S
    # xp[t] = x[t - kl]; one extra body block so spec B (the i+1 block) stays
    # in range on the last step
    xp = jnp.pad(x, (prep.kl, (NBg + 1) * S * 128 - prep.kl - n))
    xp = xp.reshape((NBg + 1) * S, 128)

    interp = _use_interpret()
    kern = partial(_kernel, w=w, S=S, qmax=qmax, roll=not interp)
    y = pl.pallas_call(
        kern,
        grid=(NBg,),
        in_specs=[
            pl.BlockSpec((w, S, 128), im32(lambda i: (0, i, 0))),
            pl.BlockSpec((S, 128), im32(lambda i: (i, 0))),
            pl.BlockSpec((S, 128), im32(lambda i: (i + 1, 0))),
        ],
        out_specs=pl.BlockSpec((S, 128), im32(lambda i: (i, 0))),
        out_shape=jax.ShapeDtypeStruct((Sg, 128), x.dtype),
        interpret=interp,
    )(prep.d3, xp, xp)
    return y.reshape(-1)[:n]


def banded_matvec_pallas(bm: BandedMatrix, x: jax.Array) -> jax.Array:
    """Convenience one-shot form (prepares the layout per call — inside a
    solver loop use prepare_banded_mv once + banded_matvec_prepared)."""
    if not banded_mv_feasible(bm):
        return banded_matvec(bm, x)
    return banded_matvec_prepared(prepare_banded_mv(bm), x)


# ---------------------------------------------------------------------------
# Emulated-f64 (double-f32) variant: the residual matvec of the on-TPU
# high-accuracy refinement path.  XLA's x64 emulation of the shifted-axpy
# banded matvec pays the same misaligned-operand penalty as the f32 form
# (37.5 ms at N=1e6 bw=201 on v5e); this kernel streams the split hi/lo
# pairs (same bytes as f64) and does compensated Dekker/two-sum arithmetic
# on the VPU, keeping ~1e-15 effective precision at f32 port widths.
# ---------------------------------------------------------------------------

def _split(a):
    """Exact 12|12-bit split of f32 by mantissa masking.

    The classic Dekker split (c = 4097*a; h = c - (c - a)) is destroyed by
    fma contraction: XLA:CPU fuses the multiply into the subtraction at
    sufficient program size (measured: exact at w <= 113 unrolled diagonals,
    ~1e-7 at w >= 121), and Mosaic may contract too.  Masking the low 12
    mantissa bits involves no multiply, so there is nothing to contract;
    h carries <= 12 significant bits, l = a - h is exact, and all four
    half-products in the Dekker multiplication stay exact."""
    h = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(a, jnp.uint32) & jnp.uint32(0xFFFFF000),
        jnp.float32)
    return h, a - h


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _kernel_df64(dh_ref, dl_ref, xah_ref, xal_ref, xbh_ref, xbl_ref,
                 oh_ref, ol_ref, *, w: int, S: int, qmax: int,
                 roll: bool = False):
    f32 = jnp.float32
    xwh = jnp.concatenate([xah_ref[...], xbh_ref[: qmax + 1]], axis=0)
    xwl = jnp.concatenate([xal_ref[...], xbl_ref[: qmax + 1]], axis=0)
    # split the window ONCE (each x element is reused by up to w diagonals)
    xw1, xw2 = _split(xwh)
    shi = jnp.zeros((S, 128), f32)
    slo = jnp.zeros((S, 128), f32)
    for p in range(min(w, 128)):
        if p == 0:
            x1, x2, xl = xw1, xw2, xwl
        else:
            x1 = _lane_shift(xw1, p, roll)
            x2 = _lane_shift(xw2, p, roll)
            xl = _lane_shift(xwl, p, roll)
        for q in range(qmax + 1):
            d = 128 * q + p
            if d < w:
                dh = dh_ref[d]
                dl = dl_ref[d]
                d1, d2 = _split(dh)
                x1q, x2q, xlq = x1[q:q + S], x2[q:q + S], xl[q:q + S]
                xh = x1q + x2q                       # reconstruct hi part
                ph = dh * xh                          # product hi
                # Dekker: exact error of dh*xh from the four half-products
                perr = ((d1 * x1q - ph) + d1 * x2q + d2 * x1q) + d2 * x2q
                cross = dh * xlq + dl * xh            # first-order lo terms
                shi, e = _two_sum(shi, ph)
                slo = slo + (e + (perr + cross))
    oh_ref[...] = shi
    ol_ref[...] = slo


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PreparedBandMVF64:
    """Split hi/lo diagonal-major layout for the emulated-f64 matvec."""

    d3hi: jax.Array
    d3lo: jax.Array
    kl: int = field(metadata=dict(static=True))
    ku: int = field(metadata=dict(static=True))
    n: int = field(metadata=dict(static=True))
    S: int = field(metadata=dict(static=True))

    @property
    def w(self) -> int:
        return self.kl + self.ku + 1


def prepare_banded_mv_f64(bm: BandedMatrix, S: int = None) -> PreparedBandMVF64:
    """Split an f64 band into (hi, lo) f32 pairs in the kernel's
    diagonal-major layout.  Requires x64 enabled (the source band is f64)."""
    if not banded_mv_feasible(bm.width, n=bm.n, dtype=jnp.float32):
        raise ValueError(
            f"banded df64 Pallas matvec infeasible for w={bm.width}, "
            f"n={bm.n}; use ops.band.banded_matvec under x64")
    w, n = bm.width, bm.n
    if S is None:
        # two streamed diagonal arrays -> same VMEM budget split across both
        S = min(_pick_S(w, 2 * 4),
                max(8, -(-n // 128) // 8 * 8))
    T = S * 128
    NBg = -(-n // T)
    d64 = jnp.pad(bm.data, ((0, NBg * T - n), (0, 0)))
    dhi = d64.astype(jnp.float32)
    dlo = (d64 - dhi.astype(d64.dtype)).astype(jnp.float32)
    shape = (w, NBg * S, 128)
    return PreparedBandMVF64(d3hi=dhi.T.reshape(shape),
                             d3lo=dlo.T.reshape(shape),
                             kl=bm.kl, ku=bm.ku, n=n, S=S)


@jax.jit
def banded_matvec_prepared_f64(prep: PreparedBandMVF64,
                               x: jax.Array) -> jax.Array:
    """y = A @ x with ~1e-15 effective precision; x and y are f64 (the
    split/merge at the boundary is cheap XLA elementwise work — the w-wide
    compensated accumulation runs inside the kernel).

    TPU-targeted: Mosaic compiles the kernel directly and preserves the
    error-free transforms.  The CPU interpret path does NOT reliably: XLA:CPU
    codegen reassociates floating point inside large compiled clusters
    (shape-dependently; measured ~1e-7 instead of ~1e-14 at w >= ~121 even
    with fast-math and fusion emitters disabled, while eager evaluation of
    the identical kernel jaxpr is exact to ~1e-13).  On CPU, plain
    ops.band.banded_matvec under x64 is native f64 — use that; the
    interpret path here is for plumbing tests only."""
    w, S, n = prep.w, prep.S, prep.n
    qmax = (w - 1) // 128
    Sg = prep.d3hi.shape[1]
    NBg = Sg // S
    xp = jnp.pad(x.astype(jnp.float64),
                 (prep.kl, (NBg + 1) * S * 128 - prep.kl - n))
    xph = xp.astype(jnp.float32)
    xpl = (xp - xph.astype(xp.dtype)).astype(jnp.float32)
    xph = xph.reshape((NBg + 1) * S, 128)
    xpl = xpl.reshape((NBg + 1) * S, 128)

    interp = _use_interpret()
    kern = partial(_kernel_df64, w=w, S=S, qmax=qmax, roll=not interp)
    mat = pl.BlockSpec((w, S, 128), im32(lambda i: (0, i, 0)))
    body = pl.BlockSpec((S, 128), im32(lambda i: (i, 0)))
    nxt = pl.BlockSpec((S, 128), im32(lambda i: (i + 1, 0)))
    out = pl.BlockSpec((S, 128), im32(lambda i: (i, 0)))
    yh, yl = pl.pallas_call(
        kern,
        grid=(NBg,),
        in_specs=[mat, mat, body, body, nxt, nxt],
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((Sg, 128), jnp.float32),
                   jax.ShapeDtypeStruct((Sg, 128), jnp.float32)),
        interpret=interp,
    )(prep.d3hi, prep.d3lo, xph, xpl, xph, xpl)
    # the barrier between the converts and the add is insurance against
    # algebraic-simplifier convert folding (add(convert(a), convert(b)) ->
    # convert(add_f32(a, b)) would erase the compensated lo part); the
    # fusion-emitter reassociation hazard on CPU needs the conftest flag
    # instead — see the docstring
    yh64, yl64 = jax.lax.optimization_barrier(
        (yh.astype(jnp.float64), yl.astype(jnp.float64)))
    y = yh64 + yl64
    return y.reshape(-1)[:n]
