"""Pallas block-tridiagonal matvec: y_i = L_i x_{i-1} + D_i x_i + U_i x_{i+1}.

The XLA batched-GEMV formulation runs at ~40 GB/s on v5e (127/128 MXU
columns idle, lane-reduction lowering); this kernel streams the D/L/U
blocks with the auto-pipelined grid (the same contiguous access pattern
the fused sweep drives at 727 GB/s) and does the b x b matvecs on the VPU.
No sequential dependency — each grid step is independent.

This is the fast SpMV for Krylov iterations over banded operators: convert
the band once (band_to_blocktri, amortized over the solve) and matvec at
memory speed — replacing PETSc's AIJ MatMult role
(/root/reference/src/testbed.c:310).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ._specs import im32, x64_safe
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(d_ref, l_ref, u_ref, xm_ref, xc_ref, xp_ref, o_ref):
    xm = xm_ref[...]                                   # [kt, b]
    xc = xc_ref[...]
    xp = xp_ref[...]
    y = (jnp.sum(d_ref[...] * xc[:, None, :], axis=-1)
         + jnp.sum(l_ref[...] * xm[:, None, :], axis=-1)
         + jnp.sum(u_ref[...] * xp[:, None, :], axis=-1))
    o_ref[...] = y


@partial(jax.jit, static_argnames=("kt",))
def blocktri_matvec_pallas(T, x: jax.Array, kt: int = 8) -> jax.Array:
    """y = T @ x for a BlockTridiagonal T ([nb, b, b] blocks), x [nb, b].

    ``kt`` blocks per grid step (must divide nb after padding; padded
    automatically).  Carries f32-or-wider accumulation in the x dtype.
    """
    nb, b = T.nb, T.b
    ktp = min(kt, nb)
    nbp = -(-nb // ktp) * ktp
    pad = nbp - nb

    def padb(a):
        return jnp.pad(a, ((0, pad), (0, 0), (0, 0))) if pad else a

    D, L, U = padb(T.D), padb(T.L), padb(T.U)
    # guard rows so x_{i-1}/x_{i+1} reads at the ends see zeros
    xg = jnp.pad(x, ((1, 1 + pad), (0, 0)))

    # neighbour reads via three shifted views (block-index offsets can only
    # step in whole blocks; the shift needed is one ROW of blocks)
    xm = jax.lax.dynamic_slice_in_dim(xg, 0, nbp, axis=0)
    xc = jax.lax.dynamic_slice_in_dim(xg, 1, nbp, axis=0)
    xp = jax.lax.dynamic_slice_in_dim(xg, 2, nbp, axis=0)

    mat = pl.BlockSpec((ktp, b, b), im32(lambda i: (i, 0, 0)))
    vec = pl.BlockSpec((ktp, b), im32(lambda i: (i, 0)))
    y = pl.pallas_call(
        _kernel,
        grid=(nbp // ktp,),
        in_specs=[mat, mat, mat, vec, vec, vec],
        out_specs=vec,
        out_shape=jax.ShapeDtypeStruct((nbp, b), x.dtype),
        interpret=_use_interpret(),
    )(D, L, U, xm, xc, xp)
    return y[:nb]


# ---------------------------------------------------------------------------
# Manual-DMA variant: the auto-pipelined grid above pays a per-grid-step cost
# that caps it at ~230 GB/s (≈1000 steps at kt=8); this kernel follows the
# fused sweep's recipe (fused_sweep.py) — few grid steps, an in-kernel
# fori_loop streaming the D/L/U blocks HBM->VMEM through an nbuf-deep
# make_async_copy pipeline — which measures ~700 GB/s factor streaming on
# v5e.  Unlike the sweeps there is no sequential dependency, so every
# (chunk, block) pair is independent.
# ---------------------------------------------------------------------------

def _mv_dma_kernel(d_hbm, l_hbm, u_hbm, xm_ref, xc_ref, xp_ref, o_ref,
                   dbuf, lbuf, ubuf, dsem, lsem, usem, *, kt, nbk, nbuf):
    c = pl.program_id(0)
    part = pl.ds(c * kt, kt)
    cdtype = o_ref.dtype

    def dmas(slot, i):
        return (pltpu.make_async_copy(d_hbm.at[part, i], dbuf.at[slot],
                                      dsem.at[slot]),
                pltpu.make_async_copy(l_hbm.at[part, i], lbuf.at[slot],
                                      lsem.at[slot]),
                pltpu.make_async_copy(u_hbm.at[part, i], ubuf.at[slot],
                                      usem.at[slot]))

    for s in range(min(nbuf, nbk)):
        for cp in dmas(s, s):
            cp.start()

    def body(i, carry):
        slot = i % nbuf
        for cp in dmas(slot, i):
            cp.wait()
        d = dbuf[slot].astype(cdtype)
        lm = lbuf[slot].astype(cdtype)
        um = ubuf[slot].astype(cdtype)
        y = (jnp.sum(d * xc_ref[:, i][:, None, :], axis=-1)
             + jnp.sum(lm * xm_ref[:, i][:, None, :], axis=-1)
             + jnp.sum(um * xp_ref[:, i][:, None, :], axis=-1))

        @pl.when(i + nbuf < nbk)
        def _():
            for cp in dmas(slot, i + nbuf):
                cp.start()

        o_ref[:, i] = y
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nbk), body, jnp.int32(0), unroll=False)


def _pick_mv_geometry(nb: int, b: int, itemsize: int, nbuf: int):
    """(Kc, kt, nbk): chunk the block axis into Kc rows of nbk blocks, kt
    chunks per grid step, sized so 3*nbuf mat buffers + 4 double-buffered
    [kt, nbk, b] vector blocks fit the VMEM budget.

    Returns None when no geometry fits — even kt=1, nbk=1 exceeds VMEM
    (3*nbuf single b x b blocks alone; b >= ~350 f32 at the default
    budget) — so callers can fall back to the XLA matvec instead of
    looping forever shrinking the wrong dimension (code-review r3)."""
    from .fused_sweep import _budget
    mats1 = 3 * nbuf * b * b * itemsize          # kt=1 matrix buffers
    if mats1 + 4 * 2 * b * 4 > _budget():
        return None
    kt = 8
    Kc = 64
    while True:
        nbk = -(-nb // Kc)
        mats = 3 * nbuf * kt * b * b * itemsize
        vecs = 4 * 2 * kt * nbk * b * 4
        if mats + vecs <= _budget():
            return Kc, kt, nbk
        if kt > 1:
            kt //= 2
        else:
            Kc *= 2


def mv_padded_nb(nb: int, b: int, itemsize: int = 4, nbuf: int = 4) -> int:
    """Block count the DMA matvec kernel wants (nb rounded up to its chunk
    grid).  Callers holding a long-lived operator should pad their
    BlockTridiagonal to this count ONCE (zero blocks) — inside a solver
    loop, a per-call pad of the [nb, b, b] arrays costs ~2x the kernel
    itself in pure copy traffic (measured: 6.9 ms padded-per-call vs 2.0 ms
    pre-padded at N=1e6, b=128 on v5e)."""
    geom = _pick_mv_geometry(nb, b, itemsize, nbuf)
    if geom is None:        # DMA kernel infeasible -> XLA path, no padding
        return nb
    Kc, _, nbk = geom
    return Kc * nbk


def _mv_dma_call(D, L, U, xm, xc, xp, kt: int, nbuf: int):
    """Chunked core: D/L/U [Kc, nbk, b, b], vectors [Kc, nbk, b]; kt must
    divide Kc.  Returns y [Kc, nbk, b] in the vector dtype."""
    Kc, nbk, b, _ = D.shape
    kern = partial(_mv_dma_kernel, kt=kt, nbk=nbk, nbuf=nbuf)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    vec = pl.BlockSpec((kt, nbk, b), im32(lambda c: (c, 0, 0)),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(Kc // kt,),
        in_specs=[hbm, hbm, hbm, vec, vec, vec],
        out_specs=vec,
        out_shape=jax.ShapeDtypeStruct((Kc, nbk, b), xc.dtype),
        scratch_shapes=[
            pltpu.VMEM((nbuf, kt, b, b), D.dtype),
            pltpu.VMEM((nbuf, kt, b, b), D.dtype),
            pltpu.VMEM((nbuf, kt, b, b), D.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=_use_interpret(),
    )(D, L, U, xm, xc, xp)


def _shift3(x, nbp):
    """(x_{i-1}, x_i, x_{i+1}) views of the zero-guarded block vector."""
    xg = jnp.pad(x, ((1, 1 + (nbp - x.shape[0])), (0, 0)))
    xm = jax.lax.dynamic_slice_in_dim(xg, 0, nbp, axis=0)
    xc = jax.lax.dynamic_slice_in_dim(xg, 1, nbp, axis=0)
    xp = jax.lax.dynamic_slice_in_dim(xg, 2, nbp, axis=0)
    return xm, xc, xp


@x64_safe
@partial(jax.jit, static_argnames=("nbuf",))
def blocktri_matvec_dma(T, x: jax.Array, nbuf: int = 4) -> jax.Array:
    """y = T @ x via the manual-DMA streaming kernel ([nb, b, b] blocks,
    x [nb, b]).  Factor blocks may be narrower than f32 (promoted
    in-register); the carry/output dtype follows x.

    For best performance pre-pad T to ``mv_padded_nb(nb, b)`` blocks — the
    in-call fallback pad below copies the full matrix every call."""
    nb, b = T.nb, T.b
    itemsize = jnp.dtype(T.dtype).itemsize
    geom = _pick_mv_geometry(nb, b, itemsize, nbuf)
    if geom is None:        # block too large for VMEM: XLA matvec fallback
        from ..blocktri import blocktri_matvec
        return blocktri_matvec(T, x)
    Kc, kt, nbk = geom
    nbp = Kc * nbk
    pad = nbp - nb

    def padb(a):
        return jnp.pad(a, ((0, pad), (0, 0), (0, 0))) if pad else a

    D = padb(T.D).reshape(Kc, nbk, b, b)
    L = padb(T.L).reshape(Kc, nbk, b, b)
    U = padb(T.U).reshape(Kc, nbk, b, b)
    xm, xc, xp = (v.reshape(Kc, nbk, b) for v in _shift3(x, nbp))
    y = _mv_dma_call(D, L, U, xm, xc, xp, kt, nbuf)
    return y.reshape(nbp, b)[:nb]


@partial(jax.jit, static_argnames=("nbuf",))
def blocktri_matvec_dma_chunked(T, x: jax.Array, nbuf: int = 4) -> jax.Array:
    """y = T @ x for pre-chunked blocks [Kc, nbk, b, b] and x [Kc, nbk, b],
    where the flattened Kc*nbk sequence is one global block-tridiagonal
    system (chunk boundaries carry coupling through L/U as usual).

    The distributed path's natural entry: its per-device blocks are already
    [ppd, nb, b, b], so partitioning doubles as the kernel's chunk grid —
    no pad, no copy.  Falls back to flatten+pad when kt can't divide Kc
    within the VMEM budget."""
    Kc, nbk, b, _ = T.D.shape
    from .fused_sweep import _budget
    itemsize = jnp.dtype(T.D.dtype).itemsize

    def fits(kt):
        return (3 * nbuf * kt * b * b * itemsize
                + 4 * 2 * kt * nbk * b * 4) <= _budget()
    kt = next((t for t in range(min(8, Kc), 0, -1)
               if Kc % t == 0 and fits(t)), None)
    flatT = None
    if kt is None:
        from ..blocktri import BlockTridiagonal
        flatT = BlockTridiagonal(D=T.D.reshape(Kc * nbk, b, b),
                                 L=T.L.reshape(Kc * nbk, b, b),
                                 U=T.U.reshape(Kc * nbk, b, b))
        return blocktri_matvec_dma(
            flatT, x.reshape(Kc * nbk, b), nbuf=nbuf).reshape(Kc, nbk, b)
    nbp = Kc * nbk
    xm, xc, xp = (v.reshape(Kc, nbk, b)
                  for v in _shift3(x.reshape(nbp, b), nbp))
    return _mv_dma_call(T.D, T.L, T.U, xm, xc, xp, kt, nbuf)
