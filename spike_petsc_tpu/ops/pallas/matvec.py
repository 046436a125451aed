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

    mat = pl.BlockSpec((ktp, b, b), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((ktp, b), lambda i: (i, 0))
    y = pl.pallas_call(
        _kernel,
        grid=(nbp // ktp,),
        in_specs=[mat, mat, mat, vec, vec, vec],
        out_specs=vec,
        out_shape=jax.ShapeDtypeStruct((nbp, b), x.dtype),
        interpret=_use_interpret(),
    )(D, L, U, xm, xc, xp)
    return y[:nb]
