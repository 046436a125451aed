"""Pallas TPU kernels for the block-Thomas solve sweeps.

The solve's cost is streaming the factor blocks (F, Sinv, U) from HBM once
per sweep; the math per step is a batched [K, b, b] @ [K, b] matvec.  XLA's
``lax.scan`` version reaches only a fraction of HBM bandwidth (per-step
overheads, no cross-iteration prefetch).  These kernels express each sweep as
a Pallas grid over (partition-chunk, block index) with

  * a chunk of Kt partitions processed per grid step (sized to VMEM: two
    double-buffered [Kt, b, b] factor blocks must fit),
  * factor blocks auto-pipelined by the Pallas BlockSpec machinery (the next
    block's DMA overlaps the current step's compute),
  * the running carry y_{i-1} / x_{i+1} held in VMEM scratch across the inner
    grid dimension (TPU grids iterate the last dimension fastest, so the
    carry is private to each partition chunk),

i.e. the double-buffering pattern of the Pallas guide applied to a recurrence.
Factor blocks may be stored bf16 (see blocktri.cast_factor): they are read at
half the bytes and promoted in-register; carries stay f32.

Forward sweep:   y_0 = r_0,            y_i = r_i - F_i y_{i-1}
Backward sweep:  x_{nb-1} = S^{-1} y,  x_i = S^{-1}_i (y_i - U_i x_{i+1})
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ._specs import im32
from jax.experimental.pallas import tpu as pltpu

# conservative: besides the two double-buffered factor blocks, the compiler
# stages in-register promotions/intermediates that also land in scoped vmem
_VMEM_BUDGET = 6 * 1024 * 1024


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chunk_size(K: int, b: int, itemsize: int, n_mats: int = 2) -> int:
    """Largest Kt dividing K with ``n_mats`` double-buffered [Kt, b, b]
    factor blocks inside the VMEM budget.  The forward sweep streams one
    matrix (F) and can take twice the chunk of the backward sweep (Sinv+U)."""
    per_part = 2 * n_mats * b * b * itemsize   # n_mats x 2 pipeline buffers
    kt = max(1, min(K, _VMEM_BUDGET // per_part))
    while K % kt:
        kt -= 1
    return kt


def _batched_matvec(m, v, precision):
    # precision is chosen from the STORED factor dtype: f32 factors need
    # HIGHEST (the MXU's default f32 path truncates inputs to bf16 — and the
    # sweep is memory-bound, so the extra passes are free); bf16 factors are
    # already bf16-native, single default-precision pass loses nothing
    return jax.lax.dot_general(
        m, v[:, :, None],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=v.dtype,
        precision=precision)[:, :, 0]


def _fwd_kernel(f_ref, r_ref, y_ref, carry_ref, *, precision):
    # vectors carry a singleton axis ([Kt, 1, 1, b]) so their last two block
    # dims equal the array dims — a Pallas TPU lowering requirement
    i = pl.program_id(1)
    r = r_ref[:, 0, 0, :]                                  # [Kt, b]

    @pl.when(i == 0)
    def _():
        carry_ref[:, :] = r

    @pl.when(i > 0)
    def _():
        f = f_ref[:, 0, :, :].astype(carry_ref.dtype)      # [Kt, b, b]
        carry_ref[:, :] = r - _batched_matvec(f, carry_ref[:, :], precision)

    y_ref[:, 0, 0, :] = carry_ref[:, :]


def _bwd_kernel(sinv_ref, u_ref, y_ref, x_ref, carry_ref, *, precision):
    i = pl.program_id(1)
    y = y_ref[:, 0, 0, :]
    sinv = sinv_ref[:, 0, :, :].astype(carry_ref.dtype)

    @pl.when(i == 0)
    def _():
        carry_ref[:, :] = _batched_matvec(sinv, y, precision)

    @pl.when(i > 0)
    def _():
        u = u_ref[:, 0, :, :].astype(carry_ref.dtype)
        t = y - _batched_matvec(u, carry_ref[:, :], precision)
        carry_ref[:, :] = _batched_matvec(sinv, t, precision)

    x_ref[:, 0, 0, :] = carry_ref[:, :]


@jax.jit
def blocktri_solve_batched_pallas(fact, rhs: jax.Array) -> jax.Array:
    """Batched block-Thomas solve via Pallas sweep kernels.

    fact: BlockTriFactor with leading partition dim K (method "inv").
    rhs:  [K, nb, b].  Returns x: [K, nb, b] (f32, or f64 under x64).
    """
    if fact.method != "inv":
        raise ValueError("pallas sweeps require method='inv' factors")
    K, nb, b, _ = fact.F.shape
    itemsize = jnp.dtype(fact.F.dtype).itemsize
    kt_f = _chunk_size(K, b, itemsize, n_mats=1)
    kt_b = _chunk_size(K, b, itemsize, n_mats=2)
    interpret = _use_interpret()

    def mat_spec(kt: int, rev: bool):
        return pl.BlockSpec(
            (kt, 1, b, b),
            im32((lambda c, i: (c, nb - 1 - i, 0, 0)) if rev else
                 (lambda c, i: (c, i, 0, 0))),
            memory_space=pltpu.VMEM)

    def vec_spec(kt: int, rev: bool):
        return pl.BlockSpec(
            (kt, 1, 1, b),
            im32((lambda c, i: (c, nb - 1 - i, 0, 0)) if rev else
                 (lambda c, i: (c, i, 0, 0))),
            memory_space=pltpu.VMEM)

    cdtype = jnp.result_type(rhs.dtype, jnp.float32)
    precision = (jax.lax.Precision.DEFAULT if itemsize < 4
                 else jax.lax.Precision.HIGHEST)
    from functools import partial as _partial
    rhs4 = rhs.astype(cdtype).reshape(K, nb, 1, b)
    y = pl.pallas_call(
        _partial(_fwd_kernel, precision=precision),
        grid=(K // kt_f, nb),
        in_specs=[mat_spec(kt_f, False), vec_spec(kt_f, False)],
        out_specs=vec_spec(kt_f, False),
        out_shape=jax.ShapeDtypeStruct((K, nb, 1, b), cdtype),
        scratch_shapes=[pltpu.VMEM((kt_f, b), cdtype)],
        interpret=interpret,
    )(fact.F, rhs4)

    x = pl.pallas_call(
        _partial(_bwd_kernel, precision=precision),
        grid=(K // kt_b, nb),
        in_specs=[mat_spec(kt_b, True), mat_spec(kt_b, True),
                  vec_spec(kt_b, True)],
        out_specs=vec_spec(kt_b, True),
        out_shape=jax.ShapeDtypeStruct((K, nb, 1, b), cdtype),
        scratch_shapes=[pltpu.VMEM((kt_b, b), cdtype)],
        interpret=interpret,
    )(fact.Sinv, fact.U, y)
    return x.reshape(K, nb, b)
