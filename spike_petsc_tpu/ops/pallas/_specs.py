"""Shared Pallas BlockSpec helpers.

``im32`` wraps a BlockSpec index_map so its indices are emitted as int32.
Under ``jax_enable_x64`` the default map indices trace as i64, and the TPU
compile service rejects the resulting module outright (tpu_compile_helper
subprocess exit 1; measured on v5e, libtpu 2026-08 — ANY gridded
pallas_call fails once x64 is on).  The high-accuracy refinement path
enables x64 in-process, so every kernel in this package routes its index
maps through this wrapper.  int32 grid indices are always sufficient:
grid dimensions are bounded far below 2^31.
"""

from __future__ import annotations

import jax.numpy as jnp


def im32(fn):
    """Wrap ``fn(*grid_ids) -> tuple`` to cast every index to int32."""
    def wrapped(*args):
        out = fn(*args)
        if not isinstance(out, tuple):
            out = (out,)
        return tuple(jnp.asarray(o, jnp.int32) for o in out)
    return wrapped
