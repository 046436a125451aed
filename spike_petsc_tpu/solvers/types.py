"""Solver result types and converged-reason codes.

Reason codes mirror PETSc's KSPConvergedReason values so drivers/tests can
speak the same language as the reference harness's ``-ksp_converged_reason``
output (/root/reference/src/HOWTO:2).  Inside jit the reason is an int32;
``reason_str`` maps it back to a name.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

# PETSc KSPConvergedReason numeric values (petscksp.h)
CONVERGED_ITERATING = 0
CONVERGED_RTOL_NORMAL = 1   # normal-equations residual test (KSPLSQR/CGNE)
CONVERGED_RTOL = 2
CONVERGED_ATOL = 3
CONVERGED_ITS = 4
DIVERGED_NULL = -2
DIVERGED_ITS = -3
DIVERGED_DTOL = -4
DIVERGED_BREAKDOWN = -5
DIVERGED_NANORINF = -9

_REASON_NAMES = {
    0: "CONVERGED_ITERATING",
    1: "CONVERGED_RTOL_NORMAL",
    2: "CONVERGED_RTOL",
    3: "CONVERGED_ATOL",
    4: "CONVERGED_ITS",
    -2: "DIVERGED_NULL",
    -3: "DIVERGED_ITS",
    -4: "DIVERGED_DTOL",
    -5: "DIVERGED_BREAKDOWN",
    -9: "DIVERGED_NANORINF",
}


def reason_str(reason) -> str:
    return _REASON_NAMES.get(int(reason), f"UNKNOWN({int(reason)})")


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class KSPResult:
    """Result of a Krylov solve (a pytree, usable inside jit).

    history[i] is the monitored residual norm at iteration i (history[0] is
    the initial residual); entries beyond ``its`` are NaN.  This reproduces
    the information PETSc exposes through -ksp_monitor and
    KSPGetResidualHistory, the parity surface for matching the reference's
    residual histories (SURVEY.md §4).
    """

    x: jax.Array
    its: jax.Array          # int32
    reason: jax.Array       # int32
    rnorm: jax.Array        # final monitored residual norm
    history: jax.Array      # [maxit+1]
    # unpreconditioned residual norms when the solver was asked to monitor
    # them (-ksp_monitor_true_residual, /root/reference/src/makefile:18);
    # None otherwise
    true_history: Optional[jax.Array] = None

    @property
    def converged(self):
        return self.reason > 0

    def history_trimmed(self):
        h = jnp.asarray(self.history)
        return h[: int(self.its) + 1]

    def __repr__(self):  # pragma: no cover
        try:
            return (f"KSPResult(its={int(self.its)}, "
                    f"reason={reason_str(self.reason)}, "
                    f"rnorm={float(self.rnorm):.6e})")
        except Exception:
            return object.__repr__(self)


def default_convergence_check(rnorm, bnorm, its, *, rtol, atol, divtol, maxit):
    """PETSc KSPConvergedDefault semantics on device.

    Returns an int32 reason (0 while iterating).
    """
    bad = jnp.logical_not(jnp.isfinite(rnorm))
    conv_atol = rnorm <= atol
    conv_rtol = rnorm <= rtol * bnorm
    div_dtol = rnorm > divtol * bnorm
    div_its = its >= maxit
    return jnp.where(
        bad, DIVERGED_NANORINF,
        jnp.where(conv_atol, CONVERGED_ATOL,
                  jnp.where(conv_rtol, CONVERGED_RTOL,
                            jnp.where(div_dtol, DIVERGED_DTOL,
                                      jnp.where(div_its, DIVERGED_ITS,
                                                CONVERGED_ITERATING))))
    ).astype(jnp.int32)
