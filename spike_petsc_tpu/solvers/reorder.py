"""Reordered solve wrapper (KSPREORDER equivalent).

The reference registers a KSP type that solves the non-symmetrically permuted
system: setup computes an ordering of the preconditioning matrix, permutes the
operators, and configures an inner KSP under the ``reorder_`` prefix; solve
permutes rhs/solution in and back out (/root/reference/src/kspreorder.c:11-28,
112-129, 197-223).

``solve_reordered`` is the functional re-design, extended with the scaling
step the reference's orderings compute but never apply (MC64/AWBM row/column
scalings — SURVEY.md §7 hard-part 2): with ``scale=True`` the system solved is

    (R Dr A Dc C) z = (Dr b)[rperm],        x = Dc * scatter(z, cperm)

which is exactly the permuted-residual identity the reference's `#if 0` debug
harness cross-checks (/root/reference/src/kspreorder.c:34-111).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import sparse as hsp
from ..ordering import get_ordering
from ..utils.options import Options
from .ksp import solve
from .types import KSPResult


def solve_reordered(A, b, x0=None, *, options: Optional[Options] = None,
                    ordering: Optional[str] = None, scale: Optional[bool] = None,
                    pmat=None, to_banded: bool = True, **params) -> KSPResult:
    """Solve A x = b on the reordered (optionally scaled) system.

    Args:
      A: host sparse/dense matrix (orderings are host-side setup work).
      ordering: registry name; default from ``-mat_ordering_type``
        (/root/reference/src/kspreorder.c:146).
      scale: apply the ordering's row/col scalings when it provides them.
      to_banded: ship the permuted operator to the device as band storage
        when its bandwidth is moderate (else BCOO).
      params/options: forwarded to the inner solve under the ``reorder_``
        prefix (e.g. -reorder_ksp_type, -reorder_pc_type).
    """
    opts = options or Options()
    ordering = ordering or opts.get_string("mat_ordering_type", "natural")
    if scale is None:
        scale = opts.get_bool("mat_ordering_scale", False)

    acsr = hsp.as_csr(A)
    n = acsr.shape[0]
    ores = get_ordering(acsr if pmat is None else hsp.as_csr(pmat),
                        ordering, opts)
    use_scale = scale and ores.row_scale is not None
    pa = ores.apply(acsr, scale=use_scale)

    b = np.asarray(b)
    bp = (ores.row_scale * b) if use_scale else b
    bp = bp[ores.rperm]

    x0p = None
    if x0 is not None:
        x0arr = np.asarray(x0)
        y0 = x0arr / ores.col_scale if use_scale else x0arr
        x0p = y0[ores.cperm]

    inner_opts = opts.scoped("reorder_")
    operator = pa
    if to_banded:
        kl, ku = hsp.compute_half_bandwidths(pa)
        if kl + ku + 1 <= max(64, n // 4):
            from ..ops.band import BandedMatrix
            data, kl, ku = hsp.csr_to_banded_arrays(pa, kl=kl, ku=ku)
            operator = BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)

    res = solve(operator, jnp.asarray(bp),
                None if x0p is None else jnp.asarray(x0p),
                options=inner_opts, **params)

    # back-permute: z solves the permuted system; x = Dc * scatter(z, cperm)
    z = np.asarray(res.x)
    y = np.empty_like(z)
    y[ores.cperm] = z
    x = ores.col_scale * y if use_scale else y
    return KSPResult(x=jnp.asarray(x), its=res.its, reason=res.reason,
                     rnorm=res.rnorm, history=res.history,
                     true_history=res.true_history)
