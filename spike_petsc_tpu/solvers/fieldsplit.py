"""Composite and fieldsplit preconditioners.

The reference's testbed2 exists to make its plugins reachable inside PETSc's
composable solvers — its header documents the Schur-complement fieldsplit
recipe with a reordered inner solve (/root/reference/src/testbed2.c:4,
61-73).  This module provides that composability natively:

  composite   additive or multiplicative combination of inner PCs
              (PCCOMPOSITE), options: -pc_composite_type, -pc_composite_pcs
  fieldsplit  2-field block preconditioning (PCFIELDSPLIT): additive,
              multiplicative, or schur; inner PCs configured under the
              fieldsplit_0_/fieldsplit_1_ prefixes; Schur approximated by
              A11 ("a11") or the diag(A00)-sparse approximation ("selfp")

Setup is host-side (block extraction on CSR), application is jittable device
closures, like every other PC here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .. import sparse as hsp
from ..utils.options import Options
from ..utils.registry import PRECONDITIONERS, register_pc
from .operator import as_matvec
from .pc import PC


@register_pc("composite")
def pc_composite(pmat, opts: Options) -> PC:
    """PCCOMPOSITE: combine inner PCs additively or multiplicatively.
    -pc_composite_pcs jacobi,spike  -pc_composite_type additive|multiplicative
    Inner PC i reads options under the ``sub_i_`` prefix."""
    names = opts.get_list("pc_composite_pcs", ["jacobi"])
    ctype = opts.get_string("pc_composite_type", "additive")
    inners = [PRECONDITIONERS.get(nm)(pmat, opts.scoped(f"sub_{i}_"))
              for i, nm in enumerate(names)]
    matvec = None
    if ctype == "multiplicative":
        matvec, _, _ = as_matvec(pmat)

    if ctype == "additive":
        def apply(r):
            z = inners[0].apply(r)
            for inner in inners[1:]:
                z = z + inner.apply(r)
            return z
    elif ctype == "multiplicative":
        def apply(r):
            z = inners[0].apply(r)
            for inner in inners[1:]:
                z = z + inner.apply(r - matvec(z))
            return z
    else:
        raise ValueError(f"unknown composite type {ctype!r}")

    pc = PC(name="composite", apply=apply,
            info=dict(type=ctype, pcs=",".join(names)))
    pc.inner = inners[0]
    return pc


@register_pc("fieldsplit")
def pc_fieldsplit(pmat, opts: Options) -> PC:
    """PCFIELDSPLIT (2 fields): block preconditioning with inner PCs per
    field.  Field 0 = rows [0, n0), field 1 = the rest; n0 from
    -pc_fieldsplit_n0 (default n/2).

    -pc_fieldsplit_type additive|multiplicative|schur
    -pc_fieldsplit_schur_precondition a11|selfp
    Inner PCs: -fieldsplit_0_pc_type ..., -fieldsplit_1_pc_type ...
    """
    a = hsp.as_csr(pmat)
    n = a.shape[0]
    n0 = opts.get_int("pc_fieldsplit_n0", n // 2)
    ftype = opts.get_string("pc_fieldsplit_type", "schur")
    sprec = opts.get_string("pc_fieldsplit_schur_precondition", "selfp")

    A00 = a[:n0, :n0].tocsr()
    A01 = a[:n0, n0:].tocsr()
    A10 = a[n0:, :n0].tocsr()
    A11 = a[n0:, n0:].tocsr()

    o0 = opts.scoped("fieldsplit_0_")
    o1 = opts.scoped("fieldsplit_1_")
    pc0 = PRECONDITIONERS.get(o0.get_string("pc_type", "lu"))(A00, o0)

    if ftype == "schur":
        if sprec == "selfp":
            d0 = A00.diagonal()
            d0inv = np.where(d0 != 0, 1.0 / np.where(d0 != 0, d0, 1.0), 1.0)
            s_approx = (A11 - A10 @ sp.diags(d0inv) @ A01).tocsr()
        else:
            s_approx = A11
        pc1 = PRECONDITIONERS.get(o1.get_string("pc_type", "lu"))(s_approx, o1)
    else:
        pc1 = PRECONDITIONERS.get(o1.get_string("pc_type", "lu"))(A11, o1)

    mv01, _, _ = as_matvec(A01)
    mv10, _, _ = as_matvec(A10)

    if ftype == "additive":
        def apply(r):
            return jnp.concatenate([pc0.apply(r[:n0]), pc1.apply(r[n0:])])
    elif ftype == "multiplicative":
        def apply(r):
            z0 = pc0.apply(r[:n0])
            z1 = pc1.apply(r[n0:] - mv10(z0))
            return jnp.concatenate([z0, z1])
    elif ftype == "schur":
        # lower-triangular Schur factorization application:
        # z0' = M00^{-1} r0; z1 = S^{-1}(r1 - A10 z0'); z0 = z0' - M00^{-1} A01 z1
        def apply(r):
            z0p = pc0.apply(r[:n0])
            z1 = pc1.apply(r[n0:] - mv10(z0p))
            z0 = z0p - pc0.apply(mv01(z1))
            return jnp.concatenate([z0, z1])
    else:
        raise ValueError(f"unknown fieldsplit type {ftype!r}")

    return PC(name="fieldsplit", apply=apply,
              info=dict(type=ftype, n0=n0,
                        schur_precondition=sprec if ftype == "schur" else None),
              inner=pc0)
