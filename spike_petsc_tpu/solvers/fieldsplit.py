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

    def _mk_transpose(_info=pc.info):
        # PCApplyTranspose: additive transposes term-wise; multiplicative
        # reverses the stage order on A^T (I - M^{-T}A^T factors as the
        # reversed product of the per-stage factors transposed)
        innersT = [p.transpose() for p in inners]
        if ctype == "additive":
            def applyT(r):
                z = innersT[0].apply(r)
                for it in innersT[1:]:
                    z = z + it.apply(r)
                return z
        else:
            from .operator import transpose_operator
            mvT, _, _ = as_matvec(transpose_operator(pmat))
            rev = innersT[::-1]

            def applyT(r):
                z = rev[0].apply(r)
                for it in rev[1:]:
                    z = z + it.apply(r - mvT(z))
                return z
        return PC(name="composite_transpose", apply=applyT, info=_info,
                  inner=innersT[0])

    pc.make_transpose = _mk_transpose
    return pc


def _fieldsplit_isets(opts: Options, n: int):
    """Resolve the field index sets from options (PETSc-parity surface):

    -pc_fieldsplit_sizes n0,n1,...       contiguous multi-field split
    -pc_fieldsplit_block_size bs         strided/interleaved components; each
      -pc_fieldsplit_<i>_fields c0,c1    field takes components within the bs
                                         block (PCFieldSplitSetFields analog)
    -pc_fieldsplit_n0 n0                 legacy 2-field contiguous split
    Default: two contiguous fields of n/2.
    """
    bs = opts.get_int("pc_fieldsplit_block_size", 0)
    if bs > 0:
        if n % bs:
            raise ValueError(f"n={n} not divisible by block size {bs}")
        base = np.arange(0, n, bs)
        present = [i for i in range(bs)
                   if opts.get_list(f"pc_fieldsplit_{i}_fields", None)
                   is not None]
        if present and present != list(range(len(present))):
            raise ValueError(
                f"-pc_fieldsplit_<i>_fields must be numbered contiguously "
                f"from 0; got indices {present}")
        isets = []
        for i in present:
            comps = [int(c) for c in
                     opts.get_list(f"pc_fieldsplit_{i}_fields", None)]
            idx = np.sort(np.concatenate([base + c for c in comps]))
            isets.append(idx.astype(np.int64))
        if not isets:
            # one field per component
            isets = [(base + c).astype(np.int64) for c in range(bs)]
        return isets
    sizes = opts.get_list("pc_fieldsplit_sizes", None)
    if sizes is None:
        n0 = opts.get_int("pc_fieldsplit_n0", n // 2)
        sizes = [n0, n - n0]
    else:
        sizes = [int(s) for s in sizes]
    if sum(sizes) != n:
        raise ValueError(f"fieldsplit sizes {sizes} do not sum to n={n}")
    offs = np.cumsum([0] + sizes)
    return [np.arange(offs[i], offs[i + 1], dtype=np.int64)
            for i in range(len(sizes))]


def pc_fieldsplit_is(pmat, isets, opts: Options) -> PC:
    """PCFIELDSPLIT over arbitrary index sets (PCFieldSplitSetIS analog):
    ``isets`` is a list of integer index arrays partitioning [0, n).

    -pc_fieldsplit_type additive|multiplicative|schur (schur: 2 fields)
    -pc_fieldsplit_schur_precondition a11|selfp
    Inner PC for field i reads options under the ``fieldsplit_<i>_`` prefix.
    """
    a = hsp.as_csr(pmat)
    n = a.shape[0]
    isets = [np.asarray(ix, dtype=np.int64) for ix in isets]
    nf = len(isets)
    if nf < 2:
        raise ValueError("fieldsplit needs >= 2 fields")
    allidx = np.concatenate(isets)
    if len(allidx) != n or len(np.unique(allidx)) != n:
        raise ValueError("fieldsplit index sets must partition [0, n)")
    ftype = opts.get_string("pc_fieldsplit_type",
                            "schur" if nf == 2 else "multiplicative")
    sprec = opts.get_string("pc_fieldsplit_schur_precondition", "selfp")
    if ftype == "schur" and nf != 2:
        raise ValueError("schur fieldsplit requires exactly 2 fields")

    def blk(i, j):
        return a[isets[i]][:, isets[j]].tocsr()

    sub_opts = [opts.scoped(f"fieldsplit_{i}_") for i in range(nf)]

    def make_pc(i, mat):
        return PRECONDITIONERS.get(
            sub_opts[i].get_string("pc_type", "lu"))(mat, sub_opts[i])

    dev_isets = [jnp.asarray(ix) for ix in isets]

    def scatter(zs, dtype):
        x = jnp.zeros((n,), dtype)
        for ix, z in zip(dev_isets, zs):
            x = x.at[ix].set(z)
        return x

    if ftype == "schur":
        A00, A01 = blk(0, 0), blk(0, 1)
        A10, A11 = blk(1, 0), blk(1, 1)
        pc0 = make_pc(0, A00)
        if sprec == "selfp":
            d0 = A00.diagonal()
            d0inv = np.where(d0 != 0, 1.0 / np.where(d0 != 0, d0, 1.0), 1.0)
            s_approx = (A11 - A10 @ sp.diags(d0inv) @ A01).tocsr()
        else:
            s_approx = A11
        pc1 = make_pc(1, s_approx)
        mv01, _, _ = as_matvec(A01)
        mv10, _, _ = as_matvec(A10)

        # lower-triangular Schur factorization application:
        # z0' = M00^{-1} r0; z1 = S^{-1}(r1 - A10 z0');
        # z0 = z0' - M00^{-1} A01 z1
        def apply(r):
            r0, r1 = r[dev_isets[0]], r[dev_isets[1]]
            z0p = pc0.apply(r0)
            z1 = pc1.apply(r1 - mv10(z0p))
            z0 = z0p - pc0.apply(mv01(z1))
            return scatter([z0, z1], r.dtype)

        inner0 = pc0

        def _mk_transpose():
            # transpose of the full Schur factorization P = L D U:
            # P^{-T} = L^{-T} D^{-T} U^{-T} — same three-step structure
            # with A01 <-> A10 transposed and the inner PCs transposed
            pc0t, pc1t = pc0.transpose(), pc1.transpose()
            mv01t, _, _ = as_matvec(A01.T.tocsr())   # [n1, n0]
            mv10t, _, _ = as_matvec(A10.T.tocsr())   # [n0, n1]

            def applyT(r):
                r0, r1 = r[dev_isets[0]], r[dev_isets[1]]
                w0p = pc0t.apply(r0)
                w1 = pc1t.apply(r1 - mv01t(w0p))
                w0 = w0p - pc0t.apply(mv10t(w1))
                return scatter([w0, w1], r.dtype)
            return applyT, pc0t
    else:
        pcs = [make_pc(i, blk(i, i)) for i in range(nf)]
        if ftype == "additive":
            def apply(r):
                zs = [pcs[i].apply(r[dev_isets[i]]) for i in range(nf)]
                return scatter(zs, r.dtype)

            def _mk_transpose():
                pcst = [p.transpose() for p in pcs]

                def applyT(r):
                    zs = [pcst[i].apply(r[dev_isets[i]]) for i in range(nf)]
                    return scatter(zs, r.dtype)
                return applyT, pcst[0]
        elif ftype == "multiplicative":
            # block Gauss-Seidel over the fields:
            # z_i = M_ii^{-1} (r_i - sum_{j<i} A_ij z_j)
            mv_low = {(i, j): as_matvec(blk(i, j))[0]
                      for i in range(nf) for j in range(i)}

            def apply(r):
                zs = []
                for i in range(nf):
                    ri = r[dev_isets[i]]
                    for j in range(i):
                        ri = ri - mv_low[(i, j)](zs[j])
                    zs.append(pcs[i].apply(ri))
                return scatter(zs, r.dtype)

            def _mk_transpose():
                # transpose of block lower Gauss-Seidel is block UPPER
                # Gauss-Seidel on A^T: w_i = M_ii^{-T}(r_i -
                # sum_{j>i} A_ji^T w_j), i descending
                pcst = [p.transpose() for p in pcs]
                mv_up = {(i, j): as_matvec(blk(j, i).T.tocsr())[0]
                         for i in range(nf) for j in range(i + 1, nf)}

                def applyT(r):
                    ws = [None] * nf
                    for i in range(nf - 1, -1, -1):
                        ri = r[dev_isets[i]]
                        for j in range(i + 1, nf):
                            ri = ri - mv_up[(i, j)](ws[j])
                        ws[i] = pcst[i].apply(ri)
                    return scatter(ws, r.dtype)
                return applyT, pcst[0]
        else:
            raise ValueError(f"unknown fieldsplit type {ftype!r}")
        inner0 = pcs[0]

    pc = PC(name="fieldsplit", apply=apply,
            info=dict(type=ftype, nfields=nf,
                      sizes=[int(len(ix)) for ix in isets],
                      schur_precondition=(sprec if ftype == "schur"
                                          else None)),
            inner=inner0)

    def _mk_transpose_pc(_info=pc.info):
        applyT, innerT = _mk_transpose()
        return PC(name="fieldsplit_transpose", apply=applyT, info=_info,
                  inner=innerT)

    pc.make_transpose = _mk_transpose_pc
    return pc


@register_pc("fieldsplit")
def pc_fieldsplit(pmat, opts: Options) -> PC:
    """PCFIELDSPLIT: block preconditioning over 2..N fields, contiguous
    (-pc_fieldsplit_sizes / -pc_fieldsplit_n0), strided-interleaved
    (-pc_fieldsplit_block_size + -pc_fieldsplit_<i>_fields), or arbitrary
    index sets via the programmatic ``pc_fieldsplit_is`` entry point
    (PCFieldSplitSetIS analog).

    -pc_fieldsplit_type additive|multiplicative|schur (schur: 2 fields)
    -pc_fieldsplit_schur_precondition a11|selfp
    Inner PCs: -fieldsplit_<i>_pc_type ...
    """
    a = hsp.as_csr(pmat)
    return pc_fieldsplit_is(a, _fieldsplit_isets(opts, a.shape[0]), opts)
