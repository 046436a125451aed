"""Operator normalization: anything matrix-like -> a jittable matvec closure.

The reference's KSP consumes PETSc ``Mat`` objects whose MatMult dispatches by
type (SeqAIJ/MPIAIJ).  Here the "Mat" is whatever the caller has — a
``BandedMatrix``, a ``BlockTridiagonal``, a dense ``jax.Array``, a host SciPy
sparse matrix (shipped to device as BCOO), or an arbitrary callable — and the
KSP layer only ever sees ``matvec: [n] -> [n]``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.band import BandedMatrix, banded_matvec
from ..ops.blocktri import BlockTridiagonal, blocktri_matvec


def _use_blocktri_matvec() -> bool:
    return jax.default_backend() == "tpu"


def _tag(mv, route: str):
    """Annotate a matvec closure with the route that built it (read by
    bench/tests to verify 'auto' dispatch decisions)."""
    mv._route = route
    return mv


def _bt_gate(a: BandedMatrix) -> Tuple[bool, bool]:
    """The band->blocktri conversion gate shared by the single- and
    multi-RHS 'auto' routes: (feasible, wide).

    ``feasible``: the 128-blocked conversion needs b=128 >= max(kl, ku), a
    few tiles of rows, and a fixed-width dtype (no emulated f64 pairs on
    TPU — high-accuracy runs keep an f64 operator for refinement residuals
    only).  ``wide``: the conversion stores 3*128 floats per row vs w in
    band form; 'auto' only routes through it when the band is wide enough
    that the blowup is modest (< ~4x) AND the Pallas matvec's bandwidth win
    dominates — narrow bands keep the shifted-axpy form (ADVICE r2: a w=32
    band would pay 12x memory for little speedup)."""
    bt_ok = (max(a.kl, a.ku) <= 128 and a.n >= 4 * 128
             and jnp.dtype(a.dtype).itemsize <= 4)
    return bt_ok, bt_ok and a.kl + a.ku + 1 >= 96


def _banded_pallas_split(a: BandedMatrix):
    """(apply, operand) through the minimal-traffic Pallas banded kernel
    (ops/pallas/band_matvec.py): diagonal-major layout prepared ONCE, exactly
    n*w band entries streamed per call — covers ANY width where the blocktri
    conversion only paid off at w >= ~96."""
    from ..ops.pallas.band_matvec import (banded_matvec_prepared,
                                          prepare_banded_mv)
    return banded_matvec_prepared, prepare_banded_mv(a)


def _band_split(a: BandedMatrix, impl: str):
    """Resolve a BandedMatrix SpMV route to a CLOSURE-FREE pair
    ``(apply, operand, route)`` with ``apply(operand, x)`` pure in its
    array arguments — ``operand`` is the prepared operator pytree.

    This is the explicit-argument form behind :func:`as_matvec` (which
    wraps it in a closure) and :func:`as_matvec_split` (which exposes it):
    through the axon TPU tunnel, jit CLOSURE constants are serialized into
    every remote-compile POST — a 1.5 GB converted operator captured by a
    closure turns each compile into a multi-minute upload — while explicit
    jit arguments stay device-resident (bench.py timing methodology)."""
    if impl == "xla":
        return banded_matvec, a, "xla"
    if impl == "banded_pallas":
        from ..ops.pallas.band_matvec import banded_mv_feasible
        if banded_mv_feasible(a):
            return (*_banded_pallas_split(a), "banded_pallas")
        return banded_matvec, a, "xla"
    # 'auto' consults the measured tuning record first (bench.py times
    # every feasible route on the real chip and records the winner per
    # platform/bandwidth — utils/tuning.py); the static heuristics
    # below are the fallback when no measurement exists
    hint = None
    if impl == "auto":
        from ..utils.tuning import matvec_route_hint, platform_key
        hint = matvec_route_hint(platform_key(),
                                 a.kl + a.ku + 1, dtype=a.dtype, n=a.n)
    if hint == "banded_pallas":
        from ..ops.pallas.band_matvec import banded_mv_feasible
        if banded_mv_feasible(a):
            return (*_banded_pallas_split(a), "banded_pallas")
        hint = None
    if hint == "xla":
        return banded_matvec, a, "xla"
    if impl == "auto" and hint is None and jax.default_backend() == "tpu":
        # no measurement for this width: the static TPU default is the
        # diagonal-major banded kernel — it streams exactly the n*w band
        # bytes and beat the blocktri DMA route even at w=201 where the
        # conversion's byte inflation is smallest (1.06 vs 2.05 ms at
        # N=1e6 on v5e; at w=13 the conversion inflates bytes 30x).  The
        # blocktri route below stays reachable by measurement hint or
        # explicit impl, and remains the wide-band fallback when the
        # banded kernel is infeasible (w > 512).
        from ..ops.pallas.band_matvec import banded_mv_feasible
        if banded_mv_feasible(a):
            return (*_banded_pallas_split(a), "banded_pallas")
    bt_ok, wide = _bt_gate(a)
    if ((impl == "auto" and (hint == "blocktri" and bt_ok
                             or hint is None and wide))
            or (bt_ok and impl == "blocktri")) \
            and _use_blocktri_matvec():
        from ..ops.blocktri import band_to_blocktri
        from ..ops.pallas.matvec import blocktri_matvec_dma, mv_padded_nb
        T = band_to_blocktri(a, 128)
        nb, b, n = T.nb, T.b, a.n
        # pad ONCE to the DMA kernel's chunk grid; a per-call pad would
        # copy the full [nb, b, b] matrices every matvec (~2x the kernel)
        nbp = mv_padded_nb(nb, b, jnp.dtype(T.dtype).itemsize)
        if nbp != nb:
            T = BlockTridiagonal(
                D=jnp.pad(T.D, ((0, nbp - nb), (0, 0), (0, 0))),
                L=jnp.pad(T.L, ((0, nbp - nb), (0, 0), (0, 0))),
                U=jnp.pad(T.U, ((0, nbp - nb), (0, 0), (0, 0))))

        def apply_bt(Tm, x):
            xb = jnp.pad(x, (0, nbp * b - n)).reshape(nbp, b)
            return blocktri_matvec_dma(Tm, xb).reshape(-1)[:n]
        return apply_bt, T, "blocktri"
    return banded_matvec, a, "xla"


def as_matvec_split(a, impl: str = "auto"):
    """Closure-free form of :func:`as_matvec` for BandedMatrix operators:
    returns ``(apply, operand, n, dtype)`` with ``apply(operand, x)`` —
    pass ``operand`` as an EXPLICIT jit argument when compiling through
    the axon tunnel (see :func:`_band_split`)."""
    if impl not in ("auto", "banded_pallas", "blocktri", "xla"):
        raise ValueError(
            f"unknown matvec impl {impl!r}: expected auto, banded_pallas, "
            f"blocktri, or xla (-mat_matvec_impl)")
    if not isinstance(a, BandedMatrix):
        raise TypeError("as_matvec_split supports BandedMatrix operators; "
                        "use as_matvec for other representations")
    apply, operand, route = _band_split(a, impl)
    # tag a per-call wrapper, not the shared library function
    tagged = _tag(lambda op, x: apply(op, x), route)
    return tagged, operand, a.n, a.dtype


def transpose_operator(a):
    """Host-side operator transpose (pure transpose, no conjugation) for
    KSPs that iterate on A^T (`-ksp_type bicg`).  Callables cannot be
    transposed — pass an explicit operator representation."""
    if isinstance(a, BandedMatrix):
        from ..ops.band import banded_transpose
        return banded_transpose(a)
    if isinstance(a, BlockTridiagonal):
        tT = lambda x: jnp.swapaxes(x, -1, -2)
        zb = jnp.zeros_like(a.D[:1])
        return BlockTridiagonal(
            D=tT(a.D),
            L=jnp.concatenate([zb, tT(a.U[:-1])], axis=0),
            U=jnp.concatenate([tT(a.L[1:]), zb], axis=0))
    if callable(a):
        raise TypeError(
            "cannot transpose a bare matvec callable; pass an explicit "
            "operator (BandedMatrix / BlockTridiagonal / sparse / dense) "
            "or supply matvec_transpose yourself")
    try:
        import scipy.sparse as sp
        if sp.issparse(a):
            return a.T.tocsr()
    except ImportError:  # pragma: no cover
        pass
    arr = jnp.asarray(a)
    if arr.ndim == 2:
        return arr.T
    raise TypeError(f"cannot transpose operator of type {type(a)!r}")


def as_matvec(a, n_hint: int = None,
              impl: str = "auto") -> Tuple[Callable, int, object]:
    """Return (matvec, n, dtype) for any supported operator representation.

    ``impl`` selects the BandedMatrix route (ignored for other types):
      * "auto"          — on TPU, wide bands take a one-time block-
                          tridiagonal conversion + the Pallas DMA matvec
                          (~6x the shifted-axpy form at N=1e6 bw=201 on
                          v5e), narrow bands the XLA shifted-axpy form;
      * "banded_pallas" — the diagonal-major Pallas banded kernel (minimal
                          HBM traffic, any width; falls back to XLA when
                          infeasible);
      * "blocktri"      — force the blocktri conversion route;
      * "xla"           — force the XLA shifted-axpy form.
    """
    if impl not in ("auto", "banded_pallas", "blocktri", "xla"):
        raise ValueError(
            f"unknown matvec impl {impl!r}: expected auto, banded_pallas, "
            f"blocktri, or xla (-mat_matvec_impl)")
    if isinstance(a, BandedMatrix):
        apply, operand, route = _band_split(a, impl)
        return _tag((lambda x: apply(operand, x)), route), a.n, a.dtype

    if isinstance(a, BlockTridiagonal):
        nb, b = a.nb, a.b
        n = nb * b

        def mv(x):
            return blocktri_matvec(a, x.reshape(nb, b)).reshape(n)
        return mv, n, a.dtype

    if callable(a):
        if n_hint is None:
            raise ValueError("callable operator requires n_hint (vector size)")
        return a, n_hint, None

    return _as_matvec_other(a)


def _as_matvec_other(a) -> Tuple[Callable, int, object]:

    # host scipy sparse -> band+outliers split when the matrix has band
    # structure (vector-speed band, scalar outliers), else device BCOO.
    # TPU gathers/scatters run at ~0.2 GB/s, so a BCOO matvec pays scalar
    # cost on EVERY nonzero; the split pays it only on the out-of-band few.
    try:
        import scipy.sparse as sp
        if sp.issparse(a):
            n = a.shape[0]
            from ..ops.split import split_if_profitable, split_matvec
            sm = split_if_profitable(a)
            if sm is not None:
                return (lambda x: split_matvec(sm, x)), n, sm.dtype
            from jax.experimental import sparse as jsparse
            coo = a.tocoo()
            bcoo = jsparse.BCOO(
                (jnp.asarray(coo.data),
                 jnp.stack([jnp.asarray(coo.row), jnp.asarray(coo.col)], axis=1)),
                shape=coo.shape)

            def mv(x):
                return bcoo @ x
            return mv, n, bcoo.dtype
    except ImportError:  # pragma: no cover
        pass

    arr = jnp.asarray(a) if not isinstance(a, (jax.Array, np.ndarray)) else jnp.asarray(a)
    if arr.ndim == 2:
        n = arr.shape[0]
        return (lambda x: arr @ x), n, arr.dtype

    raise TypeError(f"cannot build a matvec from {type(a)!r}")


def as_matvec_many(a, n_hint: int = None,
                   impl: str = "auto") -> Tuple[Callable, int, object]:
    """Return (matvec_many: [n, r] -> [n, r], n, dtype): a TRUE multi-RHS
    operator apply for batched Krylov serving (solvers/krylov_many.py).

    A ``vmap`` of the single-RHS matvec re-streams the operator once PER
    COLUMN every iteration; here a wide TPU band takes one band->blocktri
    conversion and applies all r columns as batched [b, b] @ [b, r] MXU
    matmuls — the operator blocks stream ONCE per apply for the whole batch
    (the multi-RHS analogue of the blocktri route in :func:`as_matvec`; the
    distributed engines already do this via ``local_matvec_many``).

    Dense operators batch natively (``A @ X``).  Everything else (narrow
    bands, sparse, callables) falls back to the vmapped single-RHS route,
    tagged ``vmap_<route>``.

    Memory note: the blocktri route materializes a SECOND at-rest copy of
    the operator at 3*128 floats per row for the closure's lifetime,
    alongside the original band.  The 'auto' width gate keeps the blowup
    < ~4x; ``impl="blocktri"`` forced on a narrow band has no such bound
    (~55x for w=7) — size accordingly when serving n~1e6 operators.
    """
    if impl not in ("auto", "banded_pallas", "blocktri", "xla"):
        raise ValueError(
            f"unknown matvec impl {impl!r}: expected auto, banded_pallas, "
            f"blocktri, or xla (-mat_matvec_impl)")
    if isinstance(a, BandedMatrix) and impl in ("auto", "blocktri"):
        # same gate as the single-RHS 'auto' (_bt_gate; the conversion's
        # at-rest blowup is the binding constraint, not speed).  The
        # measured tuning record (matvec_route_hint) is intentionally NOT
        # consulted here: it stores single-RHS streaming profiles, and the
        # multi-RHS blocktri apply streams blocks once for ALL r columns —
        # a single-RHS 'xla' winner does not transfer to r>>1 (ADVICE r3).
        # impl='blocktri' forces the route for narrow bands where a large r
        # still amortizes the blowup (see memory note above).
        bt_ok, wide = _bt_gate(a)
        if bt_ok and (impl == "blocktri" or wide) and _use_blocktri_matvec():
            from ..ops.blocktri import band_to_blocktri
            T = band_to_blocktri(a, 128)
            nb, b = T.nb, T.b

            def mv_many(X):
                Xb = jnp.pad(X, ((0, nb * b - a.n), (0, 0)))
                Xb = Xb.reshape(nb, b, -1)
                return blocktri_matvec(T, Xb).reshape(nb * b, -1)[:a.n]
            return _tag(mv_many, "blocktri_many"), a.n, a.dtype

    if isinstance(a, BlockTridiagonal):
        nb, b = a.nb, a.b
        n = nb * b

        def mv_many(X):
            return blocktri_matvec(a, X.reshape(nb, b, -1)).reshape(n, -1)
        return _tag(mv_many, "blocktri_many"), n, a.dtype

    if not (isinstance(a, BandedMatrix) or callable(a)):
        try:
            import scipy.sparse as sp
            is_sp = sp.issparse(a)
        except ImportError:  # pragma: no cover
            is_sp = False
        if not is_sp:
            arr = jnp.asarray(a)
            if arr.ndim == 2:
                return (_tag((lambda X: arr @ X), "dense_many"),
                        arr.shape[0], arr.dtype)

    mv, n, dt = as_matvec(a, n_hint=n_hint, impl=impl)
    return (_tag(jax.vmap(mv, in_axes=1, out_axes=1),
                 f"vmap_{getattr(mv, '_route', 'op')}"), n, dt)
