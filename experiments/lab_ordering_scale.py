"""At-scale timing lab for the ordering/scaling pipeline (VERDICT r4 #4).

The reference's raison d'être is the reorder -> scale -> extract pre-pass
(/root/reference/src/testbed.c:200-284 prints its diagnostics per run), but
through round 4 the bench only measured factor/solve/SpMV.  This lab times
each pipeline component at BASELINE config-3 scale (n=1e6-class ill-scaled
nonsymmetric band) and the end-to-end reorder->scale->extract->factor->solve
wall; bench.py's stage_ordering ships the same measurements driver-side.

Run:  python experiments/lab_ordering_scale.py [n]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import jax
    import jax.numpy as jnp

    from spike_petsc_tpu import sparse as hsp
    from spike_petsc_tpu.models import problems
    from spike_petsc_tpu.ordering.awbm import awbm
    from spike_petsc_tpu.ordering.mc64 import mc64
    from spike_petsc_tpu.ordering.rcm import rcm

    def mark(label, t0):
        dt = time.perf_counter() - t0
        print(f"{label}: {dt * 1e3:.1f} ms")
        return dt

    t0 = time.perf_counter()
    a = problems.illscaled_nonsym(n, 6, 6, seed=0)
    mark(f"gen illscaled n={n} nnz={a.nnz}", t0)

    t0 = time.perf_counter()
    r5 = mc64(a, job=5)
    mark("mc64 job5 (native SAP)", t0)

    t0 = time.perf_counter()
    awbm(a)
    mark("awbm (vectorized Duff-Koster)", t0)

    # device auction (the MPI-parallel matching analog) on the default
    # backend — exercise + time, exactness not required (eps-scaled)
    try:
        from spike_petsc_tpu.parallel.matching_dev import auction_match
        t0 = time.perf_counter()
        ra = auction_match(a)
        dt = mark(f"device auction (rounds={ra.info.get('rounds')})", t0)
        del ra, dt
    except Exception as exc:  # noqa: BLE001
        print(f"device auction failed: {type(exc).__name__}: {exc}")

    dp0 = hsp.diagonal_weight_product(a)
    t0 = time.perf_counter()
    pa = r5.apply(a, scale=True)
    mark("apply scale+permute", t0)
    dp1 = hsp.diagonal_weight_product(pa)
    print(f"diag weight product {dp0:.3e} -> {dp1:.3e}")

    t0 = time.perf_counter()
    rr = rcm(pa)
    pb = rr.apply(pa)
    mark(f"rcm (bandwidth {hsp.compute_bandwidth(pa)} -> "
         f"{hsp.compute_bandwidth(pb)})", t0)

    t0 = time.perf_counter()
    ext = hsp.extract_banded(pb, kmax=50, frac=0.9999)
    mark(f"extract_banded (k={ext.k}, frac_captured={ext.frac:.6f})", t0)

    t0 = time.perf_counter()
    data_np, kl, ku = hsp.csr_to_banded_arrays(ext.matrix, ext.k, ext.k)
    mark("pack band", t0)

    # device: factor + BiCGStab(SPIKE) on the extracted band
    from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve
    from spike_petsc_tpu.solvers.krylov import bicgstab

    dev_dtype = jnp.float32
    data = jnp.asarray(data_np, dev_dtype)
    band = BandedMatrix(data=data, kl=kl, ku=ku)
    K = 64
    t0 = time.perf_counter()
    fact_fn = jax.jit(lambda d: spike_factor(
        BandedMatrix(data=d, kl=kl, ku=ku), K=K, block_b=128))
    sfo = fact_fn(data)
    jax.block_until_ready(sfo.Btip)
    mark("device factor (compile+run)", t0)
    t0 = time.perf_counter()
    sfo = fact_fn(data)
    jax.block_until_ready(sfo.Btip)
    mark("device factor (warm)", t0)

    rhs = banded_matvec(band, jnp.ones((band.n,), dev_dtype))

    @jax.jit
    def solve(sf_in, b_in):
        res = bicgstab(lambda v: banded_matvec(band, v), b_in, None,
                       lambda v: spike_solve(sf_in, v), rtol=1e-8, maxit=50)
        return res.x, res.its, res.rnorm

    t0 = time.perf_counter()
    x, its, rnorm = solve(sfo, rhs)
    jax.block_until_ready(x)
    mark("bcgs solve (compile+run)", t0)
    t0 = time.perf_counter()
    x, its, rnorm = solve(sfo, rhs)
    jax.block_until_ready(x)
    mark("bcgs solve (warm)", t0)
    rel = float(np.asarray(jnp.linalg.norm(banded_matvec(band, x) - rhs)
                           / jnp.linalg.norm(rhs)))
    print(f"bcgs its={int(np.asarray(its))} relres={rel:.3e} "
          f"err_vs_ones={float(np.asarray(jnp.max(jnp.abs(x - 1.0)))):.3e}")

    # fiedler multilevel at the same scale (config-4 class input)
    from spike_petsc_tpu.ordering.fiedler import fiedler
    nx = int(np.sqrt(n))
    lap = problems.laplacian_2d(nx, nx)
    t0 = time.perf_counter()
    fiedler(lap)
    mark(f"fiedler multilevel lap2d {nx}x{nx}", t0)


if __name__ == "__main__":
    main()
