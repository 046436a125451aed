"""Benchmark: SPIKE banded solve at the BASELINE.json target config.

Target metric (BASELINE.md): banded solve wall-clock + GFLOP/s at N=1e6,
bandwidth 201 (kl=ku=100); baseline is LAPACK-on-CPU banded factor/solve
(the PETSc-CPU ``-pc_type lu`` path of the reference's canned recipe,
/root/reference/src/makefile:17-18), measured here in the same precision
(f32 gbtrf/gbtrs) on this host.

Prints ONE JSON line:
  {"metric": ..., "value": <tpu solve ms>, "unit": "ms",
   "vs_baseline": <cpu_solve_ms / tpu_solve_ms>, ...extras}

Timing methodology for the axon TPU tunnel (which adds tens of ms of
per-dispatch latency, makes block_until_ready unreliable, and serializes
jit closure constants into the remote-compile POST):
  * factors are EXPLICIT jit arguments (never closure-captured),
  * R chained solves run inside one lax.fori_loop dispatch,
  * completion is forced by a small host readback of the result,
  * per-solve time = (T(R_big) - T(R_small)) / (R_big - R_small).

Env overrides: SPIKE_BENCH_N, SPIKE_BENCH_HALFBW, SPIKE_BENCH_PARTS,
SPIKE_BENCH_DTYPE (f32|bf16 factor storage).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve

    n = int(os.environ.get("SPIKE_BENCH_N", 1_000_000))
    k = int(os.environ.get("SPIKE_BENCH_HALFBW", 100))      # bandwidth 2k+1
    K = int(os.environ.get("SPIKE_BENCH_PARTS", 64))
    store = os.environ.get("SPIKE_BENCH_DTYPE", "f32")
    store_dtype = jnp.bfloat16 if store == "bf16" else None
    # round-2 default: block-Thomas factors solved by the fused manual-DMA
    # Pallas sweep (727 GB/s streaming) + stored spikes (one factor pass +
    # V/W correction instead of two passes) + Newton-Schulz Schur inverses
    # in the factor (10.7x the blocked recursion).  Measured on v5e:
    # solve ~3.2 ms, factor ~130 ms (round-1 CR recompute: 7.1 ms / 482 ms).
    method = os.environ.get("SPIKE_BENCH_METHOD", "inv")
    spikes = os.environ.get("SPIKE_BENCH_SPIKES", "1") == "1"
    impl = os.environ.get("SPIKE_BENCH_IMPL", "auto")
    # bf16-stored V/W spikes are accuracy-free at this config (f64-checked
    # residual 8.29e-5 vs 8.25e-5 with f32 spikes: the spike columns decay
    # exponentially away from the interfaces, so their bf16 rounding is
    # absolutely tiny) and cut per-solve streaming by 0.4 GB: 3.3 -> 2.4 ms
    spike_store = os.environ.get("SPIKE_BENCH_SPIKE_DTYPE", "bf16")
    spike_dtype = jnp.bfloat16 if spike_store == "bf16" else None
    w = 2 * k + 1
    dtype = jnp.float32
    platform = jax.devices()[0].platform

    # diagonally dominant random band, built directly on device
    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), dtype, minval=-1.0, maxval=1.0)
    data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    band = BandedMatrix(data=data, kl=k, ku=k)
    rhs = banded_matvec(band, jnp.ones((n,), dtype))
    _ = np.asarray(rhs[:8])          # force materialization

    @partial(jax.jit, static_argnames=("K", "kl", "ku"))
    def factor_fn(d, K, kl, ku):
        return spike_factor(BandedMatrix(data=d, kl=kl, ku=ku), K=K,
                            block_b=128, method=method,
                            store_spikes=spikes, store_dtype=store_dtype,
                            spike_dtype=spike_dtype)

    @partial(jax.jit, static_argnames=("r",))
    def solve_loop(sf, b, r):
        return jax.lax.fori_loop(
            0, r, lambda i, y: spike_solve(sf, y, impl=impl), b)

    # block_until_ready is UNRELIABLE through the axon tunnel (some processes
    # return immediately); force completion by reading back a tiny derived
    # array computed from the result.  The fixed readback latency cancels in
    # the chained-loop difference.
    @jax.jit
    def _digest(x):
        return x.ravel()[:1024] * 1.0

    def sync(tree):
        leaf = next(l for l in jax.tree_util.tree_leaves(tree)
                    if hasattr(l, "ravel") and getattr(l, "size", 0))
        return np.asarray(_digest(leaf))

    def timed(fn):
        t0 = time.perf_counter()
        sync(fn())
        return time.perf_counter() - t0

    # ---- TPU factor ---------------------------------------------------------
    factor_compile_s = timed(lambda: factor_fn(data, K, k, k))
    sf = factor_fn(data, K, k, k)
    sync(sf)
    factor_s = min(timed(lambda: factor_fn(data, K, k, k)) for _ in range(3))

    # ---- TPU solve (chained-loop differenced timing) ------------------------
    timed(lambda: solve_loop(sf, rhs, 2))       # compile
    timed(lambda: solve_loop(sf, rhs, 22))      # compile
    t_small = min(timed(lambda: solve_loop(sf, rhs, 2)) for _ in range(5))
    t_big = min(timed(lambda: solve_loop(sf, rhs, 22)) for _ in range(5))
    solve_s = max(t_big - t_small, 1e-9) / 20.0
    # sanity guard: if the difference collapsed (tunnel anomaly), report the
    # conservative single-loop estimate instead of a bogus near-zero number
    if solve_s < 1e-5:
        solve_s = max(t_big / 22.0, t_small / 2.0)

    x = solve_loop(sf, rhs, 1)
    res = banded_matvec(band, x) - rhs
    rel = jnp.linalg.norm(res) / jnp.linalg.norm(rhs)
    relres = float(np.asarray(rel))

    # BASELINE's second metric: Krylov iterations with the SPIKE
    # preconditioner (exact factorization -> direct-solve-quality PC; the
    # preconditioned GMRES residual collapses immediately)
    from spike_petsc_tpu.solvers.krylov import gmres

    @jax.jit
    def gmres_run(band_data, sf_in, b_in):
        bnd = BandedMatrix(data=band_data, kl=k, ku=k)
        r = gmres(lambda v: banded_matvec(bnd, v), b_in, None,
                  lambda v: spike_solve(sf_in, v), rtol=1e-8, maxit=30,
                  restart=30)
        return r.its, r.rnorm
    g_its, g_rnorm = gmres_run(data, sf, rhs)
    g_its = int(np.asarray(g_its))
    g_rel = float(np.asarray(g_rnorm)) / float(np.asarray(
        jnp.linalg.norm(rhs)))
    # end-to-end preconditioned-GMRES wall clock (matvec + PC + reductions)
    gmres_s = min(timed(lambda: gmres_run(data, sf, rhs)) for _ in range(3))

    # ---- CPU LAPACK baseline (same precision) ------------------------------
    if os.environ.get("SPIKE_BENCH_SKIP_CPU") == "1":
        # quick TPU-only iteration mode
        print(json.dumps({
            "metric": f"spike_banded_solve_n{n}_bw{w}_wallclock",
            "value": round(solve_s * 1e3, 4), "unit": "ms",
            "vs_baseline": None, "partitions": K,
            "tpu_factor_ms": round(factor_s * 1e3, 3),
            "rel_residual_f32": relres,
            "gmres_spikepc_its_rtol1e8": g_its,
            "gmres_wall_ms": round(gmres_s * 1e3, 2)}))
        return

    from scipy.linalg import lapack

    ab = np.zeros((2 * k + k + 1, n), dtype=np.float32, order="F")
    data_np = np.asarray(data)
    for d in range(-k, k + 1):
        ab[k + k - d, max(0, d):n + min(0, d)] = \
            data_np[max(0, -d):n - max(0, d), d + k]
    rhs_np = np.asarray(rhs, dtype=np.float32)

    t0 = time.perf_counter()
    lub, ipiv, info = lapack.sgbtrf(ab, k, k)
    cpu_factor_s = time.perf_counter() - t0
    assert info == 0, f"sgbtrf failed: {info}"

    def cpu_solve():
        xb, info2 = lapack.sgbtrs(lub, k, k, rhs_np, ipiv)
        assert info2 == 0
        return xb

    cpu_solve()  # warm
    cpu_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        cpu_solve()
        cpu_times.append(time.perf_counter() - t0)
    cpu_solve_s = min(cpu_times)

    # ---- report -------------------------------------------------------------
    # Flop models (labeled separately — ADVICE r1): the blocked-algorithm
    # rate counts the flops the b-blocked kernel actually executes (method-
    # dependent, from the real block size sf.b); the useful-band rate counts
    # only the 2*n*(kl+ku+1)-per-sweep-pair flops of an ideal scalar banded
    # solve.  recompute-SPIKE applies the partition solver twice per solve.
    # stored-spikes solves stream the partition factors ONCE plus the V/W
    # spike blocks; recompute solves stream the factors twice
    sweeps = 1 if (sf.V is not None or K == 1) else 2
    bb = sf.b
    if method == "cr":
        alg_flops_per_sweep = 10.0 * n * bb   # CR: down 4 + up 6 matmuls/elt
    else:
        alg_flops_per_sweep = 6.0 * n * bb    # block-Thomas: fwd 2 + bwd 4
    alg_flops = sweeps * alg_flops_per_sweep
    if sf.V is not None and K > 1:
        alg_flops += 2.0 * 2.0 * n * sf.k     # V and W correction matvecs
    band_flops = 2 * 2.0 * n * w              # ideal scalar two-sweep solve
    # effective streaming bandwidth: sweeps are read-bound on the stored
    # factor blocks (+ spikes in stored-spikes mode)
    import jax as _jax
    fact_bytes = sum(l.size * l.dtype.itemsize
                     for l in _jax.tree_util.tree_leaves(sf.fact))
    vw_bytes = sum(l.size * l.dtype.itemsize
                   for l in _jax.tree_util.tree_leaves((sf.V, sf.W)))
    eff_gbs = (sweeps * fact_bytes + vw_bytes) / solve_s / 1e9
    out = {
        "metric": f"spike_banded_solve_n{n}_bw{w}_wallclock",
        "value": round(solve_s * 1e3, 4),
        "unit": "ms",
        "vs_baseline": round(cpu_solve_s / solve_s, 3),
        "platform": platform,
        "partitions": K,
        "factor_store_dtype": store,
        "spike_store_dtype": spike_store if sf.V is not None else None,
        "method": method,
        "store_spikes": sf.V is not None,
        "impl": impl,
        "gflops_blocked_alg": round(alg_flops / solve_s / 1e9, 2),
        "gflops_useful_band": round(band_flops / solve_s / 1e9, 2),
        "factor_stream_gbs": round(eff_gbs, 1),
        "tpu_factor_ms": round(factor_s * 1e3, 3),
        "cpu_factor_ms": round(cpu_factor_s * 1e3, 3),
        "cpu_solve_ms": round(cpu_solve_s * 1e3, 3),
        "factor_speedup": round(cpu_factor_s / factor_s, 3),
        "factor_plus_solve_speedup": round(
            (cpu_factor_s + cpu_solve_s) / (factor_s + solve_s), 3),
        "rel_residual_f32": relres,
        "gmres_spikepc_its_rtol1e8": g_its,
        "gmres_final_relres": g_rel,
        "gmres_wall_ms": round(gmres_s * 1e3, 2),
        "factor_compile_s": round(factor_compile_s, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
