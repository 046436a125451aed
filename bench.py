"""Benchmark: SPIKE banded solve at the BASELINE.json target config.

Target metric (BASELINE.md): banded solve wall-clock + GFLOP/s at N=1e6,
bandwidth 201 (kl=ku=100); reference baseline is LAPACK-on-CPU banded
factor/solve (the PETSc-CPU ``-pc_type lu`` path of the reference's canned
recipe, /root/reference/src/makefile:17-18), measured here with the same
precision (f32 gbtrf/gbtrs) on this host.

Prints ONE JSON line:
  {"metric": ..., "value": <tpu solve ms>, "unit": "ms",
   "vs_baseline": <cpu_solve_ms / tpu_solve_ms>, ...extras}

Runs on whatever jax's default platform is (the real TPU chip under axon).
Env overrides: SPIKE_BENCH_N, SPIKE_BENCH_HALFBW, SPIKE_BENCH_PARTS,
SPIKE_BENCH_REPS.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _time(fn, reps: int, warmup: int = 2) -> float:
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _time_chained(make_loop, r_small: int, r_big: int) -> float:
    """Per-iteration device time with dispatch overhead cancelled.

    The axon tunnel adds tens of ms of fixed per-dispatch latency, so single
    calls cannot be timed.  We run R chained iterations inside ONE jitted
    lax.fori_loop (each iteration consumes the previous result — no CSE), for
    two values of R, and difference:   t_iter = (T(Rb) - T(Rs)) / (Rb - Rs).
    """
    import jax

    loop_s = make_loop(r_small)
    loop_b = make_loop(r_big)
    jax.block_until_ready(loop_s())     # compile
    jax.block_until_ready(loop_b())

    def run(fn):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        return time.perf_counter() - t0

    ts = min(run(loop_s) for _ in range(3))
    tb = min(run(loop_b) for _ in range(3))
    return max(tb - ts, 1e-9) / (r_big - r_small)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
    from spike_petsc_tpu.ops.spike import spike_factor, spike_solve

    n = int(os.environ.get("SPIKE_BENCH_N", 1_000_000))
    k = int(os.environ.get("SPIKE_BENCH_HALFBW", 100))      # bandwidth 2k+1
    K = int(os.environ.get("SPIKE_BENCH_PARTS", 64))
    reps = int(os.environ.get("SPIKE_BENCH_REPS", 10))
    w = 2 * k + 1
    dtype = jnp.float32

    platform = jax.devices()[0].platform

    # diagonally dominant random band, built directly on device
    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), dtype, minval=-1.0, maxval=1.0)
    rowsum = jnp.sum(jnp.abs(data), axis=1)
    data = data.at[:, k].set(rowsum + 1.0)
    band = BandedMatrix(data=data, kl=k, ku=k)

    rhs = banded_matvec(band, jnp.ones((n,), dtype))
    rhs.block_until_ready()

    # ---- TPU factor + solve ------------------------------------------------
    factor = jax.jit(lambda d: spike_factor(
        BandedMatrix(data=d, kl=k, ku=k), K=K, block_b=128, method="inv"))
    t0 = time.perf_counter()
    sf = factor(data)
    jax.block_until_ready(sf)
    factor_compile_s = time.perf_counter() - t0

    # chained-loop timing (see _time_chained): factor of data scaled by a
    # value derived from the previous factor, defeating CSE
    def make_factor_loop(r):
        @jax.jit
        def loop():
            def body(i, d):
                f = spike_factor(BandedMatrix(data=d, kl=k, ku=k), K=K,
                                 block_b=128, method="inv")
                eps = f.fact.Sinv[0, 0, 0, 0] * 0.0
                return d * (1.0 + eps)
            return jax.lax.fori_loop(0, r, body, data)
        return loop
    factor_s = _time_chained(make_factor_loop, 1, 1 + max(2, reps // 3))

    def make_solve_loop(r):
        @jax.jit
        def loop():
            def body(i, y):
                x = spike_solve(sf, y)
                return x / (1.0 + jnp.abs(x[0]) * 0.0)
            return jax.lax.fori_loop(0, r, body, rhs)
        return loop
    solve_s = _time_chained(make_solve_loop, 2, 2 + reps)

    x = spike_solve(sf, rhs)

    # accuracy check (f32): relative residual of the direct solve
    res = banded_matvec(band, x) - rhs
    relres = float(jnp.linalg.norm(res) / jnp.linalg.norm(rhs))

    # ---- CPU LAPACK baseline (same precision) ------------------------------
    from scipy.linalg import lapack

    # LAPACK banded storage with extra kl rows for fill
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

    cpu_solve_s = _time(cpu_solve, max(2, reps // 3), warmup=1)

    # ---- report -------------------------------------------------------------
    solve_flops = 2 * 2 * 3 * n * 128        # two sweeps of block-Thomas
    out = {
        "metric": f"spike_banded_solve_n{n}_bw{w}_wallclock",
        "value": round(solve_s * 1e3, 4),
        "unit": "ms",
        "vs_baseline": round(cpu_solve_s / solve_s, 3),
        "platform": platform,
        "partitions": K,
        "gflops": round(solve_flops / solve_s / 1e9, 2),
        "tpu_factor_ms": round(factor_s * 1e3, 3),
        "cpu_factor_ms": round(cpu_factor_s * 1e3, 3),
        "cpu_solve_ms": round(cpu_solve_s * 1e3, 3),
        "factor_speedup": round(cpu_factor_s / factor_s, 3),
        "factor_plus_solve_speedup": round(
            (cpu_factor_s + cpu_solve_s) / (factor_s + solve_s), 3),
        "rel_residual_f32": relres,
        "factor_compile_s": round(factor_compile_s, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
