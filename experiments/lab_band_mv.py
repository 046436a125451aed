"""Measure banded matvec routes on the attached TPU.

Routes: XLA shifted-axpy (ops/band.py), blocktri DMA conversion route
(solvers/operator.py as_matvec), and the Pallas banded kernel
(ops/pallas/band_matvec.py).  Chained fori_loop differenced timing per
bench.py's axon methodology.

Usage: python experiments/lab_band_mv.py [n] [k] ...
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
from spike_petsc_tpu.solvers.operator import as_matvec
from spike_petsc_tpu.ops.pallas.band_matvec import (
    banded_mv_feasible, prepare_banded_mv, banded_matvec_prepared)


@jax.jit
def _digest(x):
    return x.ravel()[:1024] * 1.0


def sync(x):
    return np.asarray(_digest(x))


def timed(fn):
    t0 = time.perf_counter()
    sync(fn())
    return time.perf_counter() - t0


def measure(name, loop, r_small=2, r_big=22, reps=5):
    try:
        t0 = time.perf_counter()
        timed(lambda: loop(r_small))
        compile_s = time.perf_counter() - t0
        timed(lambda: loop(r_big))
        ts = min(timed(lambda: loop(r_small)) for _ in range(reps))
        tb = min(timed(lambda: loop(r_big)) for _ in range(reps))
        ms = max(tb - ts, 1e-9) / (r_big - r_small) * 1e3
        return ms, compile_s
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAILED {type(e).__name__}: {e}")
        return None, None


def run(n, k):
    w = 2 * k + 1
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), dtype, minval=-1.0, maxval=1.0)
    data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    band = BandedMatrix(data=data, kl=k, ku=k)
    x0 = jnp.ones((n,), dtype)
    band_gb = n * w * 4 / 1e9
    print(f"== n={n} k={k} w={w}  band={band_gb*1e3:.1f} MB")

    # correctness cross-check (normalize each mv to avoid overflow in chains)
    ref = np.asarray(banded_matvec(band, x0))

    # 1) XLA shifted-axpy
    @partial(jax.jit, static_argnames=("r",))
    def loop_xla(r, x=x0):
        return jax.lax.fori_loop(
            0, r, lambda i, y: banded_matvec(band, y / jnp.max(jnp.abs(y))), x)
    ms, cs = measure("xla", lambda r: loop_xla(r))
    if ms is not None:
        print(f"  xla shifted-axpy : {ms:8.3f} ms  {band_gb/ms*1e3:6.1f} GB/s"
              f"  (compile {cs:.1f}s)")

    # 2) as_matvec route (blocktri DMA on TPU for wide bands)
    mv, _, _ = as_matvec(band)
    got = np.asarray(mv(x0))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    @partial(jax.jit, static_argnames=("r",))
    def loop_op(r, x=x0):
        return jax.lax.fori_loop(
            0, r, lambda i, y: mv(y / jnp.max(jnp.abs(y))), x)
    ms, cs = measure("as_matvec", lambda r: loop_op(r))
    if ms is not None:
        print(f"  as_matvec route  : {ms:8.3f} ms  {band_gb/ms*1e3:6.1f} GB/s"
              f"  (compile {cs:.1f}s, relerr {err:.1e})")

    # 3) Pallas banded kernel
    if banded_mv_feasible(band):
        t0 = time.perf_counter()
        prep = prepare_banded_mv(band)
        sync(prep.d3)
        prep_s = time.perf_counter() - t0
        got = np.asarray(banded_matvec_prepared(prep, x0))
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        @partial(jax.jit, static_argnames=("r",))
        def loop_pl(r, x=x0):
            return jax.lax.fori_loop(
                0, r,
                lambda i, y: banded_matvec_prepared(
                    prep, y / jnp.max(jnp.abs(y))), x)
        ms, cs = measure("pallas", lambda r: loop_pl(r))
        if ms is not None:
            print(f"  pallas banded    : {ms:8.3f} ms  {band_gb/ms*1e3:6.1f}"
                  f" GB/s  (compile {cs:.1f}s, prep {prep_s:.2f}s,"
                  f" S={prep.S}, relerr {err:.1e})")


def run_df64(n, k):
    """Emulated-f64 stage: precision (vs x64 XLA reference) and wall time.
    On real TPU this validates that Mosaic preserves the kernel's
    error-free transforms (XLA:CPU codegen does NOT — see
    tests/test_band_matvec_pallas.py::_Ref)."""
    from spike_petsc_tpu.ops.pallas.band_matvec import (
        banded_matvec_prepared_f64, prepare_banded_mv_f64)
    jax.config.update("jax_enable_x64", True)
    try:
        w = 2 * k + 1
        key = jax.random.PRNGKey(0)
        data = jax.random.uniform(key, (n, w), jnp.float64,
                                  minval=-1.0, maxval=1.0)
        band = BandedMatrix(data=data, kl=k, ku=k)
        x = jax.random.uniform(jax.random.fold_in(key, 1), (n,), jnp.float64)
        ref = np.asarray(banded_matvec(band, x))       # XLA emulated f64
        prep = prepare_banded_mv_f64(band)
        got = np.asarray(banded_matvec_prepared_f64(prep, x))
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"== df64 n={n} k={k}: relerr vs x64-XLA = {rel:.2e}"
              f"  ({'EFTs PRESERVED' if rel < 1e-12 else 'EFTs BROKEN'})")

        @partial(jax.jit, static_argnames=("r",))
        def loop_pl(r, x=x):
            return jax.lax.fori_loop(
                0, r, lambda i, y: banded_matvec_prepared_f64(
                    prep, y / jnp.max(jnp.abs(y))), x)
        ms, cs = measure("df64 pallas", lambda r: loop_pl(r))
        gb = 2 * n * w * 4 / 1e9
        if ms is not None:
            print(f"  df64 pallas      : {ms:8.3f} ms  {gb/ms*1e3:6.1f} GB/s"
                  f"  (compile {cs:.1f}s)")

        @partial(jax.jit, static_argnames=("r",))
        def loop_xla(r, x=x):
            return jax.lax.fori_loop(
                0, r, lambda i, y: banded_matvec(
                    band, y / jnp.max(jnp.abs(y))), x)
        ms, cs = measure("df64 xla", lambda r: loop_xla(r))
        if ms is not None:
            print(f"  x64 XLA          : {ms:8.3f} ms  {gb/ms*1e3:6.1f} GB/s"
                  f"  (compile {cs:.1f}s)")
    finally:
        jax.config.update("jax_enable_x64", False)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = int(args[0]) if args else 1_000_000
    ks = [int(v) for v in args[1:]] or [100, 6, 50, 255]
    print(f"backend: {jax.default_backend()}")
    for k in ks:
        run(n, k)
    if "--df64" in sys.argv or len(sys.argv) <= 2:
        run_df64(n, ks[0])
