"""Dissect batched-Krylov serving cost (VERDICT r4 weak #5 / next #6).

BENCH r4/r5: krylov_serve_ms_per_rhs_r32 = 1.48-1.51 at max_its=1 vs
preonly serve 0.43 — 3.5x for "one iteration".  The cost model says that
ratio is structural AT rtol=1e-8 with a bf16-spike PC:

  * a one-shot PCApply leaves relres ~8e-5 (bf16 spike storage), so the
    BiCGStab HALF-step residual (s = r - alpha A M^-1 r) cannot pass an
    1e-8 test — the half-step exit (krylov_many.py) never fires and the
    full iteration runs: 2 PCApplies + 2 matvecs, plus the initial
    residual, the final true-residual matvec, and ~10 [n, r] vector
    streams (freeze-masking included).
  * 2 PCApplies alone = 2x preonly; everything else is the remaining
    ~1.5x.

This lab measures each term through the library surface at the bench
config and the rtol ladder (1e-8 / 1e-4) — at 1e-4 the half-step exit
fires and serving cost approaches 1 PCApply + 1 matvec.

Run on the TPU:  python experiments/lab_krylov_serve.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main() -> None:
    plat = os.environ.get("PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
    from spike_petsc_tpu.ops.spike import (spike_factor, spike_solve_many)
    from spike_petsc_tpu.solvers.krylov_many import bicgstab_many
    from spike_petsc_tpu.solvers.operator import as_matvec_many

    n = int(os.environ.get("N", 1_000_000))
    k = int(os.environ.get("HALFBW", 100))
    K, r = 64, 32
    w = 2 * k + 1
    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), jnp.float32, -1.0, 1.0)
    data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    B = jax.random.normal(jax.random.PRNGKey(3), (n, r), jnp.float32)

    @jax.jit
    def factor_fn(d):
        return spike_factor(BandedMatrix(data=d, kl=k, ku=k), K=K,
                            block_b=128, store_spikes=True,
                            spike_dtype=jnp.bfloat16,
                            inverter="newton_fixed")

    sf = factor_fn(data)

    def digest(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:64])

    def timed_loop(fn_loop, label, per_rhs=True):
        fn_loop(2)
        digest(fn_loop(2))
        t1 = min((lambda t0: (digest(fn_loop(2)), time.perf_counter() - t0)
                  )(time.perf_counter())[1] for _ in range(3))
        t2 = min((lambda t0: (digest(fn_loop(12)), time.perf_counter() - t0)
                  )(time.perf_counter())[1] for _ in range(3))
        s = max(t2 - t1, 1e-9) / 10.0
        if s < 1e-5:
            s = t1 / 2.0
        unit = s * 1e3 / (r if per_rhs else 1)
        print(f"{label}: {s*1e3:.3f} ms total"
              + (f"  ({unit:.4f} ms/RHS)" if per_rhs else ""), flush=True)
        return s

    # --- components -------------------------------------------------------
    @partial(jax.jit, static_argnames=("reps",))
    def pc_loop(sf_in, X, reps):
        return jax.lax.fori_loop(
            0, reps, lambda i, Y: spike_solve_many(
                sf_in, Y / jnp.max(jnp.abs(Y))), X)

    timed_loop(lambda rr: pc_loop(sf, B, rr), "pc_apply_many")

    @partial(jax.jit, static_argnames=("reps",))
    def mv_loop(d, X, reps):
        mv_many, _, _ = as_matvec_many(BandedMatrix(data=d, kl=k, ku=k))
        return jax.lax.fori_loop(
            0, reps, lambda i, Y: mv_many(Y / jnp.max(jnp.abs(Y))), X)

    timed_loop(lambda rr: mv_loop(data, B, rr), "matvec_many(blocktri)")

    # --- bcgs ladder ------------------------------------------------------
    for rtol in (1e-8, 1e-4):
        @partial(jax.jit, static_argnames=("reps",))
        def ks_loop(d, sf_in, X, reps, rtol=rtol):
            mv_many, _, _ = as_matvec_many(BandedMatrix(data=d, kl=k, ku=k))

            def body(i, carry):
                Bc, its = carry
                res = bicgstab_many(
                    mv_many, Bc, None,
                    lambda Y: spike_solve_many(sf_in, Y),
                    rtol=rtol, maxit=20)
                return Bc + 0.0 * res.x, jnp.maximum(its, jnp.max(res.its))
            out = jax.lax.fori_loop(0, reps, body,
                                    (X, jnp.zeros((), jnp.int32)))
            return out

        s = timed_loop(lambda rr: ks_loop(data, sf, B, rr)[0],
                       f"bcgs_many rtol={rtol:g}")
        _, its = ks_loop(data, sf, B, 1)
        print(f"  max_its at rtol={rtol:g}: {int(np.asarray(its))}",
              flush=True)


if __name__ == "__main__":
    main()
