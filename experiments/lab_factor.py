"""Perf lab: batched [B,128,128] inversion strategies (the factor hot spot).

cr_factor spends most of its 480 ms in batched_inverse calls (total ~8128
blocks at the bench config).  Candidates measured here on the real TPU:

  solve_lapack     jnp.linalg.solve (pivoted LU loop lowering)
  blocked32        current blocked Schur recursion, base 32 (HIGHEST matmuls)
  blocked64        base 64
  blocked32_def    blocked recursion with DEFAULT-precision matmuls
  newton_bf16      bf16 blocked inverse (DEFAULT) + 2 f32 Newton steps
  newton_diag      Jacobi init + fixed Newton iterations (dd matrices only)

Accuracy metric: max over batch of ||S X - I||_inf.
"""
from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("LAB_B", 8128))
    b = int(os.environ.get("LAB_BLK", 128))
    dtype = jnp.float32

    key = jax.random.PRNGKey(1)
    S = jax.random.uniform(key, (B, b, b), dtype, minval=-1.0, maxval=1.0)
    # diagonally dominant, like post-MC64 Schur complements
    rs = jnp.sum(jnp.abs(S), axis=-1)
    S = S + jnp.eye(b, dtype=dtype) * (rs + 1.0)[..., None] * 0  # keep S
    S = S.at[:, jnp.arange(b), jnp.arange(b)].set(rs + 1.0)
    _ = np.asarray(S[:1, :1, :1])

    @jax.jit
    def _digest(x):
        return x.ravel()[:1024] * 1.0

    def sync(x):
        return np.asarray(_digest(x))

    def timed(fn):
        t0 = time.perf_counter()
        sync(fn())
        return time.perf_counter() - t0

    def per_iter(loop_fn, small=1, big=4, reps=3):
        timed(lambda: loop_fn(small))
        timed(lambda: loop_fn(big))
        ts = min(timed(lambda: loop_fn(small)) for _ in range(reps))
        tb = min(timed(lambda: loop_fn(big)) for _ in range(reps))
        dt = max(tb - ts, 1e-9) / (big - small)
        if dt < 1e-5:
            dt = max(tb / big, ts / small)
        return dt

    HI = jax.lax.Precision.HIGHEST

    def blocked(Sb, base, precision):
        nn = Sb.shape[-1]
        if nn <= base:
            return jnp.linalg.solve(
                Sb, jnp.broadcast_to(jnp.eye(nn, dtype=Sb.dtype), Sb.shape))
        h = nn // 2
        A = Sb[..., :h, :h]
        Bq = Sb[..., :h, h:]
        C = Sb[..., h:, :h]
        D = Sb[..., h:, h:]
        mm = partial(jnp.matmul, precision=precision)
        Ai = blocked(A, base, precision)
        CAi = mm(C, Ai)
        Sci = blocked(D - mm(CAi, Bq), base, precision)
        AiB = mm(Ai, Bq)
        TL = Ai + mm(mm(AiB, Sci), CAi)
        top = jnp.concatenate([TL, -mm(AiB, Sci)], axis=-1)
        bot = jnp.concatenate([-mm(Sci, CAi), Sci], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    def newton_steps(Sb, X, steps, precision):
        eye2 = 2.0 * jnp.eye(Sb.shape[-1], dtype=Sb.dtype)
        mm = partial(jnp.matmul, precision=precision)
        for _ in range(steps):
            X = mm(X, eye2 - mm(Sb, X))
        return X

    cases = {
        "solve_lapack": lambda Sb: jnp.linalg.solve(
            Sb, jnp.broadcast_to(jnp.eye(b, dtype=Sb.dtype), Sb.shape)),
        "blocked32": lambda Sb: blocked(Sb, 32, HI),
        "blocked64": lambda Sb: blocked(Sb, 64, HI),
        "blocked32_def": lambda Sb: blocked(
            Sb, 32, jax.lax.Precision.DEFAULT),
        "newton_bf16": lambda Sb: newton_steps(
            Sb, blocked(Sb.astype(jnp.bfloat16), 32,
                        jax.lax.Precision.DEFAULT).astype(jnp.float32),
            2, HI),
        "newton_bf16_3": lambda Sb: newton_steps(
            Sb, blocked(Sb.astype(jnp.bfloat16), 32,
                        jax.lax.Precision.DEFAULT).astype(jnp.float32),
            3, HI),
        "newton_diag6": lambda Sb: newton_steps(
            Sb, jax.vmap(jnp.diag)(
                1.0 / jnp.diagonal(Sb, axis1=-2, axis2=-1)),
            6, HI),
    }

    only = os.environ.get("LAB_ONLY")
    results = {}
    for name, fn in cases.items():
        if only and only not in name:
            continue
        jfn = jax.jit(fn)

        @partial(jax.jit, static_argnames=("r",))
        def loop(Sb, r, jfn=jfn):
            # alternate to defeat CSE: X depends on iteration
            def body(i, acc):
                X = jfn(Sb + acc * 0.0)
                return acc + X[0, 0, 0]
            return jax.lax.fori_loop(0, r, body, jnp.float32(0))

        try:
            dt = per_iter(lambda r: loop(S, r))
            X = jfn(S)
            E = jnp.max(jnp.abs(
                jnp.matmul(S, X, precision=HI)
                - jnp.eye(b, dtype=dtype)))
            err = float(np.asarray(E))
        except Exception as e:  # noqa: BLE001
            print(name, "FAILED:", repr(e)[:200], flush=True)
            continue
        results[name] = {"ms": round(dt * 1e3, 2), "maxerr": err}
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
