"""Operator-route tuner: measure every SpMV route at YOUR shape, record it.

``bench.py`` records the measured matvec-route winner at its flagship config;
this tool does the same for arbitrary (n, bandwidth, dtype) so production
deployments can pre-tune the shapes they actually serve:

    python -m spike_petsc_tpu.tools.tune -n 1000000 -halfbw 100
    python -m spike_petsc_tpu.tools.tune -n 200000 -kl 13 -ku 13 -reps 20

Each run times the XLA shifted-axpy, blocktri-DMA, and banded-Pallas routes
through the library's own dispatch (``as_matvec(impl=...)``), prints one JSON
line, and merges the winner into the tuning record (``SPIKE_TUNING_FILE``,
default ``~/.cache/spike_petsc_tpu/tuning.json``) that
``as_matvec("auto")`` consults.

Timing methodology: chained ``lax.fori_loop`` repetitions with a tiny digest
readback, differenced between rep counts — dispatch/tunnel latency cancels
(the bench.py methodology; single-op timing through the axon tunnel is
meaningless).
"""

from __future__ import annotations

import json
import sys


def main(argv=None) -> int:
    import jax
    import jax.numpy as jnp

    from ..ops.band import BandedMatrix
    from ..solvers.operator import as_matvec_split
    from ..utils import tuning
    from ..utils.options import Options

    opts = Options.from_argv(sys.argv[1:] if argv is None else argv)
    platform_req = opts.get_string("platform")
    if platform_req:
        jax.config.update("jax_platforms", platform_req)
    n = opts.get_int("n", 1_000_000)
    hb = opts.get_int("halfbw", None)
    kl = opts.get_int("kl", hb if hb is not None else 100)
    ku = opts.get_int("ku", hb if hb is not None else 100)
    reps = opts.get_int("reps", 20)
    dt = opts.get_string("dtype", "f32")
    if dt == "f64":
        # without x64 the arrays silently downcast to f32 and the record
        # would mislabel f32 timings as f64 (code-review r3)
        jax.config.update("jax_enable_x64", True)
    dtype = {"f32": jnp.float32, "f64": jnp.float64,
             "bf16": jnp.bfloat16}[dt]
    w = kl + ku + 1
    platform = tuning.platform_key()    # generation-qualified ("tpu:v5lite")

    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), dtype, minval=-1.0, maxval=1.0)
    data = data.at[:, kl].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    band = BandedMatrix(data=data, kl=kl, ku=ku)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (n,), dtype)

    def route_ms(impl_name):
        # split form: the prepared operator is an explicit jit argument,
        # never a closure constant (tunnel remote-compiles serialize those)
        mv, operand, _, _ = as_matvec_split(band, impl=impl_name)
        if getattr(mv, "_route", None) != impl_name:
            return None                       # infeasible: dispatch fell back
        return tuning.measure_matvec_ms(mv, x0, reps=reps, operand=operand)

    routes = {}
    for name in ("xla", "blocktri", "banded_pallas"):
        ms = route_ms(name)
        if ms is not None:
            routes[name] = round(ms, 4)
    if not routes:
        print(json.dumps({"error": "no feasible route", "n": n, "w": w}))
        return 1
    winner = min(routes, key=routes.get)
    path = tuning.update(platform, "banded_matvec",
                         tuning.matvec_key(w, dtype), {
                             **{f"{k}_ms": v for k, v in routes.items()},
                             "winner": winner, "n": n, "dtype": dt})
    print(json.dumps({"platform": platform, "n": n, "w": w, "dtype": dt,
                      **{f"{k}_ms": v for k, v in routes.items()},
                      "winner": winner, "tuning_file": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
