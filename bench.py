"""Benchmark: SPIKE banded solve at the BASELINE.json target config.

Target metric (BASELINE.md): banded solve wall-clock + GFLOP/s at N=1e6,
bandwidth 201 (kl=ku=100); baseline is LAPACK-on-CPU banded factor/solve
(the PETSc-CPU ``-pc_type lu`` path of the reference's canned recipe,
/root/reference/src/makefile:17-18), measured here in the same precision
(f32 gbtrf/gbtrs) on this host.

Prints ONE JSON line:
  {"metric": ..., "value": <tpu solve ms>, "unit": "ms",
   "vs_baseline": <cpu_solve_ms / tpu_solve_ms>, ...extras}

Robustness contract (round-3/4 postmortems: the driver runs this script
under its own external timeout; the r3 run was killed mid-extras and
recorded NO result, and an r4 run proved a threading.Timer watchdog cannot
fire while the main thread sits in a GIL-holding tunnel readback): the run
is a sequence of STAGES that each merge their results into one shared dict,
which is dumped to a partial file after every stage.  The headline stages
(factor, solve, CPU baseline) run first; every extra is budget-gated and
exception-isolated; and a FORKED WATCHDOG PROCESS (immune to the parent's
GIL) prints the partial report to the shared stdout and SIGKILLs the
parent shortly after the soft budget expires.  The default budget is
deliberately small (420 s) — extras that don't fit are skipped and listed,
never allowed to starve the report.

Timing methodology for the axon TPU tunnel (which adds tens of ms of
per-dispatch latency, makes block_until_ready unreliable, and serializes
jit closure constants into the remote-compile POST):
  * factors are EXPLICIT jit arguments (never closure-captured),
  * R chained solves run inside one lax.fori_loop dispatch,
  * completion is forced by a small host readback of the result,
  * per-solve time = (T(R_big) - T(R_small)) / (R_big - R_small).

Env overrides: SPIKE_BENCH_N, SPIKE_BENCH_HALFBW, SPIKE_BENCH_PARTS,
SPIKE_BENCH_DTYPE (f32|bf16 factor storage), SPIKE_BENCH_BUDGET_S,
SPIKE_BENCH_STAGES (comma list to restrict the extras that run).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

# ---- report accumulator + watchdog ------------------------------------------
OUT: dict = {}
_emit_lock = threading.Lock()
_emitted = False
_DEADLINE = os.path.join(os.path.expanduser("~"), ".cache",
                         "spike_petsc_tpu", "bench_deadline")
_PARTIAL = os.path.join(os.path.expanduser("~"), ".cache",
                        "spike_petsc_tpu", "bench_partial.json")
_wd_pid = 0


def dump_partial() -> None:
    """Atomically persist the collected report so the forked watchdog can
    print it even after the main process is beyond saving."""
    try:
        os.makedirs(os.path.dirname(_PARTIAL), exist_ok=True)
        tmp = _PARTIAL + ".tmp"
        with open(tmp, "w") as f:
            json.dump(OUT, f)
        os.replace(tmp, _PARTIAL)
    except OSError:
        pass


def emit() -> None:
    """Print the single JSON report line exactly once.  Kills the watchdog
    child first so a parallel watchdog print cannot race this one."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return
        _emitted = True
        if _wd_pid:
            try:
                import signal
                os.kill(_wd_pid, signal.SIGKILL)
            except OSError:
                pass
        print(json.dumps(OUT), flush=True)


def _fork_watchdog(deadline: float) -> None:
    """GIL-proof watchdog: a FORKED child process prints the partial report
    to the (inherited) stdout and SIGKILLs the parent if it is still alive
    at the deadline.  A threading.Timer cannot do this job — the r4
    postmortem caught the main thread >20 min inside a GIL-holding axon
    tunnel readback, during which no Python thread (so no Timer callback)
    ever ran.  Forked BEFORE jax initializes, so the child owns no device
    handles and does nothing but sleep/read/kill."""
    global _wd_pid
    if os.environ.get("SPIKE_BENCH_WATCHDOG", "1") != "1":
        return
    try:
        os.remove(_PARTIAL)          # never report a stale previous run
    except OSError:
        pass
    try:
        os.remove(_DEADLINE)         # stale extension from a previous run
    except OSError:
        pass
    parent = os.getpid()
    pid = os.fork()
    if pid:
        _wd_pid = pid
        return
    import signal
    try:
        while time.time() < deadline:
            time.sleep(2.0)
            if os.getppid() != parent:      # parent already exited
                os._exit(0)
            try:
                # the parent may move the deadline mid-run (tunnel warm-up
                # compensation; written provisionally BEFORE the blocking
                # first readback, then corrected after) — the child cannot
                # be re-forked after jax initializes, so it re-reads a
                # deadline file and TRUSTS the latest sane value (max()
                # would make the provisional overshoot sticky)
                with open(_DEADLINE) as f:
                    cand = float(f.read().strip())
                if abs(cand - time.time()) < 3600.0:
                    deadline = cand
            except (OSError, ValueError):
                pass
        out = {"metric": "spike_banded_solve", "value": None, "unit": "ms",
               "vs_baseline": None}
        try:
            with open(_PARTIAL) as f:
                out = json.load(f)
        except (OSError, ValueError):
            pass
        out["watchdog_fired"] = True
        sys.stdout.write(json.dumps(out) + "\n")
        sys.stdout.flush()
        try:
            os.kill(parent, signal.SIGKILL)
        except OSError:
            pass
    finally:
        os._exit(0)


def main() -> None:
    # arm the watchdog FIRST (pre-jax fork: the child holds no TPU state);
    # budget clock starts here so jax/tunnel init counts against it
    t_start = time.perf_counter()
    # 540 s base: the axon plugin cannot serialize executables, so the
    # compile-heavy extras (transpose ~220-250 s, krylov_serve ~35 s)
    # recompile every run regardless of the XLA cache; a full
    # healthy-tunnel pass of every stage measures ~445-475 s (round-5
    # dress rehearsals).  The tunnel warm-up extension below adds up to
    # 180 s more on degraded sessions; the fork watchdog still bounds the
    # worst case (~765 s) and guarantees a JSON either way.
    budget_s = float(os.environ.get("SPIKE_BENCH_BUDGET_S", 540))
    _fork_watchdog(time.time() + budget_s + 45.0)

    # pure-env config first, so the partial report carries it even if the
    # run stalls inside jax/tunnel initialization
    n = int(os.environ.get("SPIKE_BENCH_N", 1_000_000))
    k = int(os.environ.get("SPIKE_BENCH_HALFBW", 100))      # bandwidth 2k+1
    K = int(os.environ.get("SPIKE_BENCH_PARTS", 64))
    store = os.environ.get("SPIKE_BENCH_DTYPE", "f32")
    method = os.environ.get("SPIKE_BENCH_METHOD", "inv")
    spikes = os.environ.get("SPIKE_BENCH_SPIKES", "1") == "1"
    impl = os.environ.get("SPIKE_BENCH_IMPL", "auto")
    spike_store = os.environ.get("SPIKE_BENCH_SPIKE_DTYPE", "bf16")
    inverter = os.environ.get("SPIKE_BENCH_INVERTER", "newton_fixed")
    w = 2 * k + 1
    r_serve = int(os.environ.get("SPIKE_BENCH_SERVE_RHS", 32))
    only = os.environ.get("SPIKE_BENCH_STAGES")
    only_set = set(s.strip() for s in only.split(",")) if only else None
    OUT.update({
        "metric": f"spike_banded_solve_n{n}_bw{w}_wallclock",
        "value": None, "unit": "ms", "vs_baseline": None,
        "platform": None, "partitions": K,
        "factor_store_dtype": store, "method": method, "impl": impl,
    })
    dump_partial()

    def _mark(label: str) -> None:
        print(f"bench: [{label}] at {time.perf_counter() - t_start:.1f}s",
              file=sys.stderr, flush=True)

    import jax
    import jax.numpy as jnp
    from functools import partial
    _mark("jax imported")

    # The axon plugin pins jax_platforms and IGNORES the JAX_PLATFORMS env
    # override — an explicit request (CI smoke on the host CPU) must go
    # through the config knob before first backend use.
    plat_req = os.environ.get("SPIKE_BENCH_PLATFORM")
    if plat_req:
        jax.config.update("jax_platforms", plat_req)

    # Persistent XLA compilation cache: the extras are COMPILE-bound through
    # the axon tunnel (krylov_serve measured >340 s of compiles on a cold
    # run) — warm executables cut repeat bench runs to the device time.
    # Guarded: harmless when the plugin cannot serialize executables.
    if os.environ.get("SPIKE_BENCH_CACHE", "1") == "1":
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(os.path.expanduser("~"), ".cache",
                             "spike_petsc_tpu", "xla_cache"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              2.0)
        except Exception:  # noqa: BLE001 — cache is an optimization only
            pass

    from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
    from spike_petsc_tpu.ops.spike import (spike_factor, spike_solve,
                                           spike_solve_many)

    # dtype resolution needs jnp; the string config was parsed pre-jax.
    # block-Thomas factors solved by the fused manual-DMA Pallas sweep
    # (727 GB/s streaming) + stored spikes (one factor pass + V/W correction
    # instead of two passes) + Newton-Schulz Schur inverses in the factor.
    # bf16-stored V/W spikes are accuracy-free at this config (f64-checked
    # residual 8.29e-5 vs 8.25e-5 with f32 spikes: the spike columns decay
    # exponentially away from the interfaces, so their bf16 rounding is
    # absolutely tiny) and cut per-solve streaming by 0.4 GB: 3.3 -> 2.4 ms.
    # inverter: the bench matrix is strongly diagonally dominant by
    # construction, so the fixed-schedule Newton (no per-step convergence
    # reduce on the scan critical path) is safe here; the library default
    # stays the adaptive guarded 'auto' (solvers/pc.py safety net).  relres
    # is checked below either way.
    store_dtype = jnp.bfloat16 if store == "bf16" else None
    spike_dtype = jnp.bfloat16 if spike_store == "bf16" else None
    dtype = jnp.float32
    platform = jax.devices()[0].platform
    OUT["platform"] = platform
    dump_partial()      # a warm-up hang's watchdog report carries this
    _mark("backend up")

    # diagonally dominant random band, built directly on device
    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n, w), dtype, minval=-1.0, maxval=1.0)
    data = data.at[:, k].set(jnp.sum(jnp.abs(data), axis=1) + 1.0)
    band = BandedMatrix(data=data, kl=k, ku=k)
    rhs = banded_matvec(band, jnp.ones((n,), dtype))
    _mark("operands built")

    def _write_deadline(extra: float) -> None:
        try:
            with open(_DEADLINE, "w") as f:
                f.write(str(time.time() + 45.0 + budget_s + extra
                            - (time.perf_counter() - t_start)))
        except OSError:
            pass

    # PROVISIONAL extension before the blocking readback: the readback
    # itself has hung >9 min on a flapping tunnel (round-5 rehearsal) —
    # at that point the parent is inside a GIL-holding native call and can
    # write nothing, so the allowance must be granted in advance (the
    # post-readback write below corrects it back down)
    _write_deadline(180.0)
    t_rb = time.perf_counter()
    _ = np.asarray(rhs[:8])          # force materialization (and pay the
    # tunnel's one-time first-readback cost, measured up to ~2 min on a
    # degraded session, OUTSIDE every timed region)
    readback_s = time.perf_counter() - t_rb
    _mark("first readback")
    OUT["first_readback_s"] = round(readback_s, 1)
    # The one-time tunnel warm-up is a SESSION property, not work: on a
    # degraded session it burns 190-260 s of the 420 s budget and every
    # extra stage gets skipped (BENCH_r04/r05 interim postmortems).  Extend
    # the budget by the measured warm-up beyond a healthy 30 s, capped at
    # 180 s — the fork watchdog still guarantees a JSON at budget + 45 s
    # (worst-case wall ~645 s), and stage gating now reflects compute
    # budget rather than tunnel luck.
    if readback_s > 30.0:
        extra_rb = min(readback_s - 30.0, 180.0)
        budget_s += extra_rb
        print(f"bench: budget +{extra_rb:.0f}s for tunnel warm-up "
              f"(readback {readback_s:.0f}s)", file=sys.stderr, flush=True)
    _write_deadline(0.0)      # correct the provisional pre-readback grant

    # ---- tunnel health probe --------------------------------------------
    # The axon tunnel's per-dispatch latency varies session-to-session by 5x+
    # (measured 28 ms .. 140 ms) and the driver runs this script under its
    # own EXTERNAL timeout (r3 was killed at it with no output): probe the
    # dispatch+readback cost once, then (a) cut repeat counts when the
    # tunnel is slow, (b) gate every extra stage on remaining budget (the
    # fork watchdog armed at the top of main handles everything else).
    skipped: list = []
    dump_partial()

    @jax.jit
    def _probe(x):
        return x[:64] * 1.0

    np.asarray(_probe(rhs))          # compile the probe

    def _disp_once() -> float:
        t0 = time.perf_counter()
        np.asarray(_probe(rhs))
        return time.perf_counter() - t0

    disp_s = min(_disp_once() for _ in range(4))
    slow_tunnel = disp_s > 0.2
    R5 = 2 if slow_tunnel else 5     # repeat counts for min-of-N timings
    R3 = 2 if slow_tunnel else 3
    OUT["tunnel_dispatch_ms"] = round(disp_s * 1e3, 1)
    print(f"bench: dispatch+readback probe {disp_s * 1e3:.0f} ms"
          f"{' (SLOW tunnel: reps reduced)' if slow_tunnel else ''}",
          file=sys.stderr, flush=True)

    def elapsed() -> float:
        return time.perf_counter() - t_start

    # Measured stage durations from previous runs ON THIS HOST: static
    # estimates are wrong by multiples when tunnel/compile behavior shifts
    # (krylov_serve was estimated at 75 s and measured >340 s cold — the r3
    # bench died inside it).  Gating prefers the recorded duration; every
    # completed run refreshes the record, so the driver's end-of-round run
    # gates on exactly what THIS session measured.
    _stages_path = os.path.join(os.path.expanduser("~"), ".cache",
                                "spike_petsc_tpu", "bench_stages.json")
    try:
        with open(_stages_path) as f:
            _stage_hist = json.load(f).get(platform, {})
    except (OSError, ValueError):
        _stage_hist = {}

    def _record_stage(name: str, dur_s: float) -> None:
        _stage_hist[name] = round(dur_s, 1)
        try:
            os.makedirs(os.path.dirname(_stages_path), exist_ok=True)
            try:
                with open(_stages_path) as f:
                    allp = json.load(f)
            except (OSError, ValueError):
                allp = {}
            allp[platform] = _stage_hist
            with open(_stages_path, "w") as f:
                json.dump(allp, f, indent=1, sort_keys=True)
        except OSError:
            pass

    def run_stage(name: str, est_s: float, fn) -> bool:
        """Run one budget-gated, exception-isolated extra stage.  Results
        are merged into OUT by the stage body itself, so a kill after this
        stage loses nothing earlier."""
        if only_set is not None and name not in only_set:
            skipped.append(name)
            return False
        est = est_s * (1.5 if slow_tunnel else 1.0)
        if name in _stage_hist:
            est = _stage_hist[name] * 1.25      # measured-here wins
        rem = budget_s - elapsed()
        if rem < est + 15.0:
            skipped.append(name)
            print(f"bench: SKIP {name} ({rem:.0f}s budget left < "
                  f"{est:.0f}+15)", file=sys.stderr, flush=True)
            return False
        t0 = time.perf_counter()
        # pessimistic sentinel: if this stage kills the run (watchdog or
        # driver timeout), the NEXT run's gate sees a huge recorded
        # duration and skips straight past it — successive runs converge
        # on a set of stages that completes
        _record_stage(name, max(est * 4.0, 900.0))
        try:
            fn()
        except Exception as exc:  # noqa: BLE001 — extras must not kill bench
            OUT[f"{name}_error"] = f"{type(exc).__name__}: {exc}"[:200]
        _record_stage(name, time.perf_counter() - t0)
        dump_partial()
        print(f"bench: {name} done at {elapsed():.0f}s",
              file=sys.stderr, flush=True)
        return True

    @partial(jax.jit, static_argnames=("K", "kl", "ku"))
    def factor_fn(d, K, kl, ku):
        return spike_factor(BandedMatrix(data=d, kl=kl, ku=ku), K=K,
                            block_b=128, method=method,
                            store_spikes=spikes, store_dtype=store_dtype,
                            spike_dtype=spike_dtype, inverter=inverter)

    @jax.jit   # loop count DYNAMIC: one compile per form
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

    # ======================= REQUIRED HEADLINE STAGES ========================

    # ---- TPU factor ---------------------------------------------------------
    factor_compile_s = timed(lambda: factor_fn(data, K, k, k))
    sf = factor_fn(data, K, k, k)
    sync(sf)
    factor_s = min(timed(lambda: factor_fn(data, K, k, k)) for _ in range(R3))
    OUT["tpu_factor_ms"] = round(factor_s * 1e3, 3)
    OUT["factor_compile_s"] = round(factor_compile_s, 2)
    OUT["spike_store_dtype"] = spike_store if sf.V is not None else None
    OUT["store_spikes"] = sf.V is not None
    print(f"bench: factor done at {elapsed():.0f}s", file=sys.stderr,
          flush=True)

    # ---- TPU solve (chained-loop differenced timing) ------------------------
    timed(lambda: solve_loop(sf, rhs, 2))       # compile
    timed(lambda: solve_loop(sf, rhs, 22))      # compile
    t_small = min(timed(lambda: solve_loop(sf, rhs, 2)) for _ in range(R5))
    t_big = min(timed(lambda: solve_loop(sf, rhs, 22)) for _ in range(R5))
    solve_s = max(t_big - t_small, 1e-9) / 20.0
    # sanity guard: if the difference collapsed (tunnel anomaly), report the
    # conservative single-loop estimate instead of a bogus near-zero number
    if solve_s < 1e-5:
        solve_s = max(t_big / 22.0, t_small / 2.0)
    OUT["value"] = round(solve_s * 1e3, 4)

    x = solve_loop(sf, rhs, 1)
    res = banded_matvec(band, x) - rhs
    rel = jnp.linalg.norm(res) / jnp.linalg.norm(rhs)
    OUT["rel_residual_f32"] = float(np.asarray(rel))

    # Flop models (labeled separately — ADVICE r1): the blocked-algorithm
    # rate counts the flops the b-blocked kernel actually executes (method-
    # dependent, from the real block size sf.b); the useful-band rate counts
    # only the 2*n*(kl+ku+1)-per-sweep-pair flops of an ideal scalar banded
    # solve.  recompute-SPIKE applies the partition solver twice per solve.
    sweeps = 1 if (sf.V is not None or K == 1) else 2
    bb_blk = sf.b
    if method == "cr":
        alg_flops_per_sweep = 10.0 * n * bb_blk   # CR: down 4 + up 6
    else:
        alg_flops_per_sweep = 6.0 * n * bb_blk    # block-Thomas: fwd 2 + bwd 4
    alg_flops = sweeps * alg_flops_per_sweep
    if sf.V is not None and K > 1:
        alg_flops += 2.0 * 2.0 * n * sf.k     # V and W correction matvecs
    band_flops = 2 * 2.0 * n * w              # ideal scalar two-sweep solve
    fact_bytes = sum(l.size * l.dtype.itemsize
                     for l in jax.tree_util.tree_leaves(sf.fact))
    vw_bytes = sum(l.size * l.dtype.itemsize
                   for l in jax.tree_util.tree_leaves((sf.V, sf.W)))
    OUT["gflops_blocked_alg"] = round(alg_flops / solve_s / 1e9, 2)
    OUT["gflops_useful_band"] = round(band_flops / solve_s / 1e9, 2)
    OUT["factor_stream_gbs"] = round(
        (sweeps * fact_bytes + vw_bytes) / solve_s / 1e9, 1)
    dump_partial()
    print(f"bench: solve done at {elapsed():.0f}s", file=sys.stderr,
          flush=True)

    # ---- CPU LAPACK baseline (same precision) -------------------------------
    # Runs EARLY (before every extra): it feeds the headline vs_baseline, so
    # a budget kill during the extras must not lose it.  The measurement is
    # HOST-KEYED CACHED (~/.cache): the baseline characterizes this host's
    # CPU, which does not change run to run — re-measuring it cost ~30 s of
    # every driver run (VERDICT r4 weak #2); SPIKE_BENCH_CPU_REFRESH=1
    # forces a fresh measurement.
    if os.environ.get("SPIKE_BENCH_SKIP_CPU") != "1":
        import socket

        _cpu_path = os.path.join(os.path.expanduser("~"), ".cache",
                                 "spike_petsc_tpu", "cpu_baseline.json")
        _cpu_key = f"{socket.gethostname()}:n{n}:k{k}:f32"
        _cpu_rec = None
        if os.environ.get("SPIKE_BENCH_CPU_REFRESH") != "1":
            try:
                with open(_cpu_path) as f:
                    _cpu_rec = json.load(f).get(_cpu_key)
            except (OSError, ValueError):
                _cpu_rec = None
        if _cpu_rec is not None:
            cpu_factor_s = _cpu_rec["factor_s"]
            cpu_solve_s = _cpu_rec["solve_s"]
            OUT["cpu_baseline_cached"] = True
        else:
            from scipy.linalg import lapack

            # host-side copy of the same problem CLASS, generated with
            # numpy — NEVER `np.asarray(data)`: that reads the 0.8 GB band
            # back through the axon tunnel, which on a slow session takes
            # MINUTES (this is what starved the r3 run past the driver
            # timeout).  The baseline is a timing measurement of identical
            # shape/precision/diagonal-dominance, not a bitwise parity
            # check.
            rng = np.random.default_rng(0)
            data_np = rng.random((n, w), dtype=np.float32) * 2.0 - 1.0
            data_np[:, k] = np.abs(data_np).sum(axis=1) + 1.0
            ab = np.zeros((2 * k + k + 1, n), dtype=np.float32, order="F")
            for d in range(-k, k + 1):
                ab[k + k - d, max(0, d):n + min(0, d)] = \
                    data_np[max(0, -d):n - max(0, d), d + k]
            rhs_np = np.ones((n,), dtype=np.float32)

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
            del ab, data_np, lub, ipiv, rhs_np
            try:
                os.makedirs(os.path.dirname(_cpu_path), exist_ok=True)
                try:
                    with open(_cpu_path) as f:
                        _cpu_all = json.load(f)
                except (OSError, ValueError):
                    _cpu_all = {}
                _cpu_all[_cpu_key] = {"factor_s": cpu_factor_s,
                                      "solve_s": cpu_solve_s}
                with open(_cpu_path, "w") as f:
                    json.dump(_cpu_all, f, indent=1, sort_keys=True)
            except OSError:
                pass
        OUT["cpu_factor_ms"] = round(cpu_factor_s * 1e3, 3)
        OUT["cpu_solve_ms"] = round(cpu_solve_s * 1e3, 3)
        OUT["vs_baseline"] = round(cpu_solve_s / solve_s, 3)
        OUT["factor_speedup"] = round(cpu_factor_s / factor_s, 3)
        OUT["factor_plus_solve_speedup"] = round(
            (cpu_factor_s + cpu_solve_s) / (factor_s + solve_s), 3)
        dump_partial()
        print(f"bench: cpu baseline done at {elapsed():.0f}s",
              file=sys.stderr, flush=True)

    # =========================== EXTRA STAGES ================================
    # Stage bodies are defined here; the ordered dispatch block at the
    # bottom runs them.  Ordering policy (VERDICT r4): stages whose numbers
    # the driver has NOT yet captured run FIRST (band_mv / tune /
    # f64_refine / transpose were all skipped-on-budget in BENCH_r04);
    # long-driver-stable stages (serve, factor_native, krylov_serve) run
    # last and are the natural victims of a tight budget.  gmres stays
    # first: it is BASELINE's second headline metric and cheap when warm.

    # ---- GMRES + SPIKE PC (BASELINE's second metric) ------------------------
    def stage_gmres():
        # exact factorization -> direct-solve-quality PC; the preconditioned
        # GMRES residual collapses immediately.  The operator rides the
        # diagonal-major banded Pallas matvec (1.06 ms / 760 GB/s at this
        # config — the library's measured route winner; the blocktri DMA
        # kernel is the fallback when the banded kernel is infeasible),
        # prepared ONCE and passed as an explicit jit operand.
        from spike_petsc_tpu.ops.pallas.band_matvec import (
            banded_matvec_prepared, banded_mv_feasible, prepare_banded_mv)
        from spike_petsc_tpu.solvers.krylov import gmres

        if banded_mv_feasible(w, n=n):
            prep = prepare_banded_mv(BandedMatrix(data=data, kl=k, ku=k))
            sync(prep.d3)
            mv_args = (prep,)

            def _mk_mv(pm):
                return lambda v: banded_matvec_prepared(pm, v)
            OUT["gmres_mv_route"] = "banded_pallas"
        else:
            from spike_petsc_tpu.ops.blocktri import (BlockTridiagonal,
                                                      band_to_blocktri)
            from spike_petsc_tpu.ops.pallas.matvec import (
                blocktri_matvec_dma, mv_padded_nb)
            T = jax.jit(lambda d: band_to_blocktri(
                BandedMatrix(data=d, kl=k, ku=k), 128))(data)
            bb = T.b
            nbp = mv_padded_nb(T.nb, bb)
            Tp = jax.jit(lambda D, L, U: BlockTridiagonal(
                D=jnp.pad(D, ((0, nbp - T.nb), (0, 0), (0, 0))),
                L=jnp.pad(L, ((0, nbp - T.nb), (0, 0), (0, 0))),
                U=jnp.pad(U, ((0, nbp - T.nb), (0, 0), (0, 0)))))(
                    T.D, T.L, T.U)
            sync(Tp)
            mv_args = (Tp.D, Tp.L, Tp.U)

            def _mk_mv(TD, TL, TU):
                Tm = BlockTridiagonal(D=TD, L=TL, U=TU)

                def mv(v):
                    xb = jnp.pad(v, (0, nbp * bb - n)).reshape(nbp, bb)
                    return blocktri_matvec_dma(Tm, xb).reshape(-1)[:n]
                return mv
            OUT["gmres_mv_route"] = "blocktri_dma"

        @jax.jit
        def gmres_once(*args):
            *mvop, sf_in, b_in = args
            res = gmres(_mk_mv(*mvop), b_in,
                        None, lambda v: spike_solve(sf_in, v), rtol=1e-8,
                        maxit=30, restart=30)
            return res.its, res.rnorm

        @jax.jit   # loop count DYNAMIC: one compile per form
        def gmres_loop(*args, r):
            *mvop, sf_in, b_in = args
            mv = _mk_mv(*mvop)

            def body(i, bcur):
                res = gmres(mv, bcur, None, lambda v: spike_solve(sf_in, v),
                            rtol=1e-8, maxit=30, restart=30)
                return bcur + 0.0 * res.x
            return jax.lax.fori_loop(0, r, body, b_in)

        g_its, g_rnorm = gmres_once(*mv_args, sf, rhs)
        OUT["gmres_spikepc_its_rtol1e8"] = int(np.asarray(g_its))
        OUT["gmres_final_relres"] = float(np.asarray(g_rnorm)) / float(
            np.asarray(jnp.linalg.norm(rhs)))
        timed(lambda: gmres_loop(*mv_args, sf, rhs, r=1))     # compile
        timed(lambda: gmres_loop(*mv_args, sf, rhs, r=5))     # compile
        t_g1 = min(timed(lambda: gmres_loop(*mv_args, sf, rhs, r=1))
                   for _ in range(R3))
        t_g5 = min(timed(lambda: gmres_loop(*mv_args, sf, rhs, r=5))
                   for _ in range(R3))
        gmres_s = max((t_g5 - t_g1) / 4.0, 1e-9)
        if gmres_s < 1e-4:          # tunnel anomaly guard, as for the solve
            gmres_s = t_g1
        OUT["gmres_wall_ms"] = round(gmres_s * 1e3, 2)

    # ---- multi-RHS serving (BASELINE config 2's batched mode) ---------------
    def stage_serve():
        # factors stream once for all r columns (fused multi-RHS Pallas
        # kernel below its VMEM crossover, the XLA scan beyond it —
        # spike_solve_many 'auto'); reported as ms per solve at r=32
        RHS = jax.random.normal(jax.random.PRNGKey(1), (n, r_serve), dtype)

        @jax.jit   # loop count DYNAMIC: one compile per form
        def serve_loop(sf_in, B, reps):
            def body(i, Bc):
                X = spike_solve_many(sf_in, Bc, impl=impl)
                return Bc + 0.0 * X
            return jax.lax.fori_loop(0, reps, body, B)

        timed(lambda: serve_loop(sf, RHS, 1))        # compile
        timed(lambda: serve_loop(sf, RHS, 3))        # compile
        t_s1 = min(timed(lambda: serve_loop(sf, RHS, 1)) for _ in range(R3))
        t_s3 = min(timed(lambda: serve_loop(sf, RHS, 3)) for _ in range(R3))
        serve_s = max(t_s3 - t_s1, 1e-9) / 2.0 / r_serve
        if serve_s < 1e-6:          # tunnel anomaly guard
            serve_s = t_s1 / r_serve
        OUT[f"serve_ms_per_rhs_r{r_serve}"] = round(serve_s * 1e3, 4)

    # ---- native-assembly factor ---------------------------------------------
    def stage_factor_native():
        # the same problem class assembled DIRECTLY in global blocktri
        # layout: the factor skips the access-pattern-bound band->blocktri
        # conversion (~40 ms of tpu_factor_ms) entirely (VERDICT r2 item 5)
        from spike_petsc_tpu.models.problems import blocktri_diagdom_device
        from spike_petsc_tpu.ops.blocktri import BlockTridiagonal
        from spike_petsc_tpu.ops.spike import spike_factor_blocks

        Tn, _ = blocktri_diagdom_device(n, k, k, K, 128, seed=0)
        sync(Tn)

        @partial(jax.jit, static_argnames=("Kp",))
        def factor_native_fn(TD, TL, TU, Kp):
            return spike_factor_blocks(
                BlockTridiagonal(D=TD, L=TL, U=TU), n=n, K=Kp, kl=k, ku=k,
                method=method, store_spikes=spikes, store_dtype=store_dtype,
                spike_dtype=spike_dtype, inverter=inverter)

        timed(lambda: factor_native_fn(Tn.D, Tn.L, Tn.U, K))     # compile
        factor_native_s = min(
            timed(lambda: factor_native_fn(Tn.D, Tn.L, Tn.U, K))
            for _ in range(R3))
        OUT["tpu_factor_native_ms"] = round(factor_native_s * 1e3, 3)

    # ---- batched-Krylov serving (bicgstab_many) -----------------------------
    def stage_krylov_serve():
        # the Krylov-grade serving mode: ONE iteration loop drives all r
        # columns (multi-RHS matvec + spike_solve_many PCApply -> factor
        # blocks stream once per iteration for the whole batch)
        from spike_petsc_tpu.solvers.krylov_many import bicgstab_many
        from spike_petsc_tpu.solvers.operator import as_matvec_many
        r_ks = min(r_serve, 32)
        RHSK = jax.random.normal(jax.random.PRNGKey(3), (n, r_ks), dtype)
        # The COMPUTE-path operator is rebuilt INSIDE the jit from the
        # explicit band argument: as_matvec_many's converted blocktri copy
        # (1.5 GB at this config) captured by a closure gets serialized
        # into every remote-compile POST through the axon tunnel (this
        # stage hung >20 min that way in the r4 postmortem); traced, the
        # conversion is part of the program and the operand stays
        # device-resident.  The conversion cost lands once per LOOP call
        # (outside the fori body) and cancels in the reps difference.
        # The dispatch route is captured host-side during tracing.
        route_cell = {}

        # the iteration count rides the loop carry so the stage compiles
        # exactly TWO programs (reps=1/3) — a third jit for .its alone cost
        # ~100 s of tunnel compile on the r3-era bench
        @jax.jit   # loop count DYNAMIC: one compile per form
        def kserve_loop(d, sf_in, B, reps):
            mv_many, _, _ = as_matvec_many(
                BandedMatrix(data=d, kl=k, ku=k))
            route_cell["route"] = getattr(mv_many, "_route", "?")

            def body(i, carry):
                Bc, its_max = carry
                res = bicgstab_many(
                    mv_many, Bc, None,
                    lambda X: spike_solve_many(sf_in, X, impl=impl),
                    rtol=1e-8, maxit=20)
                return Bc + 0.0 * res.x, jnp.maximum(its_max,
                                                     jnp.max(res.its))
            return jax.lax.fori_loop(0, reps, body,
                                     (B, jnp.zeros((), jnp.int32)))

        timed(lambda: kserve_loop(data, sf, RHSK, 1))        # compile
        timed(lambda: kserve_loop(data, sf, RHSK, 3))        # compile
        k_s1 = min(timed(lambda: kserve_loop(data, sf, RHSK, 1))
                   for _ in range(R3))
        k_s3 = min(timed(lambda: kserve_loop(data, sf, RHSK, 3))
                   for _ in range(R3))
        ks_s = max(k_s3 - k_s1, 1e-9) / 2.0 / r_ks
        if ks_s < 1e-6:
            ks_s = k_s1 / r_ks
        _, its = kserve_loop(data, sf, RHSK, 1)
        OUT[f"krylov_serve_ms_per_rhs_r{r_ks}"] = round(ks_s * 1e3, 4)
        OUT["krylov_serve_max_its"] = int(np.asarray(its))
        OUT["krylov_serve_mv_route"] = route_cell.get("route", "?")

        # the rtol=1e-4 serving point: the bf16-spike PC leaves relres
        # ~8e-5 after one apply, so BiCGStab's half-step s-norm exit fires
        # and the iteration costs 1 PCApply + 1 matvec instead of 2 + 2 —
        # the Krylov-grade serving sweet spot (lab_krylov_serve.py:
        # 0.75 vs 1.34 ms/RHS; at rtol=1e-8 the 2-PCApply full step is
        # structural, which is the documented 3.3x-preonly floor)
        @jax.jit   # loop count DYNAMIC: one compile per form
        def kserve_loop4(d, sf_in, B, reps):
            mv_many, _, _ = as_matvec_many(
                BandedMatrix(data=d, kl=k, ku=k))

            def body(i, carry):
                Bc, its_max = carry
                res = bicgstab_many(
                    mv_many, Bc, None,
                    lambda X: spike_solve_many(sf_in, X, impl=impl),
                    rtol=1e-4, maxit=20)
                return Bc + 0.0 * res.x, jnp.maximum(its_max,
                                                     jnp.max(res.its))
            return jax.lax.fori_loop(0, reps, body,
                                     (B, jnp.zeros((), jnp.int32)))

        timed(lambda: kserve_loop4(data, sf, RHSK, 1))       # compile
        timed(lambda: kserve_loop4(data, sf, RHSK, 3))       # compile
        k4_s1 = min(timed(lambda: kserve_loop4(data, sf, RHSK, 1))
                    for _ in range(R3))
        k4_s3 = min(timed(lambda: kserve_loop4(data, sf, RHSK, 3))
                    for _ in range(R3))
        ks4_s = max(k4_s3 - k4_s1, 1e-9) / 2.0 / r_ks
        if ks4_s < 1e-6:
            ks4_s = k4_s1 / r_ks
        OUT[f"krylov_serve_ms_per_rhs_r{r_ks}_rtol1e4"] = \
            round(ks4_s * 1e3, 4)

    # ---- transpose/adjoint solves on stored factors -------------------------
    def stage_transpose():
        # spike_transpose reuses the forward factorization for A^T (the
        # adjoint step of every differentiable solve, and PCApplyTranspose
        # for bicg).  Three forms: the REGULAR-form factor rebuilt from the
        # band (fused Pallas sweeps; setup pays one band conversion), the
        # storage-sharing marker form (XLA-scan sweeps, zero setup), and
        # the store_lt form (L blocks kept at factor time: regular-form
        # setup with NO conversion).
        import dataclasses as _dc

        from spike_petsc_tpu.ops.band import banded_transpose
        from spike_petsc_tpu.ops.band import pad_banded as _pb
        from spike_petsc_tpu.ops.blocktri import BlockTriFactor
        from spike_petsc_tpu.ops.spike import (_band_to_blocks_chunked,
                                               spike_transpose)

        def _tsolve_ms(sft_in):
            # DYNAMIC loop count: one compile serves every loop length
            # (the axon plugin cannot cache executables, so each static-r
            # variant used to recompile ~25 s on every run of this
            # compile-heaviest stage)
            @jax.jit
            def tsolve_loop(s, bb2, r):
                return jax.lax.fori_loop(
                    0, r, lambda i, y: spike_solve(s, y), bb2)

            timed(lambda: tsolve_loop(sft_in, rhs, 2))     # compile
            t1 = min(timed(lambda: tsolve_loop(sft_in, rhs, 2))
                     for _ in range(R3))
            t2 = min(timed(lambda: tsolve_loop(sft_in, rhs, 12))
                     for _ in range(R3))
            s = max(t2 - t1, 1e-9) / 10.0
            if s < 1e-5:
                s = t1 / 2.0
            return s, tsolve_loop(sft_in, rhs, 1)

        bandT = banded_transpose(band)
        # fast regular form (fused-kernel sweeps)
        tr_fast = jax.jit(lambda s, d: spike_transpose(
            s, band=BandedMatrix(data=d, kl=k, ku=k)))
        timed(lambda: tr_fast(sf, data))               # compile
        fast_setup_s = min(timed(lambda: tr_fast(sf, data))
                           for _ in range(R3))
        sft = tr_fast(sf, data)
        sync(sft.Btip)      # Btip exists for BOTH forms (fast regular
        # factor for method=inv, marker wrapper for lu/cr)
        fast_s, xt = _tsolve_ms(sft)
        res_t = banded_matvec(bandT, xt) - rhs
        OUT["transpose_setup_ms"] = round(fast_setup_s * 1e3, 3)
        OUT["transpose_solve_ms"] = round(fast_s * 1e3, 3)
        OUT["transpose_form"] = ("fast" if isinstance(sft.fact,
                                                      BlockTriFactor)
                                 else "marker")
        OUT["transpose_relres"] = float(np.asarray(
            jnp.linalg.norm(res_t) / jnp.linalg.norm(rhs)))
        del sft
        # marker form (zero-setup, scan sweeps) — the gap the fused path buys
        tr_mk = jax.jit(spike_transpose)
        timed(lambda: tr_mk(sf))                       # compile
        mk_setup_s = min(timed(lambda: tr_mk(sf)) for _ in range(R3))
        sft_mk = tr_mk(sf)
        sync(sft_mk.Btip)
        mk_s, _ = _tsolve_ms(sft_mk)
        OUT["transpose_marker_setup_ms"] = round(mk_setup_s * 1e3, 3)
        OUT["transpose_marker_solve_ms"] = round(mk_s * 1e3, 3)
        del sft_mk
        # store_lt form: the L blocks were kept at factor time
        # (spike_factor(store_lt=True)), so the regular-form transpose
        # setup drops the band->blocktri conversion entirely — measured
        # by attaching precomputed L blocks and timing spike_transpose
        Lb = jax.jit(lambda d: _band_to_blocks_chunked(
            _pb(BandedMatrix(data=d, kl=k, ku=k), sf.K * sf.m),
            sf.K, sf.m, sf.b, k, k).L)(data)
        sync(Lb)
        sf_lt = _dc.replace(sf, Lb=Lb)
        tr_lt = jax.jit(spike_transpose)
        timed(lambda: tr_lt(sf_lt))                    # compile
        lt_setup_s = min(timed(lambda: tr_lt(sf_lt)) for _ in range(R3))
        sft_lt = tr_lt(sf_lt)
        assert isinstance(sft_lt.fact, BlockTriFactor)
        OUT["transpose_lt_setup_ms"] = round(lt_setup_s * 1e3, 3)
        del sft_lt, sf_lt, Lb

    # ---- ordering/scaling pipeline at scale (VERDICT r4 next #4) ------------
    def stage_ordering():
        # The reference's raison d'être — the reorder -> scale -> extract
        # pre-pass (/root/reference/src/testbed.c:200-284 prints its
        # diagnostics per run) — measured at BASELINE config-3 scale with
        # the end-to-end banded solve.  Host combinatorics (native C++ SAP
        # engine, vectorized AWBM, RCM, extraction) never touch the
        # tunnel; factor + BiCGStab ride the chip.
        from spike_petsc_tpu import sparse as hsparse
        from spike_petsc_tpu.models import problems
        from spike_petsc_tpu.ordering.mc64 import mc64
        from spike_petsc_tpu.ordering.awbm import awbm as _awbm
        from spike_petsc_tpu.ordering.rcm import rcm as _rcm
        from spike_petsc_tpu.solvers.krylov import bicgstab

        n_ord = int(os.environ.get("SPIKE_BENCH_ORD_N", 1_000_000))
        a = problems.illscaled_nonsym(n_ord, 6, 6, seed=0)
        OUT["ordering_n"] = n_ord
        OUT["ordering_nnz"] = int(a.nnz)

        t0 = time.perf_counter()
        r5 = mc64(a, job=5)
        t_mc64 = time.perf_counter() - t0
        OUT["ordering_mc64_job5_ms"] = round(t_mc64 * 1e3, 1)

        t0 = time.perf_counter()
        _awbm(a)
        OUT["ordering_awbm_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

        dp0 = hsparse.diagonal_weight_product(a)
        t0 = time.perf_counter()
        pa = r5.apply(a, scale=True)
        t_apply = time.perf_counter() - t0
        OUT["ordering_apply_ms"] = round(t_apply * 1e3, 1)
        # sum_i |diag| improvement, the CheckDiagonalWeight metric
        # (/root/reference/src/wbm.c:530-551): job-5 scaling drives every
        # |diag| to 1, so the scaled product reaches exactly n
        OUT["ordering_diag_sum_before"] = round(dp0, 1)
        OUT["ordering_diag_sum_after"] = round(
            hsparse.diagonal_weight_product(pa), 1)

        t0 = time.perf_counter()
        rr = _rcm(pa)
        pb = rr.apply(pa)
        t_rcm = time.perf_counter() - t0
        OUT["ordering_rcm_ms"] = round(t_rcm * 1e3, 1)

        t0 = time.perf_counter()
        ext = hsparse.extract_banded(pb, kmax=50, frac=0.9999)
        t_ext = time.perf_counter() - t0
        OUT["ordering_extract_ms"] = round(t_ext * 1e3, 1)
        OUT["ordering_band_k"] = int(ext.k)

        t0 = time.perf_counter()
        data_np, okl, oku = hsparse.csr_to_banded_arrays(
            ext.matrix, ext.k, ext.k)
        t_pack = time.perf_counter() - t0
        odata = jnp.asarray(data_np, jnp.float32)
        sync(odata)
        Ko = min(64, max(1, n_ord // (4 * 128)))

        def _ofact_fn(d):
            return spike_factor(BandedMatrix(data=d, kl=okl, ku=oku),
                                K=Ko, block_b=128)

        ofact_jit = jax.jit(_ofact_fn)
        timed(lambda: ofact_jit(odata))          # compile
        t_fac = min(timed(lambda: ofact_jit(odata)) for _ in range(R3))
        osf = ofact_jit(odata)
        orhs = jax.jit(lambda d: banded_matvec(
            BandedMatrix(data=d, kl=okl, ku=oku),
            jnp.ones((d.shape[0],), d.dtype)))(odata)

        @jax.jit
        def osolve(d, sf_in, b_in):
            bnd = BandedMatrix(data=d, kl=okl, ku=oku)
            res = bicgstab(lambda v: banded_matvec(bnd, v), b_in, None,
                           lambda v: spike_solve(sf_in, v),
                           rtol=1e-8, maxit=50)
            return res.x, res.its, res.rnorm

        timed(lambda: osolve(odata, osf, orhs))  # compile
        t_slv = min(timed(lambda: osolve(odata, osf, orhs))
                    for _ in range(R3))
        x, its, rnorm = osolve(odata, osf, orhs)
        OUT["ordering_factor_ms"] = round(t_fac * 1e3, 2)
        OUT["ordering_bcgs_solve_ms"] = round(t_slv * 1e3, 2)
        OUT["ordering_bcgs_its"] = int(np.asarray(its))
        OUT["ordering_bcgs_relres"] = float(
            np.asarray(rnorm / jnp.linalg.norm(orhs)))
        # end-to-end reorder->scale->extract->factor->solve wall (host
        # pre-pass + warm device work; compiles excluded as one-time)
        OUT["ordering_e2e_ms"] = round(
            (t_mc64 + t_apply + t_rcm + t_ext + t_pack + t_fac + t_slv)
            * 1e3, 1)

        if os.environ.get("SPIKE_BENCH_ORD_FIEDLER", "1") == "1":
            from spike_petsc_tpu.ordering.fiedler import fiedler as _fied
            nx = int(np.sqrt(n_ord))
            lap = problems.laplacian_2d(nx, nx)
            t0 = time.perf_counter()
            _fied(lap)
            OUT["ordering_fiedler_ms"] = round(
                (time.perf_counter() - t0) * 1e3, 1)
            OUT["ordering_fiedler_n"] = nx * nx

    # ---- TPU high-accuracy: f32 factors + emulated-f64 refinement -----------
    def stage_f64_refine():
        # SURVEY §7 hard-part 3, second branch: the operator lives in
        # emulated f64 (compensated double-f32 Pallas kernel; XLA x64
        # fallback) while the factorization and its Pallas sweeps stay
        # native f32/bf16 — richardson refinement reaches <= 1e-12 relative
        # residual ON the chip (VERDICT r2 item 4).
        from spike_petsc_tpu.solvers.krylov import richardson

        jax.config.update("jax_enable_x64", True)
        try:
            data64 = data.astype(jnp.float64)
            rhs64 = banded_matvec(BandedMatrix(data=data64, kl=k, ku=k),
                                  jnp.ones((n,), jnp.float64))
            _ = np.asarray(rhs64[:8])
            # residual-matvec engine: the compensated double-f32 Pallas
            # kernel streams the split hi/lo pairs at kernel bandwidth where
            # XLA's x64 emulation of the shifted-axpy form pays the
            # misaligned-operand penalty (37.5 ms at this config).  The
            # reported relres checks the kernel's error-free transforms
            # end-to-end: a broken compensation cannot reach <= 1e-12.
            # the residual operand (split hi/lo pairs = 1.6 GB, or the f64
            # band) rides the jit as an EXPLICIT argument — closure capture
            # would serialize it into every remote-compile POST through the
            # axon tunnel (r4 postmortem)
            f64_mv = os.environ.get("SPIKE_BENCH_F64_MV", "pallas")
            from spike_petsc_tpu.ops.pallas.band_matvec import (
                banded_matvec_prepared_f64, banded_mv_feasible,
                prepare_banded_mv_f64)

            def _mk_mv64_xla(op):
                bnd = BandedMatrix(data=op, kl=k, ku=k)
                return lambda v: banded_matvec(bnd, v)

            if f64_mv == "pallas" and banded_mv_feasible(w, n=n):
                operand64 = prepare_banded_mv_f64(
                    BandedMatrix(data=data64, kl=k, ku=k))
                sync(operand64.d3hi)

                def mk_mv64(op):
                    return lambda v: banded_matvec_prepared_f64(op, v)
            else:
                f64_mv = "xla"
                operand64 = data64
                mk_mv64 = _mk_mv64_xla

            @jax.jit
            def refine_run(op, sf_in, b64):
                def pcapply(r):
                    r_lo = r.astype(jnp.float32)
                    with jax.enable_x64(False):  # Pallas can't lower under x64
                        y = spike_solve(sf_in, r_lo)
                    return y.astype(b64.dtype)
                res = richardson(mk_mv64(op), b64, None,
                                 pcapply, rtol=1e-12, maxit=20)
                return res.its, res.rnorm / jnp.linalg.norm(b64)

            try:
                r_its, r_rel = refine_run(operand64, sf, rhs64)  # compile+run
                r_rel_v = float(np.asarray(r_rel))
            except Exception:  # noqa: BLE001 — kernel engine must not
                r_rel_v = float("inf")  # kill the stage; fall back below
            if f64_mv == "pallas" and not r_rel_v <= 1e-11:
                # accuracy guard: refinement through the compensated kernel
                # must reach f64-grade residuals; if the platform's
                # compilation broke the error-free transforms (it does on
                # XLA:CPU interpret — see band_matvec.py) or the kernel
                # fails outright, fall back to the XLA x64 operator so the
                # headline accuracy never silently regresses
                f64_mv = "xla_fallback"
                operand64 = data64
                mk_mv64 = _mk_mv64_xla
                refine_run = jax.jit(refine_run.__wrapped__)
                r_its, r_rel = refine_run(operand64, sf, rhs64)
                r_rel_v = float(np.asarray(r_rel))

            # wall time via the same differenced chained-loop methodology as
            # the solve/gmres stages: a one-shot jit call ends in a tiny
            # scalar readback, which through the axon tunnel costs SECONDS
            # (measured 10.6 s reported for ~0.3 s of device work) — the
            # fixed readback cancels in the r=1 vs r=3 difference.
            @jax.jit   # loop count DYNAMIC: one compile per form
            def refine_loop(op, sf_in, b64, r):
                mv64 = mk_mv64(op)

                def pcapply(rr):
                    r_lo = rr.astype(jnp.float32)
                    with jax.enable_x64(False):
                        y = spike_solve(sf_in, r_lo)
                    return y.astype(b64.dtype)

                def body(i, bcur):
                    res = richardson(mv64, bcur, None,
                                     pcapply, rtol=1e-12, maxit=20)
                    return bcur + 0.0 * res.x
                return jax.lax.fori_loop(0, r, body, b64)

            timed(lambda: refine_loop(operand64, sf, rhs64, 1))     # compile
            timed(lambda: refine_loop(operand64, sf, rhs64, 3))     # compile
            t_r1 = min(timed(lambda: refine_loop(operand64, sf, rhs64, 1))
                       for _ in range(R3))
            t_r3 = min(timed(lambda: refine_loop(operand64, sf, rhs64, 3))
                       for _ in range(R3))
            refine_wall = max((t_r3 - t_r1) / 2.0, 1e-9)
            if refine_wall < 1e-3:      # tunnel anomaly guard
                refine_wall = t_r1
            OUT["f64_refine_relres"] = r_rel_v
            OUT["f64_refine_its"] = int(np.asarray(r_its))
            OUT["f64_refine_wall_ms"] = round(refine_wall * 1e3, 1)
            OUT["f64_refine_mv"] = f64_mv
        finally:
            jax.config.update("jax_enable_x64", False)

    # ---- banded-Pallas operator microbench + route tuning -------------------
    # Mosaic compiles here cost minutes COLD through the tunnel, but the
    # tuning record the pair writes is the round's measured-routing
    # evidence, so it runs EARLY (post-r4 policy); the persistent XLA cache
    # makes warm runs cheap, and the measured stage history keeps a cold
    # session from starving what follows.
    def stage_band_mv():
        from spike_petsc_tpu.ops.pallas.band_matvec import (
            banded_matvec_prepared, banded_mv_feasible, prepare_banded_mv)
        if not banded_mv_feasible(w, n=n):
            OUT["band_mv_pallas_error"] = "infeasible at this config"
            return
        prep_mv = prepare_banded_mv(band)
        sync(prep_mv.d3)

        @jax.jit   # loop count DYNAMIC: one compile per form
        def bmv_loop(pm, x, r):
            return jax.lax.fori_loop(
                0, r, lambda i, y: banded_matvec_prepared(
                    pm, y / jnp.max(jnp.abs(y))), x)

        t0 = time.perf_counter()
        timed(lambda: bmv_loop(prep_mv, rhs, 2))     # compile
        OUT["band_mv_compile_s"] = round(time.perf_counter() - t0, 1)
        timed(lambda: bmv_loop(prep_mv, rhs, 22))    # compile
        t_m1 = min(timed(lambda: bmv_loop(prep_mv, rhs, 2))
                   for _ in range(R3))
        t_m2 = min(timed(lambda: bmv_loop(prep_mv, rhs, 22))
                   for _ in range(R3))
        bmv_s = max(t_m2 - t_m1, 1e-9) / 20.0
        if bmv_s < 1e-5:
            bmv_s = t_m1 / 2.0
        OUT["band_mv_pallas_ms"] = round(bmv_s * 1e3, 3)
        OUT["band_mv_pallas_gbps"] = round(n * w * 4 / bmv_s / 1e9, 1)

    def stage_tune():
        # time each feasible SpMV route through the library's own dispatch
        # and record the winner so as_matvec('auto') follows the MEASURED
        # data on this platform/bandwidth (utils/tuning.py).  The split
        # form passes the prepared operator as an explicit jit argument —
        # closure capture serializes it into the tunnel's remote-compile
        # POSTs (r4 postmortem)
        from spike_petsc_tpu.solvers.operator import as_matvec_split
        from spike_petsc_tpu.utils import tuning

        def _route_ms(impl_name):
            # per-route isolation: one route failing to COMPILE (e.g. the
            # axon remote-compile service 500ing on a Mosaic kernel) must
            # not lose the other routes' measurements
            try:
                mv, operand, _, _ = as_matvec_split(band, impl=impl_name)
                if getattr(mv, "_route", None) != impl_name:
                    return None     # dispatch fell back: infeasible here
                ms = tuning.measure_matvec_ms(mv, rhs, reps=20, timed=timed,
                                              operand=operand)
                del operand
                return ms
            except Exception as exc:  # noqa: BLE001
                OUT[f"mv_route_{impl_name}_error"] = \
                    f"{type(exc).__name__}: {exc}"[:120]
                return None

        routes = {}
        for nmr in ("xla", "blocktri", "banded_pallas"):
            if nmr == "banded_pallas" and "band_mv_pallas_ms" in OUT:
                # the band-mv microbench above already measured this route
                # with the same methodology — don't redo the prepare +
                # compile + 6 timings on the chip
                routes[nmr] = OUT["band_mv_pallas_ms"]
                continue
            ms = _route_ms(nmr)
            if ms is not None:
                routes[nmr] = round(ms, 3)
        if routes:
            winner = min(routes, key=routes.get)
            path = tuning.update(
                tuning.platform_key(), "banded_matvec",
                tuning.matvec_key(w, dtype), {
                    **{f"{kk}_ms": vv for kk, vv in routes.items()},
                    "winner": winner, "n": n,
                    "dtype": str(jnp.dtype(dtype).name)})
            OUT.update({f"mv_route_{kk}_ms": vv for kk, vv in routes.items()})
            OUT["mv_route_winner"] = winner
            OUT["tuning_file"] = path

    # ---- ordered dispatch (see the EXTRA STAGES comment for the policy) -----
    run_stage("gmres", 60, stage_gmres)
    if os.environ.get("SPIKE_BENCH_BAND_MV", "1") == "1":
        run_stage("band_mv", 200, stage_band_mv)
    if os.environ.get("SPIKE_BENCH_TUNE", "1") == "1":
        run_stage("tune", 120, stage_tune)
    if os.environ.get("SPIKE_BENCH_ORDERING", "1") == "1":
        run_stage("ordering", 150, stage_ordering)
    if os.environ.get("SPIKE_BENCH_F64", "1") == "1":
        run_stage("f64_refine", 150, stage_f64_refine)
    if os.environ.get("SPIKE_BENCH_TRANSPOSE", "1") == "1":
        run_stage("transpose", 90, stage_transpose)
    run_stage("serve", 40, stage_serve)
    run_stage("factor_native", 45, stage_factor_native)
    # krylov_serve est post-fix: the old 300 s was the closure-POST
    # pathology (operator now rides as an explicit argument); measured
    # history replaces the static estimate
    run_stage("krylov_serve", 120, stage_krylov_serve)

    if skipped:
        OUT["skipped_stages"] = skipped
    emit()


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        # Whatever got collected before the failure is still a result —
        # print it (with value possibly null) before re-raising, so the
        # driver's tail always contains the JSON line.
        if OUT:
            OUT.setdefault("bench_error", True)
            emit()
        raise
