"""Measured-route tuning records (utils/tuning.py): bench writes winners,
as_matvec('auto') follows them, heuristics remain the fallback."""

import json

import numpy as np
import jax.numpy as jnp

from spike_petsc_tpu import BandedMatrix
from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.solvers.operator import as_matvec
from spike_petsc_tpu.utils import tuning


def banded_of(acsr):
    data, kl, ku = hsp.csr_to_banded_arrays(acsr)
    return BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)


def test_route_hint_nearest_bandwidth(tmp_path, monkeypatch):
    import numpy as np

    monkeypatch.setenv("SPIKE_TUNING_FILE", str(tmp_path / "t.json"))
    tuning.update("tpu", "banded_matvec", tuning.matvec_key(201, np.float32),
                  {"winner": "blocktri", "xla_ms": 39.0, "blocktri_ms": 6.8,
                   "n": 1_000_000})
    tuning.update("tpu", "banded_matvec", tuning.matvec_key(13, np.float32),
                  {"winner": "banded_pallas", "banded_pallas_ms": 0.9,
                   "n": 1_000_000})
    f32 = np.float32
    hint = tuning.matvec_route_hint
    assert hint("tpu", 201, f32, 1_000_000) == "blocktri"
    assert hint("tpu", 150, f32, 1_000_000) == "blocktri"       # within 2x
    assert hint("tpu", 17, f32, 1_000_000) == "banded_pallas"
    assert hint("tpu", 50, f32, 1_000_000) is None      # >2x from both
    assert hint("cpu", 201, f32, 1_000_000) is None     # other platform
    # dtype and problem-size gates: a winner measured at f32/n=1e6 must not
    # route f64 operators or tiny systems
    assert hint("tpu", 201, np.float64, 1_000_000) is None
    assert hint("tpu", 201, f32, 300) is None


def test_generation_keyed_records_loud_fallback(tmp_path, monkeypatch):
    """Tuning records are keyed by TPU generation (platform_key); another
    generation's measurements never apply silently — one RuntimeWarning
    announces the static-heuristics fallback (VERDICT r4 item 7)."""
    import warnings

    import pytest

    monkeypatch.setenv("SPIKE_TUNING_FILE", str(tmp_path / "t.json"))
    f32 = np.float32
    tuning.update("tpu:v5lite", "banded_matvec",
                  tuning.matvec_key(201, f32),
                  {"winner": "banded_pallas", "n": 1_000_000})
    assert tuning.matvec_route_hint(
        "tpu:v5lite", 201, f32, 1_000_000) == "banded_pallas"
    # a v5p host sees the v5lite record but must not inherit it
    tuning._warned_platforms.discard("tpu:v5p")
    with pytest.warns(RuntimeWarning, match="tpu:v5p"):
        assert tuning.matvec_route_hint(
            "tpu:v5p", 201, f32, 1_000_000) is None
    # warn once per platform, not per lookup
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert tuning.matvec_route_hint(
            "tpu:v5p", 201, f32, 1_000_000) is None
    # legacy unqualified "tpu" records likewise trigger the loud fallback
    tuning.update("tpu", "banded_matvec", tuning.matvec_key(13, f32),
                  {"winner": "xla", "n": 4096})
    tuning._warned_platforms.discard("tpu:v6e")
    with pytest.warns(RuntimeWarning):
        assert tuning.matvec_route_hint("tpu:v6e", 13, f32, 4096) is None
    # non-TPU platforms stay silent (their absence is not a hardware gap)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert tuning.matvec_route_hint("cpu", 201, f32, 1_000_000) is None


def test_platform_key_cpu_backend():
    assert tuning.platform_key() == "cpu"   # tests pin JAX_PLATFORMS=cpu


def test_dist_matvec_impl_auto_resolution(tmp_path, monkeypatch):
    """dist_spike_factor's matvec_impl='auto' resolves via the same tuning
    record / static-TPU-default logic as single-chip as_matvec (VERDICT r4
    item 5): measured banded_pallas winner -> kernel route, measured
    blocktri/xla winner -> blocks, no measurement -> static TPU default."""
    import jax

    from spike_petsc_tpu.parallel import spike_dist

    f32 = np.float32
    # non-TPU backend: blocks
    assert spike_dist._resolve_matvec_impl(
        "auto", 201, 16_384, 131_072, f32) == "blocks"
    # explicit impls pass through untouched
    assert spike_dist._resolve_matvec_impl(
        "blocks", 201, 16_384, 131_072, f32) == "blocks"
    assert spike_dist._resolve_matvec_impl(
        "banded_pallas", 201, 16_384, 131_072, f32) == "banded_pallas"

    monkeypatch.setenv("SPIKE_TUNING_FILE", str(tmp_path / "t.json"))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(tuning, "platform_key", lambda: "tpu:test")
    # no measurement: static TPU default = banded_pallas when feasible
    assert spike_dist._resolve_matvec_impl(
        "auto", 201, 16_384, 131_072, f32) == "banded_pallas"
    # infeasible locally (f64): blocks
    assert spike_dist._resolve_matvec_impl(
        "auto", 201, 16_384, 131_072, np.float64) == "blocks"
    # measured blocktri winner maps to the dist blocks route
    tuning.update("tpu:test", "banded_matvec", tuning.matvec_key(201, f32),
                  {"winner": "blocktri", "n": 131_072})
    assert spike_dist._resolve_matvec_impl(
        "auto", 201, 16_384, 131_072, f32) == "blocks"
    # measured banded_pallas winner keeps the kernel route
    tuning.update("tpu:test", "banded_matvec", tuning.matvec_key(201, f32),
                  {"winner": "banded_pallas", "n": 131_072})
    assert spike_dist._resolve_matvec_impl(
        "auto", 201, 16_384, 131_072, f32) == "banded_pallas"


def test_auto_follows_recorded_winner(tmp_path, monkeypatch):
    """A recorded winner overrides the static heuristic: a narrow band that
    'auto' would run as XLA shifted-axpy routes through the banded-Pallas
    kernel when the record says it wins here."""
    monkeypatch.setenv("SPIKE_TUNING_FILE", str(tmp_path / "t.json"))
    a = problems.nonsym_banded(4096, 3, 3, seed=1)
    A = banded_of(a)
    A = BandedMatrix(data=A.data.astype(jnp.float32), kl=A.kl, ku=A.ku)
    mv, n, _ = as_matvec(A, impl="auto")
    assert getattr(mv, "_route", None) == "xla"      # heuristic: narrow band
    import jax
    tuning.update(jax.default_backend(), "banded_matvec",
                  tuning.matvec_key(7, jnp.float32),
                  {"winner": "banded_pallas", "banded_pallas_ms": 0.1,
                   "n": 4096})
    mv2, _, _ = as_matvec(A, impl="auto")
    assert getattr(mv2, "_route", None) == "banded_pallas"
    # both routes compute the same product
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(mv2(x)),
                               rtol=1e-10, atol=1e-12)


def test_auto_ignores_infeasible_recorded_winner(tmp_path, monkeypatch):
    """A record naming a route that is infeasible for this operator falls
    back to the heuristics instead of crashing or mis-routing."""
    import jax
    monkeypatch.setenv("SPIKE_TUNING_FILE", str(tmp_path / "t.json"))
    a = problems.nonsym_banded(100, 2, 2, seed=2)     # tiny: pallas infeasible
    A = banded_of(a)
    tuning.update(jax.default_backend(), "banded_matvec",
                  tuning.matvec_key(5, jnp.float64),
                  {"winner": "banded_pallas", "n": 100})
    mv, _, _ = as_matvec(A, impl="auto")
    assert getattr(mv, "_route", None) == "xla"


def test_update_merges_and_is_atomic(tmp_path, monkeypatch):
    monkeypatch.setenv("SPIKE_TUNING_FILE", str(tmp_path / "t.json"))
    tuning.update("tpu", "banded_matvec", "201:float32",
                  {"winner": "blocktri"})
    tuning.update("tpu", "banded_matvec", "13:float32", {"winner": "xla"})
    tuning.update("cpu", "banded_matvec", "201:float32", {"winner": "xla"})
    with open(tmp_path / "t.json") as f:
        data = json.load(f)
    assert set(data) == {"tpu", "cpu"}
    assert set(data["tpu"]["banded_matvec"]) == {"201:float32",
                                                 "13:float32"}


def test_as_matvec_split_parity_and_operand_timing():
    """as_matvec_split returns the closure-free (apply, operand) pair with
    exact parity to as_matvec on every feasible route, and
    measure_matvec_ms accepts the explicit-operand form (the tunnel-safe
    path: no GB-scale jit closure constants in remote-compile POSTs)."""
    import jax

    from spike_petsc_tpu.solvers.operator import as_matvec_split

    n, kk = 2048, 3
    a = problems.nonsym_banded(n, kk, kk, seed=4)
    A = banded_of(a)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    for impl in ("auto", "xla", "banded_pallas", "blocktri"):
        mv, _, _ = as_matvec(A, impl=impl)
        apply, operand, n_out, dt = as_matvec_split(A, impl=impl)
        assert n_out == n
        assert apply._route == mv._route
        np.testing.assert_allclose(np.asarray(apply(operand, x)),
                                   np.asarray(mv(x)),
                                   rtol=1e-12, atol=1e-12)
        # operand is a pytree passable as an explicit jit argument
        y = jax.jit(apply)(operand, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(mv(x)),
                                   rtol=1e-12, atol=1e-12)
    apply, operand, _, _ = as_matvec_split(A, impl="xla")
    ms = tuning.measure_matvec_ms(apply, x.astype(jnp.float64), reps=4,
                                  operand=operand)
    assert ms > 0
