"""Measured-route tuning records: let 'auto' dispatch follow hardware data.

The operator SpMV has three implementations (XLA shifted-axpy, blocktri
conversion + manual-DMA Pallas, diagonal-major banded Pallas) whose crossover
points are HARDWARE properties — v5e's measured numbers do not transfer to
v5p/v6e or to the CPU backend.  Static heuristics in ``as_matvec`` encode one
generation's measurements; this module closes the loop instead:

  * ``bench.py`` times every feasible route at its config and records the
    winner per (platform, bandwidth) in a small JSON file;
  * ``as_matvec("auto")`` consults the record first (nearest bandwidth
    within 2x on the same platform) and falls back to the built-in
    heuristics when no measurement exists.

This mirrors how PETSc users pin ``-mat_type``/implementation choices from
measured logs — but automated, since the bench driver runs on the real chip
every round.  The file is tiny, merged atomically, and its location is
overridable with ``SPIKE_TUNING_FILE`` (tests point it at a tmpdir; multiple
benches on different hosts keep separate caches by default).
"""

from __future__ import annotations

import copy
import json
import os
import tempfile
from typing import Optional

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache",
                        "spike_petsc_tpu", "tuning.json")
# measurements recorded on real hardware by a bench run and committed with
# the package: the fallback when this host has no local record yet (a fresh
# deployment still gets measured routing instead of static heuristics)
_PACKAGED = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "tuning.json")
_cache = {"path": None, "mtime": None, "data": None}
_packaged_cache: list = []          # [dict] once loaded


def record_path() -> str:
    return os.environ.get("SPIKE_TUNING_FILE", _DEFAULT)


def _read_json(path: str) -> dict:
    try:
        with open(path) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def _load_user() -> dict:
    """The local (host-specific) record only — what update() merges into."""
    path = record_path()
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        return {}
    if _cache["path"] == path and _cache["mtime"] == mtime:
        return _cache["data"]
    data = _read_json(path)
    _cache.update(path=path, mtime=mtime, data=data)
    return data


def load() -> dict:
    """The effective tuning record: packaged hardware measurements overlaid
    by any local (host-measured) entries, which win per key.

    An explicit ``SPIKE_TUNING_FILE`` is taken as the WHOLE record (no
    packaged underlay) — tests point it at a tmpdir and stay hermetic."""
    if os.environ.get("SPIKE_TUNING_FILE"):
        return _load_user()
    if not _packaged_cache:
        _packaged_cache.append(_read_json(_PACKAGED))
    packaged = _packaged_cache[0]
    user = _load_user()
    if not packaged:
        return user
    if not user:
        return packaged
    merged = copy.deepcopy(packaged)
    for plat, kinds in user.items():
        if not isinstance(kinds, dict):
            merged[plat] = kinds
            continue
        mp = merged.setdefault(plat, {})
        for kind, entries in kinds.items():
            if isinstance(entries, dict) and isinstance(mp.get(kind), dict):
                mp[kind].update(entries)
            else:
                mp[kind] = entries
    return merged


def platform_key() -> str:
    """Generation-qualified platform key for tuning records.

    Route crossovers are HARDWARE properties: v5e's measured numbers do not
    transfer to v5p/v6e (different HBM bandwidth, VMEM, MXU shape).  On TPU
    the key embeds the device kind — e.g. ``"TPU v5 lite"`` -> ``
    "tpu:v5lite"`` — so a record measured on one generation is never applied
    silently on another (VERDICT r4).  Other backends use the bare backend
    name (their records are only used for testing the mechanism).
    """
    import jax
    backend = jax.default_backend()
    if backend != "tpu":
        return backend
    kind = jax.devices()[0].device_kind.lower()
    if kind.startswith("tpu"):
        kind = kind[3:]
    return "tpu:" + kind.strip().replace(" ", "")


_warned_platforms: set = set()


def _warn_generation_fallback(platform: str, others: list) -> None:
    if platform in _warned_platforms:
        return
    _warned_platforms.add(platform)
    import warnings
    warnings.warn(
        f"no tuning measurements for platform {platform!r}; records exist "
        f"for {sorted(others)} but hardware crossovers do not transfer "
        f"between TPU generations — using static route heuristics. Run "
        f"`python -m spike_petsc_tpu.tools.tune` (or bench.py) on this "
        f"chip to record measured routes.", RuntimeWarning, stacklevel=3)


def matvec_key(w: int, dtype) -> str:
    """Record key for a banded matvec measurement: total width + dtype
    (route crossovers are dtype properties: itemsize gates feasibility and
    halves/doubles streamed bytes)."""
    import numpy as np
    return f"{int(w)}:{np.dtype(dtype).name}"


def update(platform: str, kind: str, key: str, entry: dict) -> str:
    """Merge one measurement into the record (atomic rename write).

    Layout: ``{platform: {kind: {key: entry}}}`` — e.g.
    ``{"tpu": {"banded_matvec": {"201:float32": {"winner": "blocktri",
    "n": 1000000, ...}}}}``.  Returns the path written.
    """
    path = record_path()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # deep-copy: _load_user() returns the shared cache object; mutating it
    # in place would leave phantom entries in memory if the write below
    # fails (code-review r3).  Only the LOCAL overlay is rewritten — the
    # packaged record stays a read-only fallback underneath.
    data = copy.deepcopy(_load_user()) if os.path.exists(path) else {}
    data.setdefault(platform, {}).setdefault(kind, {})[str(key)] = entry
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               prefix=".tuning-")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    _cache.update(path=None, mtime=None, data=None)   # force re-read
    return path


def matvec_route_hint(platform: str, w: int, dtype=None,
                      n: Optional[int] = None) -> Optional[str]:
    """The measured winner for a banded matvec of total width ``w`` on
    ``platform``, or None when no applicable measurement exists.

    A measurement applies when its dtype matches, its width is within 2x,
    and (when both are known) its problem size is within 8x — a winner
    measured at n=1e6 says nothing about an n=300 system where one-time
    conversion overhead dominates.

    Generation discipline: ``platform`` is the :func:`platform_key` form
    (``"tpu:v5lite"``).  Records for OTHER TPU generations (or the legacy
    unqualified ``"tpu"`` key) never match — when only such records exist,
    a one-time RuntimeWarning says the static heuristics apply untested on
    this chip (loud fallback, VERDICT r4).
    """
    import numpy as np
    data = load()
    rec = data.get(platform, {}).get("banded_matvec", {})
    if not rec and platform.startswith("tpu"):
        others = [p for p in data
                  if p != platform and (p == "tpu" or p.startswith("tpu:"))
                  and data.get(p, {}).get("banded_matvec")]
        if others:
            _warn_generation_fallback(platform, others)
        return None
    dt = np.dtype(dtype).name if dtype is not None else None
    best = None
    for wk, e in rec.items():
        try:
            wpart, _, dpart = wk.partition(":")
            wv = float(wpart)
        except ValueError:
            continue
        if dt is not None and dpart and dpart != dt:
            continue
        if n is not None and e.get("n"):
            nratio = max(float(e["n"]), n) / max(min(float(e["n"]), n), 1.0)
            if nratio > 8.0:
                continue
        ratio = max(wv, w) / max(min(wv, w), 1.0)
        if ratio <= 2.0 and (best is None or ratio < best[0]):
            best = (ratio, e.get("winner"))
    return best[1] if best else None


def measure_matvec_ms(mv, x, reps: int = 20, timed=None,
                      operand=None) -> float:
    """Chained ``lax.fori_loop`` differenced matvec timing in ms — the
    shared methodology of bench.py and tools/tune.py (dispatch/tunnel
    latency cancels between the 2-rep and (reps+2)-rep loops; single-op
    timing through the axon tunnel is meaningless).  ``timed`` overrides
    the wall-clock harness (bench passes its digest-synced version).

    ``operand``: when given, ``mv`` is the closure-free two-argument form
    ``mv(operand, x)`` (solvers.operator.as_matvec_split) and the operand
    rides the jit as an EXPLICIT argument — through the axon tunnel, jit
    closure constants (the prepared operator, up to GBs) are serialized
    into every remote-compile POST; explicit args stay device-resident."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    if timed is None:
        import time as _time

        def timed(fn):
            t0 = _time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            return _time.perf_counter() - t0

    if operand is not None:
        @jax.jit   # loop count DYNAMIC: one compile per form
        def loop_op(op, xx, r):
            return jax.lax.fori_loop(
                0, r, lambda i, y: mv(op, y / jnp.max(jnp.abs(y))), xx)
        loop = lambda xx, r: loop_op(operand, xx, r)  # noqa: E731
    else:
        @jax.jit   # loop count DYNAMIC: one compile per form
        def loop(xx, r):
            return jax.lax.fori_loop(
                0, r, lambda i, y: mv(y / jnp.max(jnp.abs(y))), xx)

    timed(lambda: loop(x, 2))             # compile
    timed(lambda: loop(x, reps + 2))      # compile
    t1 = min(timed(lambda: loop(x, 2)) for _ in range(3))
    t2 = min(timed(lambda: loop(x, reps + 2)) for _ in range(3))
    sm = max(t2 - t1, 1e-9) / reps
    return (t1 / 2.0 if sm < 1e-5 else sm) * 1e3
