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

import json
import os
import tempfile
from typing import Optional

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache",
                        "spike_petsc_tpu", "tuning.json")
_cache = {"path": None, "mtime": None, "data": None}


def record_path() -> str:
    return os.environ.get("SPIKE_TUNING_FILE", _DEFAULT)


def load() -> dict:
    """Read the tuning record (cached by path + mtime; re-reads on change)."""
    path = record_path()
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        return {}
    if _cache["path"] == path and _cache["mtime"] == mtime:
        return _cache["data"]
    try:
        with open(path) as f:
            data = json.load(f)
        if not isinstance(data, dict):
            data = {}
    except (OSError, ValueError):
        data = {}
    _cache.update(path=path, mtime=mtime, data=data)
    return data


def update(platform: str, kind: str, key: str, entry: dict) -> str:
    """Merge one measurement into the record (atomic rename write).

    Layout: ``{platform: {kind: {key: entry}}}`` — e.g.
    ``{"tpu": {"banded_matvec": {"201": {"winner": "blocktri", ...}}}}``.
    Returns the path written.
    """
    path = record_path()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = load() if os.path.exists(path) else {}
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


def matvec_route_hint(platform: str, w: int) -> Optional[str]:
    """The measured winner for a banded matvec of total width ``w`` on
    ``platform``, or None when no measurement within 2x bandwidth exists.
    """
    rec = load().get(platform, {}).get("banded_matvec", {})
    best = None
    for wk, e in rec.items():
        try:
            wv = float(wk)
        except ValueError:
            continue
        ratio = max(wv, w) / max(min(wv, w), 1.0)
        if ratio <= 2.0 and (best is None or ratio < best[0]):
            best = (ratio, e.get("winner"))
    return best[1] if best else None
