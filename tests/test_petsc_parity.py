"""PETSc residual-history parity (SURVEY.md §4: "same residual histories
±1 iteration" vs the reference's KSP oracle, /root/reference/src/testbed.c:316).

Three tiers, strongest available wins:
* live petsc4py comparison (skipped here — no PETSc build in this image),
* golden-file comparison against histories recorded by
  ``python -m spike_petsc_tpu.tools.petsc_parity record`` in a PETSc
  environment (skipped while tests/golden/petsc_histories.json is absent),
* harness self-checks that always run, so the machinery itself stays tested.
"""

import json
import os

import numpy as np
import pytest

from spike_petsc_tpu.tools import petsc_parity as pp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "petsc_histories.json")


def _case_ids():
    return [c[0] for c in pp.CASES]


@pytest.mark.parametrize("case", pp.CASES, ids=_case_ids())
def test_live_parity(case):
    petsc4py = pytest.importorskip(
        "petsc4py", reason="no PETSc build in this environment")
    del petsc4py
    name, fix, ksp, pc, rtol, maxit, restart = case
    a = fix()
    ours = pp.run_ours(a, ksp, pc, rtol, maxit, restart)
    ref = pp.run_petsc(a, ksp, pc, rtol, maxit, restart)
    errs = pp.compare(ours, ref, ksp)
    assert not errs, f"{name}: {errs}"


@pytest.mark.parametrize("case", pp.CASES, ids=_case_ids())
def test_golden_parity(case):
    if not os.path.exists(GOLDEN):
        pytest.skip("golden histories not recorded (needs a PETSc "
                    "environment; see spike_petsc_tpu/tools/petsc_parity.py)")
    name, fix, ksp, pc, rtol, maxit, restart = case
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert name in golden, f"{name} missing from golden file — re-record"
    rec = golden[name]
    assert (rec["ksp"], rec["pc"], rec["rtol"], rec["maxit"],
            rec["restart"]) == (ksp, pc, rtol, maxit, restart), \
        "golden file recorded with different parameters — re-record"
    ours = pp.run_ours(fix(), ksp, pc, rtol, maxit, restart)
    errs = pp.compare(ours, rec, ksp)
    assert not errs, f"{name}: {errs}"


@pytest.mark.parametrize("case", pp.CASES, ids=_case_ids())
def test_harness_runs_and_converges(case):
    """The ours-side harness must converge every case to its rtol — the
    standing (PETSc-free) guarantee that the parity cases stay solvable
    and the comparison machinery keeps working."""
    name, fix, ksp, pc, rtol, maxit, restart = case
    a = fix()
    ours = pp.run_ours(a, ksp, pc, rtol, maxit, restart)
    assert 0 < ours["its"] < maxit, name
    hist = ours["history"]
    assert len(hist) == ours["its"] + 1
    assert hist[-1] <= 10 * rtol * hist[0], name   # converged (monitor norm)


def test_compare_flags_mismatches():
    ref = {"its": 10, "history": [1.0, 0.1, 0.01]}
    assert pp.compare({"its": 10, "history": [1.0, 0.1, 0.01]},
                      ref, "gmres") == []
    assert pp.compare({"its": 12, "history": [1.0, 0.1, 0.01]},
                      ref, "gmres")          # iteration drift
    assert pp.compare({"its": 10, "history": [1.0, 0.2, 0.01]},
                      ref, "gmres")          # history drift
    # below-floor tail differences are ignored
    ref2 = {"its": 2, "history": [1.0, 1e-14]}
    assert pp.compare({"its": 2, "history": [1.0, 3e-14]},
                      ref2, "gmres") == []
