"""Integration tests: the testbed CLI end-to-end (the reference's de-facto
test suite, SURVEY.md §4) plus the reordered-solve wrapper and I/O."""

import os
import tempfile

import numpy as np
import pytest
import scipy.sparse as sp

from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.io import (load_matrix, read_mat, read_vec, write_mat,
                                write_vec, write_matrix_market, save_banded,
                                load_banded)
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.solvers.reorder import solve_reordered
from spike_petsc_tpu.testbed import main as run_testbed
from spike_petsc_tpu.utils.options import Options


def test_petsc_binary_roundtrip(tmp_path):
    a = problems.general_sparse(50, seed=3)
    path = str(tmp_path / "a.bin")
    write_mat(path, a)
    b = read_mat(path)
    np.testing.assert_allclose(b.toarray(), a.toarray())
    v = np.random.default_rng(0).standard_normal(50)
    vpath = str(tmp_path / "v.bin")
    write_vec(vpath, v)
    np.testing.assert_allclose(read_vec(vpath), v)


def test_matrix_market_load(tmp_path):
    a = problems.mc64_doc_example()
    path = str(tmp_path / "a.mtx")
    write_matrix_market(path, a)
    b = load_matrix(path)
    np.testing.assert_allclose(b.toarray(), a.toarray())


def test_banded_snapshot_roundtrip(tmp_path):
    import jax.numpy as jnp

    from spike_petsc_tpu.ops.band import BandedMatrix
    data, kl, ku = hsp.csr_to_banded_arrays(problems.tridiag_laplacian(20))
    bm = BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)
    path = str(tmp_path / "band.npz")
    save_banded(path, bm)
    bm2 = load_banded(path)
    np.testing.assert_allclose(np.asarray(bm2.data), np.asarray(bm.data))
    assert (bm2.kl, bm2.ku) == (kl, ku)


def test_testbed_tridiag_direct(capsys):
    rc = run_testbed("-problem tridiag:500 -ksp_type preonly "
                      "-pc_type lu".split())
    out = capsys.readouterr().out
    assert rc == 0
    err = float(out.split("Error in solution:")[1].split()[0])
    assert err < 1e-6


def test_testbed_full_pipeline_illscaled(capsys):
    """BASELINE config 3 end-to-end: MC64 scale+permute, RCM, banded
    extraction, SPIKE-preconditioned BiCGStab."""
    rc = run_testbed(
        "-problem illscaled:400:4:4 -mat_ordering_type wbm "
        "-mat_ordering_scale 1 -mat_ordering_type2 rcm -banded_pre_mat 1 "
        "-pc_banded_frac 0.9999 -ksp_type bcgs -pc_type banded "
        "-ksp_rtol 1e-10 -banded_pc_spike_partitions 4".split())
    out = capsys.readouterr().out
    assert rc == 0
    assert "Reordered matrix using wbm" in out
    assert "Norm of diagonal" in out
    err = float(out.split("Error in solution:")[1].split()[0])
    assert err < 1e-4


def test_testbed_petsc_binary_input(tmp_path, capsys):
    a = problems.spd_banded(300, 3, seed=5)
    path = str(tmp_path / "mat.bin")
    write_mat(path, a)
    rc = run_testbed(f"-mat {path} -ksp_type cg -pc_type jacobi "
                      "-ksp_rtol 1e-10".split())
    assert rc == 0
    err = float(capsys.readouterr().out.split("Error in solution:")[1].split()[0])
    assert err < 1e-5


def test_testbed_reports_bandwidth_reduction(capsys):
    rc = run_testbed("-problem lap2d:20:10 -mat_ordering_type2 rcm "
                      "-ksp_type cg -pc_type lu -ksp_rtol 1e-10".split())
    out = capsys.readouterr().out
    assert rc == 0
    assert "bandwidth from" in out


# ---------------------------------------------------------------------------
# solve_reordered (KSPREORDER equivalent)
# ---------------------------------------------------------------------------

def test_solve_reordered_wbm_scaled():
    a = problems.illscaled_nonsym(300, 3, 3, seed=7)
    u = np.ones(300)
    b = a @ u
    res = solve_reordered(
        a, b, ordering="wbm", scale=True, ksp_type="gmres", pc_type="lu",
        rtol=1e-12, options=Options())
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-6, atol=1e-7)


def test_solve_reordered_options_prefix():
    a = problems.general_sparse(200, seed=9)
    rng = np.random.default_rng(1)
    p = rng.permutation(200)
    scrambled = hsp.permute(a, p, p)
    u = rng.uniform(size=200)
    b = scrambled @ u
    opts = Options.from_argv(
        "-mat_ordering_type rcm -reorder_ksp_type gmres "
        "-reorder_pc_type banded -reorder_pc_banded_frac 0.9999 "
        "-reorder_ksp_rtol 1e-11".split())
    res = solve_reordered(scrambled, b, options=opts)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-5, atol=1e-6)


def test_solve_reordered_identity_consistency():
    """Permuted-solve identity check, the capability of the reference's
    #if 0 debug harness (/root/reference/src/kspreorder.c:34-111)."""
    a = problems.nonsym_banded(150, 2, 2, seed=11)
    u = np.random.default_rng(2).standard_normal(150)
    b = a @ u
    res = solve_reordered(a, b, ordering="rcm", ksp_type="gmres",
                          pc_type="lu", rtol=1e-12, options=Options())
    # residual in the ORIGINAL ordering
    r = np.linalg.norm(a @ np.asarray(res.x) - b) / np.linalg.norm(b)
    assert r < 1e-9


def test_testbed_zero_diagonal_with_shift(capsys):
    """The reference's zero-diagonal scenario (testbed.c:266-272) solves
    under -pc_factor_shift_type nonzero (makefile:18 parity)."""
    rc = run_testbed("-problem zerodiag:400 -ksp_type gmres -pc_type spike "
                     "-pc_spike_partitions 4 -pc_spike_block 4 "
                     "-pc_factor_shift_type nonzero -ksp_rtol 1e-9".split())
    out = capsys.readouterr().out
    assert rc == 0
    assert "CONVERGED" in out


def test_testbed_true_residual_monitor(capsys):
    rc = run_testbed("-problem spd:300:2 -ksp_type gmres -pc_type jacobi "
                     "-ksp_rtol 1e-8 -ksp_monitor_true_residual".split())
    out = capsys.readouterr().out
    assert rc == 0
    assert "true resid norm" in out


def test_testbed_banded_pre_mat_feeds_any_pc(capsys):
    """-banded_pre_mat must precondition spike/lu PCs too, matching
    KSPSetOperators(A, B) (/root/reference/src/testbed.c:314; ADVICE r1)."""
    rc = run_testbed("-problem spd:300:6 -banded_pre_mat 1 "
                     "-pc_banded_kmax 2 -pc_banded_frac 0.5 "
                     "-ksp_type gmres -pc_type lu -ksp_rtol 1e-8".split())
    out = capsys.readouterr().out
    assert rc == 0
    # the extraction banner prints, and the solve still converges (the band
    # is only a preconditioner; GMRES iterates on the full operator)
    assert "band:" in out or "norm fraction" in out


def test_testbed_ksp_view(capsys):
    """-ksp_view prints the configured solver hierarchy, including the
    nested PC tree (KSPView/PCView analogue; cf. PCView_Banded,
    /root/reference/src/matbanded.c:196-211)."""
    rc = run_testbed("-problem tridiag:300 -ksp_type gmres -pc_type banded "
                     "-banded_pc_spike_partitions 4 -ksp_view".split())
    out = capsys.readouterr().out
    assert rc == 0
    assert "KSP Object:" in out and "type: gmres" in out
    assert "restart=30" in out and "tolerances: relative=1e-05" in out
    assert "PC banded:" in out and "PC spike: partitions=4" in out


def test_testbed_log_view(capsys):
    """-log_view prints the -log_summary style stage table (SURVEY §5
    tracing row)."""
    from spike_petsc_tpu.utils import profiling
    profiling.clear()
    rc = run_testbed("-problem tridiag:300 -mat_ordering_type rcm "
                     "-ksp_type gmres -pc_type lu -log_view".split())
    out = capsys.readouterr().out
    assert rc == 0
    assert "KSPSolve" in out and "MatOrdering:rcm" in out
    assert "total_ms" in out


@pytest.mark.parametrize("flags", [
    "-ksp_type lsqr -pc_type spike",
    "-ksp_type cgne -pc_type lu",
    "-ksp_type cgs -pc_type lu",
    "-ksp_type tfqmr -pc_type spike",
    "-ksp_type gcr -pc_type lu",
    "-ksp_type fgmres -pc_type ksp -ksp_ksp_type gmres -ksp_pc_type "
    "bjacobi -ksp_ksp_rtol 1e-3",
])
def test_testbed_new_ksp_types(capsys, flags):
    """The whole new KSP/PC surface is reachable from the options database
    through the CLI (registry-driven, like PETSc's -ksp_type)."""
    rc = run_testbed((f"-problem nonsym:300:3:3 {flags} "
                      "-ksp_rtol 1e-9").split())
    out = capsys.readouterr().out
    assert rc == 0
    err = float(out.split("Error in solution:")[1].split()[0])
    assert err < 1e-4


def test_testbed_compute_singularvalues(capsys):
    rc = run_testbed("-problem nonsym:200:2:2 -ksp_type gmres -pc_type "
                     "bjacobi -ksp_compute_singularvalues".split())
    out = capsys.readouterr().out
    assert rc == 0
    assert "extreme singular values" in out
