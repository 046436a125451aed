"""PCKSP: inner Krylov solve as preconditioner (PETSc PCKSP), configured
under the ``ksp_`` options prefix exactly as PETSc's PCKSP does."""

import numpy as np
import pytest
import jax.numpy as jnp

from spike_petsc_tpu import BandedMatrix, Options, solve
from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.solvers.pc import make_pc
from spike_petsc_tpu.solvers.types import reason_str


def _system(n=200, dominance=0.3, seed=5):
    a = problems.nonsym_banded(n, 3, 3, seed=seed, dominance=dominance)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    A = BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)
    u = np.ones(n)
    return a, A, u, jnp.asarray(a @ u)


def test_pcksp_accelerates_fgmres():
    a, A, u, b = _system()
    opts = Options.from_argv(
        "-ksp_ksp_type gmres -ksp_pc_type bjacobi -ksp_ksp_rtol 1e-3".split())
    res = solve(A, b, ksp_type="fgmres", pc_type="ksp", options=opts,
                rtol=1e-10, maxit=100)
    assert int(res.reason) > 0, reason_str(res.reason)
    assert int(res.its) <= 10          # unpreconditioned gmres needs ~450
    assert np.linalg.norm(np.asarray(res.x) - u) < 1e-8


def test_pcksp_nested_prefix_composition():
    """-ksp_banded_pc_type: a PCBANDED inside the inner KSP — three levels
    of prefix scoping (outer -> ksp_ -> ksp_banded_)."""
    a = problems.nonsym_banded(300, 4, 4, seed=2)
    u = np.ones(300)
    b = jnp.asarray(a @ u)
    opts = Options.from_argv(
        ("-ksp_ksp_type gmres -ksp_pc_type banded -ksp_pc_banded_kmax 2 "
         "-ksp_banded_pc_type spike -ksp_banded_pc_spike_partitions 4 "
         "-ksp_ksp_rtol 1e-4").split())
    res = solve(a, b, ksp_type="fgmres", pc_type="ksp", options=opts,
                rtol=1e-8, maxit=200)
    assert int(res.reason) > 0, reason_str(res.reason)
    assert np.linalg.norm(np.asarray(res.x) - u) / np.linalg.norm(u) < 1e-6


def test_pcksp_transpose_apply():
    a, A, u, b = _system()
    opts = Options.from_argv(
        "-ksp_ksp_type gmres -ksp_pc_type bjacobi -ksp_ksp_rtol 1e-3".split())
    res = solve(A, b, ksp_type="fgmres", pc_type="ksp", options=opts,
                rtol=1e-10, maxit=100, transpose=True)
    assert int(res.reason) > 0
    ut = np.linalg.solve(a.toarray().T, np.asarray(b))
    assert np.linalg.norm(np.asarray(res.x) - ut) < 1e-8


def test_pcksp_view_describes_hierarchy():
    _, A, _, _ = _system()
    opts = Options.from_argv("-ksp_pc_type bjacobi".split())
    pc = make_pc("ksp", A, opts)
    d = pc.describe()
    assert "PC ksp" in d and "bjacobi" in d


def test_pcksp_exact_inner_solve_converges_outer_in_one():
    """Inner solve run to machine tolerance == a direct PC: the outer
    method finishes in one (or two) iterations."""
    a, A, u, b = _system(dominance=2.0)
    opts = Options.from_argv(
        "-ksp_ksp_type gmres -ksp_ksp_rtol 1e-14 -ksp_ksp_max_it 500".split())
    res = solve(A, b, ksp_type="fgmres", pc_type="ksp", options=opts,
                rtol=1e-10, maxit=10)
    assert int(res.reason) > 0
    assert int(res.its) <= 2
    assert np.linalg.norm(np.asarray(res.x) - u) < 1e-7
