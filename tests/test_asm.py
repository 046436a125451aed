"""PCASM: restricted/basic additive Schwarz with overlap (PETSc PCASM),
realized as one batched truncated SPIKE factorization of the concatenated
overlapped windows."""

import numpy as np
import pytest
import jax.numpy as jnp

from spike_petsc_tpu import BandedMatrix, Options, solve
from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.solvers.pc import make_pc
from spike_petsc_tpu.solvers.types import reason_str


def banded_of(acsr):
    data, kl, ku = hsp.csr_to_banded_arrays(acsr)
    return BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)


def _system(n=600, dominance=0.25, seed=5):
    a = problems.nonsym_banded(n, 3, 3, seed=seed, dominance=dominance)
    u = np.ones(n)
    return a, banded_of(a), u, jnp.asarray(a @ u)


def test_asm_overlap_improves_convergence():
    """More overlap => fewer outer iterations (the defining ASM property;
    overlap 0 is block-Jacobi truncation)."""
    a, A, u, b = _system()
    its = {}
    for ovl in (0, 3, 9):
        res = solve(A, b, ksp_type="gmres", pc_type="asm",
                    options=Options.from_argv(
                        ["-pc_asm_overlap", str(ovl)]),
                    rtol=1e-10, maxit=300)
        assert int(res.reason) > 0, reason_str(res.reason)
        its[ovl] = int(res.its)
        assert np.linalg.norm(np.asarray(res.x) - u) < 1e-5
    assert its[9] < its[3] < its[0], its


def test_asm_basic_variant_converges():
    a, A, u, b = _system()
    res = solve(A, b, ksp_type="gmres", pc_type="asm",
                options=Options.from_argv("-pc_asm_type basic".split()),
                rtol=1e-10, maxit=300)
    assert int(res.reason) > 0
    assert np.linalg.norm(np.asarray(res.x) - u) < 1e-6


def test_asm_overlap0_matches_bjacobi_truncation():
    """overlap=0 with aligned blocks is exactly the per-block Dirichlet
    truncation: its apply must agree with pc bjacobi configured with the
    same partitioning."""
    a, A, u, b = _system(n=512)
    pa = make_pc("asm", A, Options.from_argv(
        "-pc_asm_blocks 8 -pc_asm_overlap 0 -pc_asm_block 8".split()))
    pb = make_pc("bjacobi", A, Options.from_argv(
        "-pc_bjacobi_blocks 8 -pc_bjacobi_block 8".split()))
    r = jnp.asarray(np.random.default_rng(0).standard_normal(512))
    np.testing.assert_allclose(np.asarray(pa.apply(r)),
                               np.asarray(pb.apply(r)),
                               rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("asm_type", ["restrict", "basic"])
def test_asm_transpose_is_exact_adjoint(asm_type):
    import jax

    n = 80
    a = problems.nonsym_banded(n, 2, 2, seed=2)
    A = banded_of(a)
    pc = make_pc("asm", A, Options.from_argv(
        f"-pc_asm_blocks 4 -pc_asm_type {asm_type}".split()))
    eye = jnp.eye(n)
    # one jitted vmap per operator (row i = apply(e_i) => dense op is the
    # transpose of the stack)
    M = np.asarray(jax.jit(jax.vmap(pc.apply))(eye)).T
    MT = np.asarray(jax.jit(jax.vmap(pc.transpose().apply))(eye)).T
    np.testing.assert_allclose(MT, M.T, rtol=1e-12, atol=1e-13)


def test_asm_single_block_is_direct():
    a, A, u, b = _system(n=300)
    res = solve(A, b, ksp_type="gmres", pc_type="asm",
                options=Options.from_argv("-pc_asm_blocks 1".split()),
                rtol=1e-10, maxit=10)
    assert int(res.its) <= 2
    assert np.linalg.norm(np.asarray(res.x) - u) < 1e-8


def test_asm_rejects_bad_type():
    a, A, _, _ = _system(n=200)
    with pytest.raises(ValueError, match="restrict or basic"):
        make_pc("asm", A, Options.from_argv("-pc_asm_type xxx".split()))


def test_asm_with_bicg_transpose_path():
    """bicg uses PCApplyTranspose: the ASM adjoint rides the shadow
    recurrence."""
    a, A, u, b = _system(n=400, dominance=0.5)
    res = solve(A, b, ksp_type="bicg", pc_type="asm", rtol=1e-10, maxit=200)
    assert int(res.reason) > 0, reason_str(res.reason)
    assert np.linalg.norm(np.asarray(res.x) - u) < 1e-6


def test_asm_bf16_store_dtype_with_outer_krylov():
    """-pc_asm_store_dtype bf16: reduced-precision local factors still
    converge the outer Krylov solve to full accuracy (more iterations,
    PC-grade storage halved)."""
    a, A, u, b = _system(n=512, dominance=1.0)
    A32 = BandedMatrix(data=A.data.astype(jnp.float32), kl=A.kl, ku=A.ku)
    res = solve(A32, jnp.asarray(np.asarray(b), jnp.float32),
                ksp_type="gmres", pc_type="asm",
                options=Options.from_argv(
                    "-pc_asm_store_dtype bf16 -pc_asm_overlap 6".split()),
                rtol=1e-6, maxit=100)
    assert int(res.reason) > 0, reason_str(res.reason)
    rel = np.linalg.norm(np.asarray(res.x) - u) / np.linalg.norm(u)
    assert rel < 1e-4, rel
