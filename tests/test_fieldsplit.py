"""Composite / fieldsplit preconditioner tests — the testbed2 composability
surface (/root/reference/src/testbed2.c:4)."""

import numpy as np
import pytest
import jax.numpy as jnp

from spike_petsc_tpu import Options, make_pc, solve
from spike_petsc_tpu.models import problems


def _problem(n=240, seed=2):
    a = problems.spd_banded(n, 3, seed=seed)
    u = np.random.default_rng(0).uniform(size=n)
    return a, u, a @ u


@pytest.mark.parametrize("ctype", ["additive", "multiplicative"])
def test_composite_pc(ctype):
    a, u, b = _problem()
    opts = Options({"pc_composite_pcs": "jacobi,bjacobi",
                    "pc_composite_type": ctype,
                    "sub_1_pc_bjacobi_blocks": "4"})
    pc = make_pc("composite", a, opts)
    res = solve(a, jnp.asarray(b), pc=pc, ksp_type="gmres", rtol=1e-10,
                maxit=500)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("ftype", ["additive", "multiplicative", "schur"])
def test_fieldsplit_types(ftype):
    a, u, b = _problem(n=300, seed=5)
    opts = Options({"pc_fieldsplit_type": ftype,
                    "fieldsplit_0_pc_type": "lu",
                    "fieldsplit_1_pc_type": "lu"})
    pc = make_pc("fieldsplit", a, opts)
    assert pc.info["type"] == ftype
    res = solve(a, jnp.asarray(b), pc=pc, ksp_type="fgmres", rtol=1e-10,
                maxit=300)
    assert int(res.reason) > 0, ftype
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-5, atol=1e-6)


def test_fieldsplit_schur_fast_convergence():
    """With exact inner solves and the selfp Schur approximation, fieldsplit
    should converge in a handful of iterations on a dominant band."""
    a, u, b = _problem(n=400, seed=7)
    opts = Options({"pc_fieldsplit_type": "schur",
                    "pc_fieldsplit_schur_precondition": "selfp"})
    pc = make_pc("fieldsplit", a, opts)
    res = solve(a, jnp.asarray(b), pc=pc, ksp_type="fgmres", rtol=1e-10,
                maxit=100)
    assert int(res.reason) > 0
    assert int(res.its) <= 25


def test_fieldsplit_multifield_sizes():
    """N contiguous fields via -pc_fieldsplit_sizes (PETSc multi-field
    parity; VERDICT r1 weak #7)."""
    a, u, b = _problem(n=300)
    opts = Options({"pc_fieldsplit_sizes": "100,80,120",
                    "pc_fieldsplit_type": "multiplicative"})
    pc = make_pc("fieldsplit", a, opts)
    assert pc.info["nfields"] == 3 and pc.info["sizes"] == [100, 80, 120]
    res = solve(a, jnp.asarray(b), pc=pc, ksp_type="gmres", rtol=1e-10,
                maxit=200)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-5, atol=1e-6)


def test_fieldsplit_additive_multifield():
    a, u, b = _problem(n=240)
    opts = Options({"pc_fieldsplit_sizes": "60,60,60,60",
                    "pc_fieldsplit_type": "additive"})
    pc = make_pc("fieldsplit", a, opts)
    res = solve(a, jnp.asarray(b), pc=pc, ksp_type="gmres", rtol=1e-10,
                maxit=500)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-5, atol=1e-6)


def test_fieldsplit_strided_components():
    """Interleaved-DOF split: -pc_fieldsplit_block_size 2 puts even/odd
    components into separate fields (PCFieldSplitSetFields analog)."""
    a, u, b = _problem(n=240)
    opts = Options({"pc_fieldsplit_block_size": "2",
                    "pc_fieldsplit_0_fields": "0",
                    "pc_fieldsplit_1_fields": "1",
                    "pc_fieldsplit_type": "multiplicative"})
    pc = make_pc("fieldsplit", a, opts)
    assert pc.info["sizes"] == [120, 120]
    res = solve(a, jnp.asarray(b), pc=pc, ksp_type="gmres", rtol=1e-10,
                maxit=300)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-5, atol=1e-6)


def test_fieldsplit_arbitrary_is():
    """PCFieldSplitSetIS analog: arbitrary (shuffled) index sets."""
    from spike_petsc_tpu.solvers.fieldsplit import pc_fieldsplit_is

    a, u, b = _problem(n=200)
    rng = np.random.default_rng(5)
    perm = rng.permutation(200)
    isets = [np.sort(perm[:90]), np.sort(perm[90:])]
    opts = Options({"pc_fieldsplit_type": "schur"})
    pc = pc_fieldsplit_is(a, isets, opts)
    res = solve(a, jnp.asarray(b), pc=pc, ksp_type="gmres", rtol=1e-10,
                maxit=200)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-5, atol=1e-6)


def test_fieldsplit_bad_sets_rejected():
    from spike_petsc_tpu.solvers.fieldsplit import pc_fieldsplit_is

    a, _, _ = _problem(n=100)
    with pytest.raises(ValueError, match="partition"):
        pc_fieldsplit_is(a, [np.arange(50), np.arange(40, 100)], Options({}))
    with pytest.raises(ValueError, match="2 fields"):
        pc_fieldsplit_is(a, [np.arange(30), np.arange(30, 60),
                             np.arange(60, 100)],
                         Options({"pc_fieldsplit_type": "schur"}))


def test_fieldsplit_fields_gap_is_an_error():
    """Non-contiguous -pc_fieldsplit_<i>_fields numbering must raise a
    clear diagnostic, not silently drop later fields (code-review r2)."""
    import pytest
    from spike_petsc_tpu.solvers.fieldsplit import _fieldsplit_isets
    from spike_petsc_tpu.utils.options import Options

    opts = Options({"pc_fieldsplit_block_size": "3",
                    "pc_fieldsplit_0_fields": "0",
                    "pc_fieldsplit_2_fields": "1,2"})
    with pytest.raises(ValueError, match="contiguously"):
        _fieldsplit_isets(opts, 9)


def test_composite_and_fieldsplit_transposes_adjoint_identity():
    """PCApplyTranspose for the composed PCs: every type must satisfy the
    adjoint identity <y, M^{-1} x> == <M^{-T} y, x> (composite reverses
    its multiplicative stage order on A^T; fieldsplit-schur swaps
    A01 <-> A10 transposed; block Gauss-Seidel becomes the upper sweep)."""
    from spike_petsc_tpu.solvers.fieldsplit import pc_fieldsplit_is
    from spike_petsc_tpu.solvers.pc import make_pc

    rng = np.random.default_rng(0)
    n = 200
    a = problems.nonsym_banded(n, 4, 3, seed=9).tocsr()
    x = jnp.asarray(rng.standard_normal(n))
    y = jnp.asarray(rng.standard_normal(n))

    def adjoint_gap(pc):
        t = pc.transpose()
        return abs(float(jnp.vdot(y, pc.apply(x)))
                   - float(jnp.vdot(t.apply(y), x)))

    for ct in ("additive", "multiplicative"):
        pc = make_pc("composite", a, Options(
            {"pc_composite_pcs": "jacobi,spike", "pc_composite_type": ct,
             "sub_1_pc_spike_partitions": 4}))
        assert adjoint_gap(pc) < 1e-10, ct
    perm = rng.permutation(n)
    isets = [np.sort(perm[:90]), np.sort(perm[90:])]
    for ft in ("schur", "additive", "multiplicative"):
        pc = pc_fieldsplit_is(a, isets, Options({"pc_fieldsplit_type": ft}))
        assert adjoint_gap(pc) < 1e-10, ft
    # and end-to-end: BiCG's shadow recurrence through the Schur transpose
    u = rng.standard_normal(n)
    pcS = pc_fieldsplit_is(a, isets, Options({"pc_fieldsplit_type": "schur"}))
    res = solve(a, jnp.asarray(a @ u), pc=pcS, ksp_type="bicg", rtol=1e-10,
                maxit=200)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-5, atol=1e-6)
