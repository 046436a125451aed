"""Chebyshev KSP and factorization checkpoint/resume tests."""

import numpy as np
import jax.numpy as jnp

from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.io import load_factorization, save_factorization
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
from spike_petsc_tpu.ops.spike import spike_factor, spike_solve
from spike_petsc_tpu.solvers.krylov import chebyshev
from spike_petsc_tpu import solve


def _banded(a):
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    return BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)


def test_chebyshev_jacobi_preconditioned():
    a = problems.spd_banded(200, 2, seed=1)
    bm = _banded(a)
    u = np.ones(200)
    b = jnp.asarray(a @ u)
    d = jnp.asarray(a.diagonal())
    # jacobi-preconditioned SPD: spectrum within (0, 2); dominant => near 1
    res = chebyshev(lambda v: banded_matvec(bm, v), b, None,
                    lambda v: v / d, emin=0.3, emax=1.7, rtol=1e-10,
                    maxit=300)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-6, atol=1e-7)


def test_chebyshev_registered():
    a = problems.spd_banded(150, 2, seed=3)
    u = np.ones(150)
    res = solve(_banded(a), jnp.asarray(a @ u), ksp_type="chebyshev",
                pc_type="jacobi", rtol=1e-9, maxit=400,
                emin=0.3, emax=1.7)
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-5, atol=1e-6)


def test_factorization_checkpoint_roundtrip(tmp_path):
    a = problems.nonsym_banded(300, 3, 3, seed=5)
    bm = _banded(a)
    sf = spike_factor(bm, K=4, block_b=8)
    path = str(tmp_path / "factor.npz")
    save_factorization(path, sf)
    sf2 = load_factorization(path)
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal(300))
    x1 = np.asarray(spike_solve(sf, rhs))
    x2 = np.asarray(spike_solve(sf2, rhs))
    np.testing.assert_allclose(x1, x2, rtol=1e-14)


def test_factorization_checkpoint_truncated_and_k1(tmp_path):
    a = problems.nonsym_banded(240, 2, 2, seed=7, dominance=20.0)
    bm = _banded(a)
    for kwargs, name in [(dict(K=1), "k1"),
                         (dict(K=4, block_b=8, truncated=True), "trunc")]:
        sf = spike_factor(bm, **kwargs)
        path = str(tmp_path / f"f_{name}.npz")
        save_factorization(path, sf)
        sf2 = load_factorization(path)
        rhs = jnp.asarray(np.random.default_rng(1).standard_normal(240))
        np.testing.assert_allclose(np.asarray(spike_solve(sf, rhs)),
                                   np.asarray(spike_solve(sf2, rhs)),
                                   rtol=1e-14)


def test_options_file(tmp_path):
    from spike_petsc_tpu.utils.options import Options
    p = tmp_path / "opts.txt"
    p.write_text("# solver settings\n-ksp_type cg -ksp_rtol 1e-9\n"
                 "-pc_type jacobi  # inline comment\n-flag\n")
    o = Options.from_file(str(p))
    assert o.get_string("ksp_type") == "cg"
    assert o.get_real("ksp_rtol") == 1e-9
    assert o.get_string("pc_type") == "jacobi"
    assert o.get_bool("flag") is True


def test_pc_check_detects_singular():
    import pytest as _pytest
    import scipy.sparse as sp
    from spike_petsc_tpu import Options, make_pc
    # matrix with a zero diagonal block -> singular Schur pivot
    n = 64
    a = problems.tridiag_laplacian(n).tolil()
    a[0, 0] = 0.0
    a[0, 1] = 0.0
    a[1, 0] = 0.0
    a = a.tocsr()
    with _pytest.raises(FloatingPointError):
        make_pc("spike", a, Options({"pc_spike_check": "1",
                                     "pc_spike_partitions": "4",
                                     "pc_spike_block": "4"}))


def test_factorization_checkpoint_cr_variants(tmp_path):
    """Every spike_factor variant round-trips: CR partition factors, CR
    reduced system, stored spikes (ADVICE round 1)."""
    rng = np.random.default_rng(2)
    a = problems.nonsym_banded(560, 2, 2, seed=9, dominance=8.0)
    bm = _banded(a)
    rhs = jnp.asarray(rng.standard_normal(560))
    for kwargs, name in [
            (dict(K=4, block_b=8, method="cr"), "cr"),
            (dict(K=40, block_b=4, reduced="cr"), "bigK_cr_reduced"),
            (dict(K=4, block_b=8, store_spikes=True), "spikes"),
            (dict(K=4, block_b=8, store_spikes=True,
                  spike_dtype=jnp.bfloat16), "bf16_spikes"),
            (dict(K=4, block_b=8, method="cr", reduced="cr"), "cr_cr"),
            (dict(K=4, block_b=8, store_lt=True), "store_lt")]:
        sf = spike_factor(bm, **kwargs)
        path = str(tmp_path / f"f_{name}.npz")
        save_factorization(path, sf)
        sf2 = load_factorization(path)
        np.testing.assert_allclose(np.asarray(spike_solve(sf, rhs)),
                                   np.asarray(spike_solve(sf2, rhs)),
                                   rtol=1e-14)
        if kwargs.get("store_lt"):
            # the stored L blocks survive the round-trip (transpose builds
            # the regular form from the RELOADED factor, no band needed)
            from spike_petsc_tpu.ops.blocktri import BlockTriFactor
            from spike_petsc_tpu.ops.spike import spike_transpose
            np.testing.assert_array_equal(np.asarray(sf.Lb),
                                          np.asarray(sf2.Lb))
            sft = spike_transpose(sf2)
            assert isinstance(sft.fact, BlockTriFactor)
            xt = np.asarray(spike_solve(sft, rhs))
            np.testing.assert_allclose(
                xt, np.linalg.solve(a.toarray().T, np.asarray(rhs)),
                rtol=1e-8, atol=1e-9)


def test_pc_bjacobi_cr_method():
    """-pc_bjacobi_method cr dispatches on the CR factor type (ADVICE r1)."""
    from spike_petsc_tpu import Options, make_pc
    a = problems.spd_banded(256, 2, seed=4)
    pc = make_pc("bjacobi", a, Options({"pc_bjacobi_blocks": "4",
                                        "pc_bjacobi_block": "8",
                                        "pc_bjacobi_method": "cr"}))
    x = np.asarray(pc.apply(jnp.ones(256)))
    assert np.all(np.isfinite(x)) and np.linalg.norm(x) > 0
