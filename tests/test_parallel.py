"""Multi-chip SPIKE tests on the 8-device virtual CPU mesh.

The reference tests its MPI path with ``mpiexec -n N`` on one host
(/root/reference/src/makefile:18); our analogue is a forced 8-device host
platform (conftest.py).  Checks: distributed factorization+solve matches the
single-chip path and SciPy, the sharded matvec with ppermute halo matches the
dense product, and the full in-mesh Krylov solver converges."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.ops.band import BandedMatrix
from spike_petsc_tpu.parallel import (dist_spike_factor, dist_spike_solve,
                                      make_dist_solver, make_mesh)
from spike_petsc_tpu.ops.spike import spike_factor, spike_solve


def banded_of(acsr):
    data, kl, ku = hsp.csr_to_banded_arrays(acsr)
    return BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis="p")


def test_dist_factor_matches_single_chip(mesh):
    n = 512
    a = problems.spd_banded(n, 4, seed=0)
    bm = banded_of(a)
    dsf = dist_spike_factor(bm, mesh, block_b=8)
    rng = np.random.default_rng(1)
    u = rng.standard_normal(n)
    rhs = jnp.asarray(a @ u)
    x_dist = np.asarray(dist_spike_solve(dsf, rhs, mesh))
    np.testing.assert_allclose(x_dist, u, rtol=1e-8, atol=1e-9)
    # and agrees with the single-chip K=8 factorization
    sf = spike_factor(bm, K=8, block_b=8)
    x_single = np.asarray(spike_solve(sf, rhs))
    np.testing.assert_allclose(x_dist, x_single, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("ppd", [1, 2])
def test_dist_matvec_halo_exchange(mesh, ppd):
    from spike_petsc_tpu.parallel.spike_dist import (_dsf_specs, local_matvec,
                                                     _pad_shard_rhs)
    n = 400
    a = problems.nonsym_banded(n, 3, 2, seed=3)
    bm = banded_of(a)
    dsf = dist_spike_factor(bm, mesh, block_b=4, parts_per_device=ppd)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n)
    x_sh = _pad_shard_rhs(dsf, mesh, "p", jnp.asarray(x))

    def local_fn(dsf_in, xl):
        return local_matvec(dsf_in, xl.reshape(-1), "p").reshape(ppd, dsf.m)

    y = jax.shard_map(local_fn, mesh=mesh,
                      in_specs=(_dsf_specs(dsf, "p"), P("p")),
                      out_specs=P("p"), check_vma=False)(dsf, x_sh)
    y = np.asarray(y).reshape(-1)[:n]
    np.testing.assert_allclose(y, a @ x, rtol=1e-12, atol=1e-12)


def test_dist_parts_per_device(mesh):
    """K = 32 partitions over 8 devices (4 per device) — the v5p-8
    deployment shape."""
    n = 1280
    a = problems.spd_banded(n, 4, seed=11)
    bm = banded_of(a)
    dsf = dist_spike_factor(bm, mesh, block_b=8, parts_per_device=4)
    assert dsf.K == 32 and dsf.ppd == 4
    rng = np.random.default_rng(4)
    u = rng.standard_normal(n)
    x = np.asarray(dist_spike_solve(dsf, jnp.asarray(a @ u), mesh))
    np.testing.assert_allclose(x, u, rtol=1e-8, atol=1e-9)
    # matches the single-chip K=32 factorization
    sf = spike_factor(bm, K=32, block_b=8)
    x_single = np.asarray(spike_solve(sf, jnp.asarray(a @ u)))
    np.testing.assert_allclose(x, x_single, rtol=1e-10, atol=1e-11)
    # and the in-mesh Krylov solver works with ppd > 1
    solver = make_dist_solver(dsf, mesh, ksp_type="gmres", rtol=1e-10,
                              maxit=20)
    res = solver(jnp.asarray(a @ u))
    assert int(res.reason) > 0 and int(res.its) <= 3


def test_dist_truncated_variant(mesh):
    n = 640
    a = problems.nonsym_banded(n, 3, 3, seed=5, dominance=50.0)
    bm = banded_of(a)
    dsf = dist_spike_factor(bm, mesh, truncated=True, block_b=4)
    rng = np.random.default_rng(3)
    rhs = rng.standard_normal(n)
    x = np.asarray(dist_spike_solve(dsf, jnp.asarray(rhs), mesh))
    import scipy.linalg as sla
    ab = np.zeros((7, n))
    dense = a.toarray()
    for d in range(-3, 4):
        ab[3 - d, max(0, d):n + min(0, d)] = np.diag(dense, d)
    xs = sla.solve_banded((3, 3), ab, rhs)
    assert np.linalg.norm(x - xs) / np.linalg.norm(xs) < 1e-6


def test_dist_krylov_solver_unpreconditioned_reductions(mesh):
    """GMRES entirely inside shard_map: psum dots + ppermute halo matvec."""
    n = 512
    a = problems.spd_banded(n, 3, seed=7)
    bm = banded_of(a)
    dsf = dist_spike_factor(bm, mesh, block_b=4)
    solver = make_dist_solver(dsf, mesh, ksp_type="gmres", use_pc=False,
                              rtol=1e-10, maxit=400)
    u = np.ones(n)
    res = solver(jnp.asarray(a @ u))
    assert int(res.reason) > 0
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("ksp_type", ["gmres", "bcgs", "cg", "pipecg"])
def test_dist_krylov_spike_preconditioned(mesh, ksp_type):
    n = 700
    a = problems.spd_banded(n, 5, seed=9)
    bm = banded_of(a)
    dsf = dist_spike_factor(bm, mesh, block_b=8)
    solver = make_dist_solver(dsf, mesh, ksp_type=ksp_type, rtol=1e-10,
                              maxit=50)
    rng = np.random.default_rng(5)
    u = rng.standard_normal(n)
    res = solver(jnp.asarray(a @ u))
    assert int(res.reason) > 0
    assert int(res.its) <= 3  # exact-factorization PC
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-7, atol=1e-8)


def test_dist_solver_2d_mesh_rhs_batch():
    """dp x tp composition: 2-D mesh (rhs=2, p=4), factor replicated across
    the rhs axis, each rhs-row solves its own batch on its partition
    sub-axis."""
    from spike_petsc_tpu.parallel import make_mesh_2d
    from spike_petsc_tpu.parallel.spike_dist import (dist_spike_factor,
                                                     make_dist_solver_batched)
    mesh2 = make_mesh_2d((2, 4), axes=("rhs", "p"))
    n = 512
    a = problems.spd_banded(n, 3, seed=13)
    bm = banded_of(a)
    dsf = dist_spike_factor(bm, mesh2, axis="p", block_b=8,
                            parts_per_device=2)
    assert dsf.K == 8
    solver = make_dist_solver_batched(dsf, mesh2, ksp_type="gmres",
                                      rtol=1e-10, maxit=20)
    rng = np.random.default_rng(7)
    U = rng.standard_normal((4, n))
    B = np.stack([a @ U[i] for i in range(4)])
    X = np.asarray(solver(jnp.asarray(B)))
    np.testing.assert_allclose(X, U, rtol=1e-6, atol=1e-7)


def test_dist_spike_cr_method(mesh):
    """Distributed SPIKE with cyclic-reduction local factorizations."""
    n = 768
    a = problems.spd_banded(n, 4, seed=17)
    bm = banded_of(a)
    dsf = dist_spike_factor(bm, mesh, block_b=8, method="cr",
                            parts_per_device=2)
    rng = np.random.default_rng(9)
    u = rng.standard_normal(n)
    x = np.asarray(dist_spike_solve(dsf, jnp.asarray(a @ u), mesh))
    np.testing.assert_allclose(x, u, rtol=1e-8, atol=1e-9)
    solver = make_dist_solver(dsf, mesh, ksp_type="gmres", rtol=1e-10,
                              maxit=20)
    res = solver(jnp.asarray(a @ u))
    assert int(res.reason) > 0 and int(res.its) <= 3


def test_dist_reduced_cr_large_K(mesh):
    """K >> devices: the replicated reduced interface system must use
    log-depth cyclic reduction (VERDICT r1 item 5) and still be exact.
    K = 8 devices x 8 ppd = 64 partitions -> reduced nb = 63 >= 33 -> CR."""
    from spike_petsc_tpu.ops.cyclic import CRFactor

    n = 1024
    a = problems.spd_banded(n, 2, seed=23)
    bm = banded_of(a)
    dsf = dist_spike_factor(bm, mesh, block_b=4, parts_per_device=8)
    assert dsf.K == 64
    assert isinstance(dsf.red_fact, CRFactor)
    rng = np.random.default_rng(3)
    u = rng.standard_normal(n)
    x = np.asarray(dist_spike_solve(dsf, jnp.asarray(a @ u), mesh))
    np.testing.assert_allclose(x, u, rtol=1e-8, atol=1e-9)
    # explicit thomas opt-out still works
    dsf_t = dist_spike_factor(bm, mesh, block_b=4, parts_per_device=8,
                              reduced="thomas")
    assert not isinstance(dsf_t.red_fact, CRFactor)
    x_t = np.asarray(dist_spike_solve(dsf_t, jnp.asarray(a @ u), mesh))
    np.testing.assert_allclose(x_t, x, rtol=1e-9, atol=1e-10)


def test_multislice_layout():
    """(slice, p) mesh: exact SPIKE within a slice (ICI-only PC),
    block-Jacobi across slices, exact cross-slice matvec (SURVEY §5 DCN
    row; VERDICT r1 item 8)."""
    from spike_petsc_tpu.parallel import (
        make_mesh_multislice, dist_spike_factor_multislice,
        make_dist_solver_multislice)

    n = 768
    a = problems.spd_banded(n, 4, seed=0)
    bm = banded_of(a)
    mesh = make_mesh_multislice((2, 4))
    assert mesh.shape == {"slice": 2, "p": 4}
    dsf = dist_spike_factor_multislice(bm, mesh, block_b=8,
                                       parts_per_device=2)
    assert dsf.K == 16
    # per-slice reduced factors: leading dim = n_slices * (Ks - 1)
    lead = jax.tree_util.tree_leaves(dsf.red_fact)[0].shape[0]
    assert lead == 2 * (8 - 1)
    solver = make_dist_solver_multislice(dsf, mesh, ksp_type="gmres",
                                         rtol=1e-10, maxit=40)
    rng = np.random.default_rng(1)
    u = rng.standard_normal(n)
    res = solver(jnp.asarray(a @ u))
    assert int(res.reason) > 0
    # block-Jacobi across 2 slices: a handful of iterations, not dozens
    assert int(res.its) <= 15
    np.testing.assert_allclose(np.asarray(res.x), u, rtol=1e-7, atol=1e-8)


@pytest.mark.slow
@pytest.mark.parametrize("ppd", [1, 2])
def test_dist_matvec_banded_pallas_route(mesh, ppd):
    """matvec_impl='banded_pallas': the diagonal-major kernel covers every
    intra-device coupling (the band keeps what band_to_blocktri zeroes) and
    only the two k-wide DEVICE-edge strips ride ppermute.  Parity against
    the blocks route and the host oracle; f32 (the kernel is fixed-width
    only).  Asymmetric band exercises the kl != ku tip orientation."""
    from spike_petsc_tpu.parallel.spike_dist import (_dsf_specs,
                                                     _pad_shard_rhs,
                                                     local_matvec,
                                                     make_dist_solver)
    n = 8192        # the kernel needs >= 2*128 local rows per device
    a = problems.nonsym_banded(n, 3, 2, seed=3)
    bm32 = BandedMatrix(
        data=jnp.asarray(np.asarray(banded_of(a).data), jnp.float32),
        kl=3, ku=2)
    dsf = dist_spike_factor(bm32, mesh, block_b=8, parts_per_device=ppd,
                            matvec_impl="banded_pallas")
    assert dsf.mv_d3 is not None
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n).astype(np.float32)
    x_sh = _pad_shard_rhs(dsf, mesh, "p", jnp.asarray(x))

    def local_fn(dsf_in, xl):
        return local_matvec(dsf_in, xl.reshape(-1), "p").reshape(ppd, dsf.m)

    y = jax.shard_map(local_fn, mesh=mesh,
                      in_specs=(_dsf_specs(dsf, "p"), P("p")),
                      out_specs=P("p"), check_vma=False)(dsf, x_sh)
    y = np.asarray(y).reshape(-1)[:n]
    np.testing.assert_allclose(y, (a @ x).astype(np.float32),
                               rtol=2e-5, atol=2e-5)
    # end-to-end distributed Krylov riding the banded matvec
    u = rng.standard_normal(n).astype(np.float32)
    rhs = jnp.asarray((a @ u).astype(np.float32))
    res = make_dist_solver(dsf, mesh, ksp_type="gmres", rtol=1e-5)(rhs)
    assert int(res.reason) > 0


@pytest.mark.slow
def test_multislice_matvec_banded_pallas_route():
    """matvec_impl='banded_pallas' on a (slice, p) mesh: the edge strips
    ride the flattened (slice, p) ring, so the kernel route carries the
    same cross-slice traffic as the blocks route.  Parity against the host
    oracle + end-to-end multislice Krylov."""
    from spike_petsc_tpu.parallel import (dist_spike_factor_multislice,
                                          make_dist_solver_multislice,
                                          make_mesh_multislice)
    from spike_petsc_tpu.parallel.spike_dist import (_multislice_specs,
                                                     local_matvec_multislice)
    n = 8192        # the kernel needs >= 2*128 local rows per device
    a = problems.nonsym_banded(n, 3, 2, seed=5)
    bm32 = BandedMatrix(
        data=jnp.asarray(np.asarray(banded_of(a).data), jnp.float32),
        kl=3, ku=2)
    mesh = make_mesh_multislice((2, 4))
    dsf = dist_spike_factor_multislice(bm32, mesh, block_b=8,
                                       matvec_impl="banded_pallas")
    assert dsf.mv_d3 is not None
    rng = np.random.default_rng(6)
    x = rng.standard_normal(n).astype(np.float32)
    xp = jnp.zeros((dsf.K * dsf.m,), jnp.float32).at[:n].set(
        jnp.asarray(x)).reshape(dsf.K, dsf.m)
    x_sh = jax.device_put(xp, NamedSharding(mesh, P(("slice", "p"))))

    def local_fn(dsf_in, xl):
        y = local_matvec_multislice(dsf_in, xl.reshape(-1), "slice", "p",
                                    2, 4)
        return y.reshape(dsf.ppd, dsf.m)

    y = jax.shard_map(local_fn, mesh=mesh,
                      in_specs=(_multislice_specs(dsf, "slice", "p"),
                                P(("slice", "p"))),
                      out_specs=P(("slice", "p")), check_vma=False)(
        dsf, x_sh)
    y = np.asarray(y).reshape(-1)[:n]
    np.testing.assert_allclose(y, (a @ x).astype(np.float32),
                               rtol=2e-5, atol=2e-5)
    u = rng.standard_normal(n).astype(np.float32)
    rhs = jnp.asarray((a @ u).astype(np.float32))
    res = make_dist_solver_multislice(dsf, mesh, ksp_type="gmres",
                                      rtol=1e-5)(rhs)
    assert int(res.reason) > 0
    rel = np.linalg.norm(a @ np.asarray(res.x) - np.asarray(rhs)) \
        / np.linalg.norm(np.asarray(rhs))
    assert rel < 1e-4, rel
    np.testing.assert_allclose(np.asarray(res.x)[:n], u, rtol=2e-3,
                               atol=2e-3)
