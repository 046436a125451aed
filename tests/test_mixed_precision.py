"""Mixed-precision factorization: bf16 factor storage + iterative
refinement recovers working-precision accuracy (SURVEY.md §7 hard-part 3)."""

import numpy as np
import jax.numpy as jnp

from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.ops.band import BandedMatrix, banded_matvec
from spike_petsc_tpu.ops.spike import spike_factor, spike_solve
from spike_petsc_tpu.solvers.krylov import richardson


def _setup(n=800, k=4, seed=3):
    a = problems.spd_banded(n, k, seed=seed)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    bm = BandedMatrix(data=jnp.asarray(data, jnp.float32), kl=kl, ku=ku)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(n).astype(np.float32)
    return a, bm, u


def test_bf16_factor_solve_coarse_accuracy():
    a, bm, u = _setup()
    sf = spike_factor(bm, K=8, block_b=8, store_dtype=jnp.bfloat16)
    rhs = banded_matvec(bm, jnp.asarray(u))
    x = np.asarray(spike_solve(sf, rhs))
    rel = np.linalg.norm(x - u) / np.linalg.norm(u)
    assert rel < 5e-2  # bf16 has ~3 decimal digits


def test_bf16_plus_refinement_reaches_f32_accuracy():
    a, bm, u = _setup()
    sf = spike_factor(bm, K=8, block_b=8, store_dtype=jnp.bfloat16)
    rhs = banded_matvec(bm, jnp.asarray(u))
    res = richardson(lambda v: banded_matvec(bm, v), rhs, None,
                     lambda v: spike_solve(sf, v), rtol=1e-6, maxit=20)
    x = np.asarray(res.x)
    rel = np.linalg.norm(x - u) / np.linalg.norm(u)
    assert int(res.reason) > 0
    assert rel < 1e-5
    assert int(res.its) <= 8  # refinement converges fast off a bf16 factor


def test_refinement_iteration_count_vs_full_precision():
    a, bm, u = _setup()
    rhs = banded_matvec(bm, jnp.asarray(u))
    sf32 = spike_factor(bm, K=8, block_b=8)
    res32 = richardson(lambda v: banded_matvec(bm, v), rhs, None,
                       lambda v: spike_solve(sf32, v), rtol=1e-6, maxit=20)
    assert int(res32.its) <= 2  # f32 factor: essentially direct
