"""Pallas sweep kernels vs the XLA scan implementation (interpret mode on
the CPU test mesh; the same code compiles natively on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.ops.band import BandedMatrix
from spike_petsc_tpu.ops.blocktri import band_to_blocktri, blocktri_factor, blocktri_solve
from spike_petsc_tpu.ops.pallas.sweeps import blocktri_solve_batched_pallas
from spike_petsc_tpu.ops.spike import spike_factor, spike_solve


def _batched_factor(n, k, K, b, seed=0):
    a = problems.nonsym_banded(n, k, k, seed=seed)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    bm = BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku)
    sf = spike_factor(bm, K=K, block_b=b)
    return a, bm, sf


@pytest.mark.parametrize("K,b", [(4, 8), (8, 16)])
def test_pallas_sweeps_match_xla(K, b):
    n = 512
    a, bm, sf = _batched_factor(n, 3, K, b, seed=1)
    rng = np.random.default_rng(0)
    rblk = jnp.asarray(rng.standard_normal((K, sf.nb, sf.b)))
    x_p = blocktri_solve_batched_pallas(sf.fact, rblk)
    x_x = jax.vmap(blocktri_solve)(sf.fact, rblk)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x),
                               rtol=1e-10, atol=1e-11)


def test_spike_solve_pallas_impl_matches():
    n = 700
    a, bm, sf = _batched_factor(n, 4, 4, 8, seed=3)
    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.standard_normal(n))
    x_p = np.asarray(spike_solve(sf, rhs, impl="pallas"))
    x_x = np.asarray(spike_solve(sf, rhs, impl="xla"))
    np.testing.assert_allclose(x_p, x_x, rtol=1e-9, atol=1e-10)


def test_pallas_sweeps_bf16_factors():
    n = 512
    a = problems.spd_banded(n, 3, seed=5)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    bm = BandedMatrix(data=jnp.asarray(data, jnp.float32), kl=kl, ku=ku)
    sf = spike_factor(bm, K=4, block_b=8, store_dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    u = rng.standard_normal(n).astype(np.float32)
    from spike_petsc_tpu.ops.band import banded_matvec
    rhs = banded_matvec(bm, jnp.asarray(u))
    x = np.asarray(spike_solve(sf, rhs, impl="pallas"))
    rel = np.linalg.norm(x - u) / np.linalg.norm(u)
    assert rel < 5e-2


def test_chunking_respects_vmem_budget():
    from spike_petsc_tpu.ops.pallas.sweeps import _chunk_size
    # bwd (2 streamed matrices): 4 buffers of kt*b*b*itemsize within budget
    assert _chunk_size(64, 128, 4, n_mats=2) * 4 * 128 * 128 * 4 <= 6 * 1024 * 1024
    # fwd (1 matrix) gets a larger chunk
    assert _chunk_size(64, 128, 4, n_mats=1) >= 2 * _chunk_size(64, 128, 4, n_mats=2)
    assert 64 % _chunk_size(64, 128, 4) == 0
    assert _chunk_size(3, 8, 4) == 3
    assert _chunk_size(64, 128, 2) == 2 * _chunk_size(64, 128, 4)
