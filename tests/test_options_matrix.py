"""Options-matrix robustness sweep: every registered KSP x a representative
PC set through the public solve() surface.  The assertion is weak on
purpose — return a sane KSPResult (finite monitored quantities, a real
reason code) and, where the method suits the operator, converge — the
point is that no (ksp, pc) combination crashes, mis-shapes, or hangs.
PETSc's equivalent guarantee comes from its nightly option-matrix CI."""

import numpy as np
import pytest
import jax.numpy as jnp

from spike_petsc_tpu import BandedMatrix, Options, solve
from spike_petsc_tpu import sparse as hsp
from spike_petsc_tpu.models import problems
from spike_petsc_tpu.solvers.types import reason_str
from spike_petsc_tpu.utils.registry import SOLVERS

# methods that REQUIRE an SPD operator/PC pairing to make sense
SPD_ONLY = {"cg", "pipecg", "minres", "chebyshev", "cr", "symmlq"}
# aliases that duplicate an already-swept implementation
ALIASES = {"bicgstab", "fbcgs", "cgnr", "cgls"}
PCS = ["none", "jacobi", "spike", "asm"]


def _nonsym():
    a = problems.nonsym_banded(150, 2, 2, seed=3)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    u = np.ones(150)
    return BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku), u, a @ u


def _spd():
    a = problems.spd_banded(150, 2, seed=3)
    data, kl, ku = hsp.csr_to_banded_arrays(a)
    u = np.ones(150)
    return BandedMatrix(data=jnp.asarray(data), kl=kl, ku=ku), u, a @ u


@pytest.mark.parametrize("pc_type", PCS)
@pytest.mark.parametrize("ksp_type",
                         [k for k in SOLVERS.names() if k not in ALIASES])
def test_every_ksp_pc_combination(ksp_type, pc_type):
    A, u, b = _spd() if ksp_type in SPD_ONLY else _nonsym()
    opts = Options.from_argv(
        "-pc_asm_blocks 4 -ksp_ksp_type gmres -ksp_pc_type jacobi".split())
    res = solve(A, jnp.asarray(b), ksp_type=ksp_type, pc_type=pc_type,
                options=opts, rtol=1e-8, maxit=400)
    # sane result object
    assert int(res.its) >= 0
    assert reason_str(res.reason) != f"UNKNOWN({int(res.reason)})"
    assert np.isfinite(float(res.rnorm)) or int(res.reason) < 0
    # preonly with a non-factorization PC legitimately doesn't solve;
    # richardson/chebyshev may need more iterations than the cap — only
    # demand convergence where the method+PC pair should deliver it
    expect_converge = not (
        ksp_type in ("preonly", "richardson", "chebyshev")
        and pc_type in ("none", "jacobi", "asm"))
    if expect_converge:
        assert int(res.reason) > 0, (ksp_type, pc_type,
                                     reason_str(res.reason))
        err = np.linalg.norm(np.asarray(res.x) - u)
        assert err < 1e-3, (ksp_type, pc_type, err)
