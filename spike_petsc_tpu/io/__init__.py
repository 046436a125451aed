"""Matrix/vector persistence: PETSc binary, MatrixMarket, npz band snapshots.

Covers the reference's persistence surface (SURVEY.md §5 checkpoint/resume):
PETSc binary MatLoad (/root/reference/src/testbed.c:195-198) and
MatrixMarket export of reordered matrices (/root/reference/src/wbm.c:516-524,
/root/reference/src/HOWTO:4-5), plus native .npz snapshots of band storage
and factorization state (a capability the reference lacks).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .petsc_binary import read_mat, read_vec, write_mat, write_vec


def read_matrix_market(path: str) -> sp.csr_matrix:
    from scipy.io import mmread
    return sp.csr_matrix(mmread(path))


def write_matrix_market(path: str, a) -> None:
    from scipy.io import mmwrite
    mmwrite(path, sp.coo_matrix(a))


def load_matrix(path: str) -> sp.csr_matrix:
    """Format-sniffing loader: .mtx / .mm -> MatrixMarket, .npz -> scipy
    sparse npz, anything else -> PETSc binary."""
    lower = path.lower()
    if lower.endswith((".mtx", ".mm", ".mtx.gz")):
        return read_matrix_market(path)
    if lower.endswith(".npz"):
        return sp.csr_matrix(sp.load_npz(path))
    return read_mat(path)


def save_banded(path: str, band) -> None:
    """Snapshot band storage (and optionally factors) to .npz."""
    np.savez_compressed(path, data=np.asarray(band.data), kl=band.kl,
                        ku=band.ku)


def load_banded(path: str):
    import jax.numpy as jnp

    from ..ops.band import BandedMatrix
    z = np.load(path)
    return BandedMatrix(data=jnp.asarray(z["data"]), kl=int(z["kl"]),
                        ku=int(z["ku"]))


def save_factorization(path: str, sf) -> None:
    """Checkpoint a SpikeFactor (pytree -> npz): amortize setup across runs —
    a capability the reference lacks entirely (SURVEY.md §5 checkpoint/resume:
    'none')."""
    import json

    import jax

    leaves, treedef = jax.tree_util.tree_flatten(sf)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = dict(n=sf.n, K=sf.K, m=sf.m, b=sf.b, k=sf.k,
                truncated=sf.truncated, method=sf.fact.method)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_factorization(path: str):
    import json

    import jax
    import jax.numpy as jnp

    from ..ops.spike import SpikeFactor

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    # rebuild the treedef by constructing a structurally-identical factor
    # skeleton, then replacing leaves in flatten order
    n_leaves = len([k for k in z.files if k.startswith("leaf_")])
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n_leaves)]

    from ..ops.blocktri import BlockTriFactor
    method = meta["method"]
    # the leaf order of SpikeFactor is deterministic given which optional
    # fields are present; reconstruct by unflattening against a template
    def template():
        fact = BlockTriFactor(F=0, U=0, Sinv=0, Slu=0, piv=0, method=method)
        if meta["K"] == 1:
            red, red_dinv = None, None
        elif meta["truncated"]:
            red, red_dinv = None, 0
        else:
            red, red_dinv = fact, None
        return SpikeFactor(fact=fact, Btip=0, Ctip=0, red_fact=red,
                           red_Dinv=red_dinv, V=None, W=None,
                           n=meta["n"], K=meta["K"], m=meta["m"],
                           b=meta["b"], k=meta["k"],
                           truncated=meta["truncated"])

    treedef = jax.tree_util.tree_structure(template())
    if treedef.num_leaves != n_leaves:
        raise ValueError(
            f"{path}: factor layout mismatch ({treedef.num_leaves} vs "
            f"{n_leaves} leaves; stored with store_spikes or different "
            f"variant?)")
    return jax.tree_util.tree_unflatten(treedef, leaves)
