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


def _describe_tri_factor(f) -> dict:
    """Structural descriptor of a per-partition factorization (enough to
    rebuild a skeleton pytree with the same treedef)."""
    from ..ops.cyclic import CRFactor
    if isinstance(f, CRFactor):
        return dict(type="cr", levels=len(f.levels), nb=f.nb, n_pad=f.n_pad,
                    nshift=f.nshift is not None)
    return dict(type="blocktri", method=f.method,
                nshift=f.nshift is not None)


def _tri_factor_template(desc: dict):
    nshift = 0 if desc.get("nshift") else None
    if desc["type"] == "cr":
        from ..ops.cyclic import CRFactor, CRLevel
        lv = CRLevel(Dinv_e=0, P=0, Q=0, L_e=0, U_e=0)
        return CRFactor(levels=tuple(lv for _ in range(desc["levels"])),
                        root_Dinv=0, nb=desc["nb"], n_pad=desc["n_pad"],
                        nshift=nshift)
    from ..ops.blocktri import BlockTriFactor
    return BlockTriFactor(F=0, U=0, Sinv=0, Slu=0, piv=0,
                          method=desc["method"], nshift=nshift)


def save_factorization(path: str, sf) -> None:
    """Checkpoint a SpikeFactor (pytree -> npz): amortize setup across runs —
    a capability the reference lacks entirely (SURVEY.md §5 checkpoint/resume:
    'none').  Every spike_factor variant round-trips: block-Thomas (inv/lu)
    and cyclic-reduction partition factors, Thomas/CR/truncated reduced
    systems, with or without stored spikes."""
    import json

    import jax

    leaves, treedef = jax.tree_util.tree_flatten(sf)
    arrays, exotic = {}, {}
    for i, x in enumerate(leaves):
        a = np.asarray(x)
        if a.dtype.kind not in "fiub?c":
            # ml_dtypes types (bfloat16, fp8, ...) are void dtypes to npz:
            # store the raw bits and the dtype name for the loader
            exotic[str(i)] = a.dtype.name
            a = a.view(np.dtype(f"u{a.dtype.itemsize}"))
        arrays[f"leaf_{i}"] = a
    meta = dict(n=sf.n, K=sf.K, m=sf.m, b=sf.b, k=sf.k,
                truncated=sf.truncated,
                fact=_describe_tri_factor(sf.fact),
                red_fact=(None if sf.red_fact is None
                          else _describe_tri_factor(sf.red_fact)),
                has_red_dinv=sf.red_Dinv is not None,
                has_spikes=sf.V is not None,
                has_lb=sf.Lb is not None,
                exotic_dtypes=exotic)
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
    exotic = meta.get("exotic_dtypes", {})

    def leaf(i):
        a = z[f"leaf_{i}"]
        if str(i) in exotic:
            import ml_dtypes
            a = a.view(np.dtype(getattr(ml_dtypes, exotic[str(i)])))
        return jnp.asarray(a)

    leaves = [leaf(i) for i in range(n_leaves)]

    if "fact" not in meta:
        # legacy (round-1) checkpoint: block-Thomas factors, reduced system
        # type inferred from K/truncated
        meta["fact"] = dict(type="blocktri", method=meta["method"])
        meta["red_fact"] = (meta["fact"]
                            if meta["K"] > 1 and not meta["truncated"]
                            else None)
        meta["has_red_dinv"] = meta["K"] > 1 and meta["truncated"]
        meta["has_spikes"] = False

    def template():
        fact = _tri_factor_template(meta["fact"])
        red = (None if meta["red_fact"] is None
               else _tri_factor_template(meta["red_fact"]))
        red_dinv = 0 if meta["has_red_dinv"] else None
        spike = 0 if meta["has_spikes"] else None
        lb = 0 if meta.get("has_lb") else None   # pre-store_lt checkpoints
        return SpikeFactor(fact=fact, Btip=0, Ctip=0, red_fact=red,
                           red_Dinv=red_dinv, V=spike, W=spike,
                           n=meta["n"], K=meta["K"], m=meta["m"],
                           b=meta["b"], k=meta["k"],
                           truncated=meta["truncated"], Lb=lb)

    treedef = jax.tree_util.tree_structure(template())
    if treedef.num_leaves != n_leaves:
        raise ValueError(
            f"{path}: factor layout mismatch ({treedef.num_leaves} vs "
            f"{n_leaves} leaves; checkpoint from an incompatible version?)")
    return jax.tree_util.tree_unflatten(treedef, leaves)
