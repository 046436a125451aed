"""Dissect multilevel Fiedler wall-clock at bench scale (2-D Laplacian).

BENCH r5 interim: ordering_fiedler_ms = 219 s at n=1e6 with refine='auto'
(-> device on a TPU backend).  Suspects: (a) the device LOBPCG refiner's
BCOO matvec lowers to gather/scatter (~0.2 GB/s on TPU) and pays tunnel
dispatch per iteration; (b) host coarsening cost; (c) SciPy LOBPCG cost.

Times each phase separately:  PLATFORM=cpu|(default axon tpu)
  coarsen   — the heavy-edge chain alone
  host      — full multilevel with refine='host'
  device    — full multilevel with refine='device'   (slow: opt-in)

Run:  python experiments/lab_fiedler.py            # TPU backend
      VARIANTS=coarsen,host N=250000 python experiments/lab_fiedler.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    plat = os.environ.get("PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    from spike_petsc_tpu.models import problems
    from spike_petsc_tpu.ordering import fiedler as _fm
    import importlib
    F = importlib.import_module("spike_petsc_tpu.ordering.fiedler") \
        if not hasattr(_fm, "graph_laplacian") else _fm

    n = int(os.environ.get("N", 1_000_000))
    nx = int(np.sqrt(n))
    only = set((os.environ.get("VARIANTS") or "coarsen,host,device")
               .split(","))
    lap_csr = F.graph_laplacian(problems.laplacian_2d(nx, nx))
    print(f"n={nx*nx} nnz={lap_csr.nnz}", flush=True)

    if "coarsen" in only:
        import scipy.sparse as sp
        adj = -lap_csr.copy()
        adj.setdiag(0)
        adj.eliminate_zeros()
        adj.data = np.abs(adj.data)
        t0 = time.perf_counter()
        levels = [adj]
        per = []
        while levels[-1].shape[0] > 64 and len(levels) < 60:
            t1 = time.perf_counter()
            coarse, parent = F.heavy_edge_coarsen(levels[-1])
            per.append((levels[-1].shape[0], time.perf_counter() - t1))
            if coarse.shape[0] >= 0.95 * levels[-1].shape[0]:
                break
            levels.append(coarse)
        print(f"coarsen_total_s: {time.perf_counter() - t0:.2f} "
              f"({len(levels)} levels)", flush=True)
        print("  per-level (n, s):",
              [(p[0], round(p[1], 3)) for p in per[:6]], "...", flush=True)

    for mode in ("host", "device"):
        if mode not in only:
            continue
        t0 = time.perf_counter()
        vec, lam2 = F._fiedler_multilevel(lap_csr, tol=1e-8, seed=0,
                                          refine=mode)
        dt = time.perf_counter() - t0
        # ordering quality: bandwidth of the sorted-vector permutation
        perm = np.argsort(vec)
        where = np.zeros(nx * nx, dtype=np.int64)
        where[perm] = np.arange(nx * nx)
        coo = lap_csr.tocoo()
        bw = int(np.max(np.abs(where[coo.row] - where[coo.col])))
        print(f"{mode}_s: {dt:.2f}  lambda2={lam2:.3e}  perm_bandwidth={bw}",
              flush=True)


if __name__ == "__main__":
    main()
