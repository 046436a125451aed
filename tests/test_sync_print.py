"""Rank-ordered collective printing (utils.sync_print) — the analogue of
PetscSynchronizedPrintf/Flush (/root/reference/src/wbm.c:294)."""

import jax
import jax.numpy as jnp
import numpy as np

from spike_petsc_tpu.parallel import make_mesh
from spike_petsc_tpu.utils.sync_print import sync_print


def test_sync_print_rank_order(capfd):
    mesh = make_mesh(8, axis="p")
    x = jax.device_put(
        jnp.arange(8.0) * 10.0,
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("p")))

    def local(xl):
        sync_print("value = {:.1f}", xl[0], axis="p")
        return xl * 2

    y = jax.shard_map(local, mesh=mesh,
                      in_specs=jax.sharding.PartitionSpec("p"),
                      out_specs=jax.sharding.PartitionSpec("p"))(x)
    jax.block_until_ready(y)
    jax.effects_barrier()
    out = capfd.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith("[")]
    assert len(lines) == 8, out
    for r, ln in enumerate(lines):
        assert ln.startswith(f"[{r}] value = {r * 10.0:.1f}"), out


def test_sync_print_no_args(capfd):
    mesh = make_mesh(8, axis="p")
    x = jax.device_put(
        jnp.ones(8), jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("p")))

    def local(xl):
        sync_print("here", axis="p")
        return xl

    jax.block_until_ready(jax.shard_map(
        local, mesh=mesh, in_specs=jax.sharding.PartitionSpec("p"),
        out_specs=jax.sharding.PartitionSpec("p"))(x))
    jax.effects_barrier()
    out = capfd.readouterr().out
    assert out.count("here") == 8
