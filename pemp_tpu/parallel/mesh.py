"""Device mesh + sharding helpers.

The reference trains on a single GPU (SURVEY §2.3: no distributed code).
Here data parallelism is first-class: a 1-D ``data`` mesh over all chips,
batch-dim sharded inputs, replicated params — XLA inserts the gradient
psum over ICI. The mesh helpers are also used by the eval fan-out (scales x
flip batched into the data axis).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Initialize JAX's multi-process runtime when launched under a cluster
    manager (Slurm / OpenMPI / TPU pod runtimes).

    Checks env vars only — ``jax.distributed.initialize()`` must run before
    the backend is touched, so no jax state may be queried here. A bare
    single-process launch (none of the markers, or world size 1) is left
    untouched. Call first thing in multi-host-capable entry points
    (tools/train.py, tools/valid.py, tools/valid_hr.py).
    """
    import os
    import sys

    n = (
        os.environ.get("SLURM_NTASKS")
        or os.environ.get("OMPI_COMM_WORLD_SIZE")
        or os.environ.get("PMI_SIZE")
    )
    explicit = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not explicit and (not n or int(n) <= 1):
        return
    try:
        jax.distributed.initialize()
    except Exception as e:  # noqa: BLE001 — degrade to single-process
        print(f"jax.distributed.initialize() failed: {e}", file=sys.stderr)


def make_mesh(n_data: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_data is None or n_data < 0:
        n_data = len(devices)
    devices = np.asarray(devices[:n_data])
    return Mesh(devices, axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in the batch pytree with its leading dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_train_step(train_step, mesh: Mesh):
    """jit the train step with state replicated and batch data-sharded."""
    state_sh = replicated(mesh)
    data_sh = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(state_sh, data_sh),
        out_shardings=(state_sh, state_sh, state_sh),
    )
