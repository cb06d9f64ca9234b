"""Device mesh + sharding helpers (SPMD data parallelism).

The reference is single-GPU (`torch.device("cuda:0")`,
train_tf_wi_inv.py:52) with no distributed backend; here data
parallelism is first-class: a 1-D `jax.sharding.Mesh` over all local
(or all global) devices, batches sharded over the 'data' axis, params
replicated. XLA/GSPMD inserts the gradient all-reduce over ICI.

For multi-host TPU pods call `jax.distributed.initialize()` before
`get_mesh(global_=True)`; each host then feeds its local shard of the
batch (see data.loader.ShardedLoader).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: int | None = None, global_: bool = False) -> Mesh:
    devs = jax.devices() if global_ else jax.local_devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch sharded along axis 0 of every leaf."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
