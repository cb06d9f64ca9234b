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
SEQ_AXIS = "seq"


def get_mesh(n_devices: int | None = None, global_: bool = False,
             n_seq: int = 1) -> Mesh:
    """1-D data mesh, or a 2-D (data, seq) mesh when n_seq > 1.

    The 'seq' axis carries sequence parallelism for the dual-path RNN
    models (BSRNN): bands are sharded during the time-direction LSTM and
    time frames during the band-direction LSTM — both are pure batch
    axes for the respective scan — and GSPMD inserts the all-to-all at
    the transposition between the two (models/bsrnn.py sp_axis).
    Devices along 'seq' are mesh-minor so the all-to-all rides
    nearest-neighbour ICI links.
    """
    if global_:
        devs = list(jax.devices())
        if n_devices is not None and n_devices < len(devs):
            # take an equal share from EVERY process: a flat [:n] would
            # drop whole hosts, whose local data could then never be
            # addressed by make_array_from_process_local_data
            n_proc = jax.process_count()
            if n_devices % n_proc:
                raise ValueError(
                    f"global mesh size {n_devices} must be divisible by "
                    f"{n_proc} processes")
            per = n_devices // n_proc
            by_proc: dict[int, list] = {}
            for d in devs:
                by_proc.setdefault(d.process_index, []).append(d)
            devs = [d for p in sorted(by_proc) for d in by_proc[p][:per]]
    else:
        devs = list(jax.local_devices())
        if n_devices is not None:
            devs = devs[:n_devices]
    if n_seq > 1:
        if len(devs) % n_seq:
            raise ValueError(f"{len(devs)} devices not divisible by n_seq={n_seq}")
        return Mesh(np.array(devs).reshape(-1, n_seq), (DATA_AXIS, SEQ_AXIS))
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch sharded along axis 0 of every leaf."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
