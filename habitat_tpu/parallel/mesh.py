"""Device mesh + sharding helpers (DD-PPO scale-out).

Replaces the reference's distributed plumbing (rl/ddppo/ddp_utils.py:
SLURM/torchrun rank discovery :247, TCPStore rendezvous :271-309, gatherv :365)
with the JAX SPMD model: one ``Mesh`` with a ``data`` axis over ICI (and hosts
over DCN via ``jax.distributed.initialize``); shardings are annotations and
XLA inserts the collectives. Straggler self-preemption (ppo_trainer.py:641-653)
has no equivalent — SPMD is lock-step.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (reference init_distrib_slurm, ddp_utils.py:271).

    With explicit args this forms the cluster directly (the form the
    2-process CPU test uses — gloo over localhost); with none, jax.distributed
    discovers peers from the SLURM/TPU-pod environment; plain single-host
    runs are a no-op. Exercised for real by tests/test_multihost.py: two
    processes x two CPU devices form one 4-device global mesh and run a
    sharded DD-PPO train step whose gradient reduction crosses processes.
    """
    # NOTE: no jax.process_count()/jax.devices() guards before initialize —
    # those calls themselves initialise the XLA backend and make
    # jax.distributed.initialize a hard error afterwards
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    if "JAX_COORDINATOR_ADDRESS" in os.environ or "SLURM_JOB_NODELIST" in os.environ:
        try:
            jax.distributed.initialize()
        except Exception:  # already initialized or single-process
            pass


def rank0_only() -> bool:
    """reference ddp_utils.py:100."""
    return jax.process_index() == 0


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, ndim: int, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (env/batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_pytree(tree, mesh: Mesh, batch_size: int, axis: str = DATA_AXIS):
    """Place a batched-env pytree: leaves whose leading dim == batch_size are
    sharded over ``axis``; everything else (rng keys, scalars) replicated."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == batch_size:
            return jax.device_put(x, data_sharding(mesh, x.ndim, axis))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(place, tree)


def replicate_pytree(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)


def replicate_global(tree, mesh: Mesh):
    """Multi-host replicate: every process holds the same host value (same
    seed/derivation) and contributes it as one fully-replicated global
    array (device_put cannot target non-addressable devices)."""
    import numpy as np_

    def place(x):
        arr = np_.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, replicated(mesh), lambda idx: arr[idx]
        )

    return jax.tree.map(place, tree)


def global_env_pytree(tree, mesh: Mesh, batch_size: int, axis: str = DATA_AXIS):
    """Multi-host variant of shard_env_pytree: every process holds the SAME
    full host arrays (deterministic construction from the shared seed — the
    reference instead scatters through TCPStore, ddp_utils.py:365) and each
    contributes its addressable shards via make_array_from_callback, yielding
    one global array per leaf across all processes."""
    import numpy as np_

    def place(x):
        arr = np_.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] == batch_size:
            sh = data_sharding(mesh, arr.ndim, axis)
        else:
            sh = replicated(mesh)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    return jax.tree.map(place, tree)
