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


def init_distributed() -> None:
    """Multi-host init (reference init_distrib_slurm, ddp_utils.py:271).

    On SLURM/TPU pods jax.distributed discovers peers from the environment;
    single-host runs are a no-op.
    """
    if jax.process_count() > 1:
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
