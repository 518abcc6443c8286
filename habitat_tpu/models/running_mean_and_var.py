"""Running mean/variance normalizer (reference habitat-baselines/
habitat_baselines/rl/ddppo/policy/running_mean_and_var.py: per-channel
statistics updated during training and DDP-all_reduced across workers).

Functional: the statistics are a small pytree carried in the train state;
``update`` uses Chan's parallel-variance merge. Under a data mesh the batch
moments are computed over the GLOBAL batch by jnp.mean on sharded arrays —
the all-reduce the reference does explicitly falls out of sharding
propagation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RunningStats(NamedTuple):
    mean: jnp.ndarray  # (C,)
    var: jnp.ndarray  # (C,)
    count: jnp.ndarray  # scalar


def init_running_stats(num_channels: int) -> RunningStats:
    return RunningStats(
        mean=jnp.zeros((num_channels,), jnp.float32),
        var=jnp.ones((num_channels,), jnp.float32),
        count=jnp.asarray(1e-4, jnp.float32),
    )


def update_running_stats(stats: RunningStats, x: jnp.ndarray) -> RunningStats:
    """x: (..., C) batch; reduces over all leading axes (Chan's merge)."""
    axes = tuple(range(x.ndim - 1))
    b_mean = jnp.mean(x, axis=axes)
    b_var = jnp.var(x, axis=axes)
    b_count = jnp.asarray(x.size / x.shape[-1], jnp.float32)

    delta = b_mean - stats.mean
    tot = stats.count + b_count
    new_mean = stats.mean + delta * (b_count / tot)
    m_a = stats.var * stats.count
    m_b = b_var * b_count
    m2 = m_a + m_b + delta**2 * (stats.count * b_count / tot)
    return RunningStats(mean=new_mean, var=m2 / tot, count=tot)


def normalize(stats: RunningStats, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    return (x - stats.mean) / jnp.sqrt(stats.var + eps)
