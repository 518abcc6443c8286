"""Multi-agent / population-play machinery.

Counterpart of reference habitat-baselines/habitat_baselines/rl/multi_agent/:
MultiAgentAccessMgr (multi_agent_access_mgr.py:35 — population sampling
:36-44), MultiPolicy/MultiStorage/MultiUpdater splitters (pop_play_wrappers.py)
and the self-play wrappers.

TPU-native population play: the population is ONE stacked pytree of K
parameter sets in HBM. Sampling an opponent per env lane is a gather over the
stacked leaves, and a policy forward for a mixed batch is `vmap` over the
per-lane parameters — no process pools, no parameter server. The scripted
humanoid in tasks/rearrange/social_nav.py is the round-1 opponent; frozen
policy opponents plug in through `apply_population`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def stack_params(param_sets: Sequence[Any]) -> Any:
    """K pytrees -> one pytree with a leading population axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_sets)


def select_params(stacked: Any, idx: jnp.ndarray) -> Any:
    """Gather parameter set(s) by index: scalar idx -> single pytree,
    (N,) idx -> per-lane stacked pytree (for vmapped apply)."""
    return jax.tree.map(lambda x: x[idx], stacked)


def population_size(stacked: Any) -> int:
    return int(jax.tree.leaves(stacked)[0].shape[0])


def apply_population(policy_apply: Callable, stacked: Any, lane_idx: jnp.ndarray, *args):
    """Run a policy forward where each env lane uses its own parameter set
    (reference MultiPolicy splits the batch across agent policies; here it is
    one vmapped call)."""
    per_lane = select_params(stacked, lane_idx)  # leaves (N, ...)
    return jax.vmap(policy_apply)(per_lane, *args)


@dataclasses.dataclass
class AgentSpec:
    name: str
    learner: bool = True


class MultiAgentAccessMgr:
    """Uniform access over (policy, storage, updater) per agent type
    (reference multi_agent_access_mgr.py:35): one learning agent + a frozen
    opponent population refreshed from checkpoints of the learner
    (population play / fictitious self-play)."""

    def __init__(
        self,
        agents: Sequence[AgentSpec],
        num_pool_agents_per_type: Sequence[int] = (1, 1),
        seed: int = 0,
    ):
        self.agents = list(agents)
        self.num_pool = list(num_pool_agents_per_type)
        self._rng = np.random.default_rng(seed)
        self._population: List[Any] = []
        self._stacked: Optional[Any] = None

    @property
    def nagents(self) -> int:
        return len(self.agents)

    # -- population maintenance (reference :36-44 sampling) ---------------
    def push_snapshot(self, params: Any, max_size: int = 8) -> None:
        """Add a frozen copy of the learner to the opponent pool."""
        self._population.append(jax.tree.map(jnp.asarray, params))
        if len(self._population) > max_size:
            self._population.pop(0)
        self._stacked = stack_params(self._population)

    @property
    def population(self) -> Optional[Any]:
        return self._stacked

    def sample_opponents(self, num_envs: int) -> np.ndarray:
        """Per-lane opponent indices for the next rollout."""
        assert self._population, "push_snapshot first"
        return self._rng.integers(0, len(self._population), size=num_envs)

    def on_update_done(self, update_idx: int, params: Any, snapshot_every: int = 50):
        if update_idx % snapshot_every == 0:
            self.push_snapshot(params)


class SelfPlayWrapper:
    """Both sides share the learner's parameters (reference
    self_play_wrappers.py)."""

    def __init__(self, access_mgr: MultiAgentAccessMgr):
        self.mgr = access_mgr

    def opponent_params(self, learner_params: Any, num_envs: int):
        idx = jnp.zeros((num_envs,), jnp.int32)
        return learner_params, idx
