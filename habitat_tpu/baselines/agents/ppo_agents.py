"""Deployable PPO agent (reference habitat-baselines/habitat_baselines/agents/
ppo_agents.py:42): loads a trained checkpoint and acts one observation at a
time behind the Agent ABC — for Benchmark/Challenge evaluation."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from habitat_tpu.core.agent import Agent
from habitat_tpu.models.policy import make_pointnav_resnet_policy, sample_action
from habitat_tpu.models.rnn_state_encoder import initial_hidden_state


class PPOAgent(Agent):
    def __init__(
        self,
        params: Any = None,
        *,
        num_actions: int = 4,
        backbone: str = "resnet18",
        hidden_size: int = 512,
        goal_sensor_uuid: str = "pointgoal_with_gps_compass",
        deterministic: bool = False,
        seed: int = 0,
    ):
        self.policy = make_pointnav_resnet_policy(
            num_actions,
            backbone=backbone,
            hidden_size=hidden_size,
            goal_keys=(goal_sensor_uuid,),
        )
        self.hidden_size = hidden_size
        self.params = params
        self.deterministic = deterministic
        self._key = jax.random.PRNGKey(seed)
        self._act = jax.jit(self._act_fn)
        self.reset()

    def _act_fn(self, params, obs, hidden, prev_action, mask, key):
        logits, _, new_hidden = self.policy.apply(params, obs, hidden, prev_action, mask)
        action, _ = sample_action(logits, key, deterministic=self.deterministic)
        return action, new_hidden

    def reset(self) -> None:
        self.hidden = initial_hidden_state(1, self.hidden_size, 1, "LSTM")
        self.prev_action = jnp.zeros((1,), jnp.int32)
        self.mask = jnp.zeros((1,), jnp.float32)

    def load_checkpoint(self, folder: str, name: str = "latest") -> None:
        import orbax.checkpoint as ocp
        import os

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.join(os.path.abspath(folder), name))
        # TrainState tuple: params is field 0
        self.params = restored[0] if isinstance(restored, (list, tuple)) else restored["params"]

    def act(self, observations: Dict[str, np.ndarray]):
        assert self.params is not None, "load_checkpoint or pass params first"
        obs = {k: jnp.asarray(v)[None] for k, v in observations.items()}
        self._key, k = jax.random.split(self._key)
        action, self.hidden = self._act(
            self.params, obs, self.hidden, self.prev_action, self.mask, k
        )
        self.prev_action = action
        self.mask = jnp.ones((1,), jnp.float32)
        return int(action[0])
