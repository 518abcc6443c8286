"""Registered env classes (reference habitat-lab/habitat/core/environments.py).

``RLTaskEnv`` semantics (:42-97: reward = slack + reward_measure
(+ success_reward), done on episode_over or end_on_success&success) are
implemented inside the batched engine (core/batched_env.py RewardSpec); the
class here is the host-facing registered wrapper.
"""

from __future__ import annotations

from typing import Optional

from habitat_tpu.core.dataset import Dataset
from habitat_tpu.core.env import RLEnv
from habitat_tpu.core.registry import registry


def get_env_class(env_name: str):
    """reference environments.py:25 get_env_class."""
    return registry.get_env(env_name)


@registry.register_env(name="RLTaskEnv")
class RLTaskEnv(RLEnv):
    pass


@registry.register_env(name="GymRegistryEnv")
class GymRegistryEnv:
    """Wrapper for envs registered in the gymnasium registry
    (reference environments.py:100)."""

    def __init__(self, config, dataset: Optional[Dataset] = None):
        import gymnasium as gym

        for dependency in config.habitat.get("env_task_gym_dependencies", []):
            __import__(dependency)
        self._env = gym.make(config.habitat.env_task_gym_id)
        self.observation_space = self._env.observation_space
        self.action_space = self._env.action_space

    def reset(self, **kw):
        out = self._env.reset(**kw)
        return out[0] if isinstance(out, tuple) else out

    def step(self, action):
        obs, reward, terminated, truncated, info = self._env.step(action)
        return obs, reward, terminated or truncated, info

    def close(self):
        self._env.close()


@registry.register_env(name="GymHabitatEnv")
class GymHabitatEnv(RLTaskEnv):
    """Habitat RL env behind the gym API (reference environments.py:117);
    flattening of dict action spaces happens in habitat_tpu.gym.gym_wrapper."""
