"""Gym registrations (reference habitat/gym/gym_definitions.py:26-138).

``gym.make("Habitat-v0", cfg=...)``, plus named shorthand ids. Rearrange-task
ids are registered as the rearrange stack lands; unknown ids raise at make
time with a clear message.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Any, List, Optional

import gymnasium as gym

PRE_REGISTERED_GYM_TASKS = {
    "Nav": "benchmark/nav/pointnav/pointnav_procgen.yaml",
    "PointNav": "benchmark/nav/pointnav/pointnav_procgen.yaml",
}


def _get_env_name(cfg) -> Optional[str]:
    return cfg["habitat"].get("env_task", "GymHabitatEnv")


def make_gym_from_config(config, dataset=None) -> gym.Env:
    """Config -> gym env (reference gym_definitions.py:49)."""
    from habitat_tpu.core.environments import get_env_class
    from habitat_tpu.gym.gym_wrapper import HabGymWrapper

    env_class_name = _get_env_name(config)
    env_class = get_env_class(env_class_name)
    env = env_class(config, dataset)
    return HabGymWrapper(env)


def _make_habitat_gym_env(
    cfg_file_path: str, override_options: Optional[List[Any]] = None, **kwargs
) -> gym.Env:
    from habitat_tpu.config.default import get_config

    config = get_config(cfg_file_path, override_options or [])
    return make_gym_from_config(config)


def _try_register(id_name: str, entry_point, kwargs) -> None:
    if id_name in gym.registry:
        return
    gym.register(id=id_name, entry_point=entry_point, kwargs=kwargs)


_try_register(
    "Habitat-v0",
    "habitat_tpu.gym.gym_definitions:_make_habitat_gym_env",
    kwargs={},
)

for gym_template_handle, cfg_path in PRE_REGISTERED_GYM_TASKS.items():
    _try_register(
        f"Habitat{gym_template_handle}-v0",
        "habitat_tpu.gym.gym_definitions:_make_habitat_gym_env",
        kwargs={"cfg_file_path": cfg_path},
    )


class _RearrangeGymEnv(gym.Env):
    """Single-env gym adapter over RearrangeBatchedEnv (for the reference's
    named rearrange gym ids, gym_definitions.py:105-138)."""

    def __init__(self, task: str = "pick", **kwargs):
        from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

        self._env = make_rearrange_env(num_envs=1, task=task, **kwargs)
        self.action_space = self._env.action_space
        self.observation_space = self._env.observation_space
        self._state = None

    def reset(self, *, seed=None, options=None):
        self._state, obs = self._env.reset(seed=seed or 0)
        import numpy as _np

        return {k: _np.asarray(v[0]) for k, v in obs.items()}, {}

    def step(self, action):
        import numpy as _np

        self._state, obs, r, d, info = self._env.step(self._state, [int(action)])
        obs = {k: _np.asarray(v[0]) for k, v in obs.items()}
        info = {k: float(_np.asarray(v[0])) for k, v in info.items()}
        return obs, float(_np.asarray(r[0])), bool(_np.asarray(d[0])), False, info


def _make_rearrange_gym_env(task: str = "pick", **kwargs) -> gym.Env:
    return _RearrangeGymEnv(task=task, **kwargs)


for _name, _task in (
    ("HabitatPick-v0", "pick"),
    ("HabitatPlace-v0", "place"),
    ("HabitatRearrangeEmpty-v0", "empty"),
    ("HabitatRearrange-v0", "rearrange"),
):
    _try_register(
        _name,
        "habitat_tpu.gym.gym_definitions:_make_rearrange_gym_env",
        kwargs={"task": _task},
    )
