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
