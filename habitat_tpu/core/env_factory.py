"""Convenience constructors wiring scenes + episodes + task into a BatchedEnv.

Counterpart of the reference's env factory (habitat-baselines/habitat_baselines/
common/habitat_env_factory.py:18-120 construct_envs: scene-split round-robin
over workers) — here "workers" are lanes of one batched env, and the scene
split becomes the per-env episode-order table.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from habitat_tpu.core.batched_env import BatchedEnv, RewardSpec
from habitat_tpu.core.dataset import (
    NavigationEpisode,
    build_env_episode_order,
    build_episode_table,
)
from habitat_tpu.core.registry import registry
from habitat_tpu.sims.scene import SceneData, pack_scenes


DEFAULT_NAV_ACTIONS = (
    "StopAction",
    "MoveForwardAction",
    "TurnLeftAction",
    "TurnRightAction",
)


def make_nav_env(
    scenes: Sequence[SceneData],
    episodes: Sequence[NavigationEpisode],
    num_envs: int,
    *,
    sensor_specs: Sequence = (("PointGoalWithGPSCompassSensor", None),),
    measure_specs: Sequence = (
        ("DistanceToGoal", None),
        ("Success", None),
        ("SPL", None),
        ("SoftSPL", None),
        ("Collisions", None),
        ("DistanceToGoalReward", None),
        ("NumSteps", None),
    ),
    action_names: Sequence[str] = DEFAULT_NAV_ACTIONS,
    action_config=None,
    max_episode_steps: int = 500,
    reward_spec: RewardSpec = RewardSpec(),
    precomputed_fields: Optional[Dict[str, np.ndarray]] = None,
    seed: int = 0,
    goal_image_size: Optional[int] = None,
) -> BatchedEnv:
    """Build a batched PointNav-style env from host scenes + episodes."""
    scene_index = {s.scene_id: i for i, s in enumerate(scenes)}
    scene_map = {s.scene_id: s for s in scenes}
    pack = pack_scenes(list(scenes))
    table = build_episode_table(
        list(episodes),
        scene_map,
        scene_index,
        precomputed_fields=precomputed_fields,
        goal_image_size=goal_image_size,
    )
    order = build_env_episode_order(list(episodes), num_envs, seed=seed)

    sensors = [registry.get_sensor(name)(cfg) for name, cfg in sensor_specs]
    measures = [registry.get_measure(name)(cfg) for name, cfg in measure_specs]
    actions = [registry.get_task_action(name)(action_config) for name in action_names]

    return BatchedEnv(
        pack,
        table,
        order,
        sensors,
        measures,
        actions,
        max_episode_steps=max_episode_steps,
        reward_spec=reward_spec,
    )
