"""ObjectNav / ImageNav / obs transforms / utils tests (mirrors reference
test_object_nav_task.py, test_instance_image_nav_task.py,
test_obs_transformers.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from habitat_tpu.config.default import get_config
from habitat_tpu.core.construct import env_from_config


def test_objectnav_env():
    cfg = get_config(
        "benchmark/nav/objectnav/objectnav_procgen.yaml",
        [
            "habitat.dataset.procedural.num_scenes=2",
            "habitat.dataset.procedural.episodes_per_scene=4",
            "habitat.simulator.agents.main_agent.sim_sensors.rgb_sensor.width=32",
            "habitat.simulator.agents.main_agent.sim_sensors.rgb_sensor.height=32",
            "habitat.simulator.agents.main_agent.sim_sensors.depth_sensor.width=32",
            "habitat.simulator.agents.main_agent.sim_sensors.depth_sensor.height=32",
            "habitat.simulator.agents.main_agent.sim_sensors.semantic_sensor.width=32",
            "habitat.simulator.agents.main_agent.sim_sensors.semantic_sensor.height=32",
        ],
    )
    assert cfg.habitat.task.type == "ObjectNav-v1"
    env = env_from_config(cfg, num_envs=2)
    assert "objectgoal" in env.observation_space.spaces
    assert "semantic" in env.observation_space.spaces
    # look_up/look_down present for objectnav (6 actions)
    assert env.action_space.n == 6
    state, obs = env.reset(seed=0)
    # goal category valid
    assert np.all(np.asarray(obs["objectgoal"]) >= 0)
    state, obs, r, d, info = env.step(state, [1, 2])
    assert "distance_to_goal" in info
    assert np.all(np.isfinite(np.asarray(info["distance_to_goal"])))
    # distance to view points should be reachable (< inf)
    assert np.all(np.asarray(info["distance_to_goal"]) < 1e5)


def test_imagenav_env():
    cfg = get_config(
        "benchmark/nav/imagenav/imagenav_procgen.yaml",
        [
            "habitat.dataset.procedural.num_scenes=2",
            "habitat.dataset.procedural.episodes_per_scene=3",
            "habitat.task.lab_sensors.imagegoal.width=32",
            "habitat.task.lab_sensors.imagegoal.height=32",
            "habitat.simulator.agents.main_agent.sim_sensors.rgb_sensor.width=32",
            "habitat.simulator.agents.main_agent.sim_sensors.rgb_sensor.height=32",
        ],
    )
    env = env_from_config(cfg, num_envs=2)
    state, obs = env.reset(seed=0)
    assert obs["imagegoal"].shape == (2, 32, 32, 3)
    assert obs["imagegoal"].dtype == jnp.uint8
    # goal image is constant within an episode
    g0 = np.asarray(obs["imagegoal"])
    state, obs, r, d, info = env.step(state, [1, 1])
    np.testing.assert_array_equal(np.asarray(obs["imagegoal"]), g0)
    # goal image differs from current rgb view (agent is at start, not goal)
    assert not np.array_equal(np.asarray(obs["imagegoal"]), np.asarray(obs["rgb"]))


def test_obs_transforms():
    from gymnasium import spaces
    from habitat_tpu.baselines.obs_transformers import (
        CenterCropper,
        ResizeShortestEdge,
        apply_obs_transforms_batch,
        apply_obs_transforms_obs_space,
    )

    obs_space = spaces.Dict(
        {
            "rgb": spaces.Box(0, 255, (64, 96, 3), np.uint8),
            "depth": spaces.Box(0, 1, (64, 96, 1), np.float32),
            "pointgoal_with_gps_compass": spaces.Box(-np.inf, np.inf, (2,), np.float32),
        }
    )
    tfs = [ResizeShortestEdge(size=32), CenterCropper(32, 32)]
    new_space = apply_obs_transforms_obs_space(obs_space, tfs)
    assert new_space["rgb"].shape == (32, 32, 3)
    assert new_space["depth"].shape == (32, 32, 1)
    assert new_space["pointgoal_with_gps_compass"].shape == (2,)

    obs = {
        "rgb": jnp.zeros((4, 64, 96, 3), jnp.uint8),
        "depth": jnp.zeros((4, 64, 96, 1), jnp.float32),
        "pointgoal_with_gps_compass": jnp.zeros((4, 2)),
    }
    out = apply_obs_transforms_batch(obs, tfs)
    assert out["rgb"].shape == (4, 32, 32, 3)
    assert out["rgb"].dtype == jnp.uint8
    assert out["depth"].shape == (4, 32, 32, 1)


def test_info_dict_and_common_utils():
    from habitat_tpu.utils.info_dict import extract_scalars_from_info
    from habitat_tpu.utils.common import batch_obs, get_num_actions
    from gymnasium import spaces

    info = {
        "spl": 0.5,
        "collisions": {"count": 3.0, "is_collision": True},
        "top_down_map": np.zeros((4, 4)),
    }
    scalars = extract_scalars_from_info(info)
    assert scalars["spl"] == 0.5
    assert scalars["collisions.count"] == 3.0
    assert "top_down_map" not in scalars

    obs = batch_obs([{"a": np.ones(3)}, {"a": np.zeros(3)}])
    assert obs["a"].shape == (2, 3)
    assert get_num_actions(spaces.Discrete(4)) == 4
    assert get_num_actions(spaces.Box(-1, 1, (5,))) == 5


def test_tensor_dict():
    from habitat_tpu.baselines.tensor_dict import TensorDict

    td = TensorDict.from_tree({"a": np.zeros((4, 3)), "b": {"c": np.ones((4, 2))}})
    sub = td[2]
    assert sub["a"].shape == (3,)
    td[1] = TensorDict.from_tree({"a": np.full(3, 7.0), "b": {"c": np.zeros(2)}})
    assert np.all(td["a"][1] == 7.0)
    mapped = td.map(lambda x: x * 2)
    assert np.all(mapped["b"]["c"][0] == 2.0)


def test_instance_image_nav_loader_schema():
    import json
    from habitat_tpu.datasets.image_nav import InstanceImageNavDatasetV1

    ds = InstanceImageNavDatasetV1()
    ds.from_json(
        json.dumps(
            {
                "goals": {
                    "scene1.glb_obj42": [
                        {
                            "position": [1, 0, 2],
                            "object_id": "obj42",
                            "object_category": "chair",
                            "image_goals": [
                                {
                                    "position": [1.5, 1.2, 2.5],
                                    "rotation": [0, 0.707, 0, 0.707],
                                    "hfov": 79.0,
                                }
                            ],
                        }
                    ]
                },
                "episodes": [
                    {
                        "episode_id": 0,
                        "scene_id": "scenes/scene1.glb",
                        "start_position": [0, 0, 0],
                        "start_rotation": [0, 0, 0, 1],
                        "object_category": "chair",
                        "goal_image_id": 0,
                        "goal_key": "scene1.glb_obj42",
                    }
                ],
            }
        )
    )
    assert len(ds.episodes) == 1
    ep = ds.episodes[0]
    assert ep.goals[0].object_category == "chair"
    assert ep.goals[0].image_goals[0].hfov == 79.0
