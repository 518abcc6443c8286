"""Reference-layout asset fixture flows end-to-end (VERDICT r4 #7).

tests/assets/mini_dataset/ is habitat's EXACT on-disk dataset layout —
`mini.scene_dataset_config.json` + `stages/mini_room_0.glb` + PointNav-v1
episodes `pointnav/v1/val/val.json.gz` whose scene_ids reference the stage
(reference datasets/pointnav/pointnav_dataset.py:30-80 episode schema;
habitat_simulator.py:299-331 scene_dataset resolution). The test loads it
through PointNavDatasetV1 (NOT the procedural generator), resolves scene
ids through the dataset config, packs, builds the batched nav env, and
trains a step of metrics out of it."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


ROOT = os.path.join(os.path.dirname(__file__), "assets", "mini_dataset")


def test_pointnav_v1_dataset_through_scene_dataset_config():
    from habitat_tpu.datasets.pointnav import PointNavDatasetV1
    from habitat_tpu.sims.loaders import load_scene, resolve_scene_dataset
    from habitat_tpu.core.env_factory import make_nav_env

    class Cfg:
        data_path = os.path.join(ROOT, "pointnav", "v1", "{split}", "val.json.gz")
        split = "val"
        content_scenes = ["*"]

    ds = PointNavDatasetV1(Cfg())
    assert len(ds.episodes) == 8
    ep = ds.episodes[0]
    assert ep.scene_id.endswith("mini_room_0.glb")
    assert len(ep.start_rotation) == 4  # reference [x,y,z,w] quaternion

    # resolve every scene id through the scene_dataset_config (reference
    # habitat.simulator.scene_dataset semantics), then load the real GLBs
    cfg_path = os.path.join(ROOT, "mini.scene_dataset_config.json")
    scene_paths = sorted({resolve_scene_dataset(cfg_path, e.scene_id) for e in ds.episodes})
    assert len(scene_paths) == 1 and scene_paths[0].endswith(".glb")
    scene = load_scene(scene_paths[0])
    assert scene.num_triangles > 50

    # scene_id must match the episodes' ids for the table builder
    scene.scene_id = ds.episodes[0].scene_id
    for e in ds.episodes:
        e.scene_id = scene.scene_id

    env = make_nav_env(
        [scene], ds.episodes, num_envs=4, max_episode_steps=50,
        sensor_specs=(
            ("PointGoalWithGPSCompassSensor", None),
            ("HabitatSimDepthSensor", {"height": 32, "width": 32}),
        ),
    )
    state, obs = env.reset_fn(jax.random.PRNGKey(0), env.env_data)
    assert obs["pointgoal_with_gps_compass"].shape == (4, 2)
    assert obs["depth"].shape == (4, 32, 32, 1)
    assert np.isfinite(np.asarray(obs["depth"])).all()
    # a real wall must appear in depth (not all max-range)
    assert float(jnp.min(obs["depth"])) < 0.9
    a = jnp.ones((4,), jnp.int32)  # forward
    for _ in range(5):
        state, obs, r, d, info = env.step_fn(state, a, env.env_data)
    assert "spl" in info and "distance_to_goal" in info
    assert np.isfinite(np.asarray(info["distance_to_goal"])).all()
