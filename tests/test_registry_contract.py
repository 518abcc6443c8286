"""Registry-resolution contract for rearrange configs (VERDICT r2 #3).

Reference semantics (habitat-lab/habitat/core/embodied_task.py:275-292):
declared ``lab_sensors``/``measurements`` ``type:`` strings resolve through
the registry and control EXACTLY what the env computes; unknown types fail
loudly at construction.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.config.default import get_config
from habitat_tpu.config.default import read_write
from habitat_tpu.config.omega import Config
from habitat_tpu.core.construct import rearrange_env_from_config


@pytest.fixture()
def pick_cfg():
    # function-scoped: several tests mutate the config under read_write
    return get_config("benchmark/rearrange/skills/pick.yaml")


def test_declared_lists_control_env_output(pick_cfg):
    """The reference pick.yaml's declared sensor/measure lists become the
    env's exact obs/info key sets."""
    env = rearrange_env_from_config(pick_cfg, num_envs=2, with_visual=False)
    # pick.yaml declares exactly these lab sensors
    assert set(env.sensor_keys) == {
        "obj_start_sensor",
        "joint",
        "is_holding",
        "ee_pos",
        "relative_resting_position",
    }
    state, obs = env.reset(seed=0)
    assert set(obs) == set(env.sensor_keys)
    a = jnp.zeros((2, env.action_space.shape[0]), jnp.float32)
    state, obs2, rew, done, info = env.step(state, a)
    assert set(obs2) == set(env.sensor_keys)
    assert set(info) == set(env.measure_keys)
    # the declared measurement types are all present under reference uuids
    for k in (
        "articulated_agent_force",
        "robot_collisions",
        "force_terminate",
        "ee_to_rest_distance",
        "ee_to_object_distance",
        "did_pick_object",
        "pick_success",
        "pick_reward",
        "did_violate_hold_constraint",
        "num_steps",
    ):
        assert k in info, k


def test_pruned_sensor_list(pick_cfg):
    """Removing a declared sensor removes it from the obs dict."""
    with read_write(pick_cfg) as cfg:
        del cfg.habitat.task.lab_sensors["joint_sensor"]
        env = rearrange_env_from_config(cfg, num_envs=2, with_visual=False)
    assert "joint" not in env.sensor_keys
    state, obs = env.reset(seed=0)
    assert "joint" not in obs
    assert "is_holding" in obs


def test_unknown_sensor_type_raises(pick_cfg):
    with read_write(pick_cfg) as cfg:
        cfg.habitat.task.lab_sensors["bogus"] = Config(
            {"type": "NoSuchSensor"}
        )
        with pytest.raises(KeyError, match="NoSuchSensor"):
            rearrange_env_from_config(cfg, num_envs=2, with_visual=False)


def test_unknown_measure_type_raises(pick_cfg):
    with read_write(pick_cfg) as cfg:
        cfg.habitat.task.measurements["bogus"] = Config(
            {"type": "NoSuchMeasure"}
        )
        with pytest.raises(KeyError, match="NoSuchMeasure"):
            rearrange_env_from_config(cfg, num_envs=2, with_visual=False)


def test_unsupported_measure_for_task_raises(pick_cfg):
    """A registered type the env can't provide (PlaceSuccess on a pick
    task) raises at construction, not silently no-ops."""
    with read_write(pick_cfg) as cfg:
        cfg.habitat.task.measurements["pl"] = Config({"type": "PlaceSuccess"})
        with pytest.raises(ValueError, match="place_success"):
            rearrange_env_from_config(cfg, num_envs=2, with_visual=False)


def test_new_sensor_implementations(pick_cfg):
    """Round-3 sensors: gps-compass pair, localization, joint_vel flow
    through declaration to obs values."""
    with read_write(pick_cfg) as cfg:
        cfg.habitat.task.lab_sensors["sgps"] = Config(
            {"type": "TargetStartGpsCompassSensor"}
        )
        cfg.habitat.task.lab_sensors["ggps"] = Config(
            {"type": "TargetGoalGpsCompassSensor"}
        )
        cfg.habitat.task.lab_sensors["loc"] = Config(
            {"type": "LocalizationSensor"}
        )
        cfg.habitat.task.lab_sensors["jv"] = Config(
            {"type": "JointVelocitySensor"}
        )
        env = rearrange_env_from_config(cfg, num_envs=2, with_visual=False)
    state, obs = env.reset(seed=0)
    assert obs["obj_start_gps_compass"].shape == (2, 2)
    assert obs["obj_goal_gps_compass"].shape == (2, 2)
    assert obs["localization_sensor"].shape == (2, 4)
    # localization = [pos, yaw]
    np.testing.assert_allclose(
        np.asarray(obs["localization_sensor"][:, :3]),
        np.asarray(state.pos),
        atol=1e-6,
    )
    # gps rho matches the planar distance of the relative start sensor
    rel = np.asarray(obs["obj_start_sensor"])
    rho = np.linalg.norm(rel[:, [0, 2]], axis=-1)
    np.testing.assert_allclose(
        np.asarray(obs["obj_start_gps_compass"][:, 0]), rho, atol=1e-5
    )
    assert obs["joint_vel"].shape[1] == env.n_joints
