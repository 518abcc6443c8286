"""Arm control in rearrangement: FK-driven EE, live joint sensor,
ArmRelPos/ArmEE action modes, EE-gated grasping.

Reference parity targets: tasks/rearrange/actions/actions.py:102-316 (ArmAction
composite, ArmRelPosAction), :738 (ArmEEAction); rearrange_sensors.py:51
(JointSensor), RelativeRestingPositionSensor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.articulated_agents import kinematics as kin
from habitat_tpu.articulated_agents.params import ROBOTS
from habitat_tpu.tasks.rearrange.generator import make_rearrange_env


@pytest.fixture(scope="module")
def arm_env():
    return make_rearrange_env(
        num_envs=4, task="pick", with_visual=False, control="arm", seed=3
    )


def test_joint_sensor_is_live(arm_env):
    state, obs = arm_env.reset_fn(jax.random.PRNGKey(0))
    assert obs["joint"].shape == (4, 7)
    # resting pose, not zeros (the round-1 joint sensor returned zeros)
    np.testing.assert_allclose(
        np.asarray(obs["joint"][0]), ROBOTS["FetchRobot"].resting_pose, atol=1e-6
    )


def test_arm_rel_pos_action_moves_joints_and_ee(arm_env):
    state, obs = arm_env.reset_fn(jax.random.PRNGKey(0))
    a = jnp.zeros((4, 10), jnp.float32).at[:, 1].set(-1.0)  # shoulder joint
    state2, obs2, _, _, _ = arm_env.step_fn(state, a)
    dj = np.asarray(obs2["joint"] - obs["joint"])
    assert abs(dj[0, 1] + arm_env.max_joint_delta) < 1e-5
    assert np.all(np.abs(dj[:, [0, 2, 3, 4, 5, 6]]) < 1e-6)
    # EE follows FK
    assert np.linalg.norm(np.asarray(obs2["ee_pos"] - obs["ee_pos"])) > 1e-3


def test_joint_limits_clamped(arm_env):
    state, obs = arm_env.reset_fn(jax.random.PRNGKey(0))
    a = jnp.zeros((4, 10), jnp.float32).at[:, 0].set(1.0)
    hi = ROBOTS["FetchRobot"].joint_limits_upper[0]
    for _ in range(40):
        state, obs, _, _, _ = arm_env.step_fn(state, a)
    assert float(obs["joint"][0, 0]) <= hi + 1e-5


def test_ee_matches_fk(arm_env):
    state, obs = arm_env.reset_fn(jax.random.PRNGKey(0))
    p = ROBOTS["FetchRobot"]
    ee_local = kin.ee_position(p, state.joints[0]) + jnp.asarray(p.arm_root_offset)
    # obs ee_pos is in the agent frame = local FK position
    np.testing.assert_allclose(
        np.asarray(obs["ee_pos"][0]), np.asarray(ee_local), atol=1e-4
    )


def test_relative_resting_zero_at_reset(arm_env):
    _, obs = arm_env.reset_fn(jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(obs["relative_resting_position"]), 0.0, atol=1e-4
    )


def test_arm_ee_ik_mode():
    env = make_rearrange_env(
        num_envs=2, task="pick", with_visual=False, control="arm_ee", seed=3
    )
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    a = jnp.zeros((2, 6), jnp.float32).at[:, 1].set(1.0)  # EE up
    state2, obs2, _, _, _ = env.step_fn(state, a)
    dy = float(obs2["ee_pos"][0, 1] - obs["ee_pos"][0, 1])
    # IK should realize most of the commanded 0.06 m displacement
    assert 0.03 < dy <= env.ee_delta + 1e-4
    # joints changed to achieve it
    assert np.linalg.norm(np.asarray(obs2["joint"] - obs["joint"])) > 1e-3


def test_grasp_gated_on_real_ee_distance(arm_env):
    state, obs = arm_env.reset_fn(jax.random.PRNGKey(0))
    # grip with the EE far from any object: no grasp
    ee = arm_env._ee_pos(state)
    objs = arm_env._obj_world(state)
    d = np.linalg.norm(np.asarray(objs - ee[:, None, :]), axis=-1).min(axis=1)
    a = jnp.zeros((4, 10), jnp.float32).at[:, 7].set(1.0)  # grip only
    state2, obs2, _, _, _ = arm_env.step_fn(state, a)
    held = np.asarray(state2.held)
    far = d > arm_env.grasp_distance
    assert np.all(held[far] == -1)


def test_suction_release_on_grip_drop():
    env = make_rearrange_env(
        num_envs=2, task="empty", with_visual=False, control="arm",
        arm_grasp_distance=100.0, seed=3,  # huge grasp radius -> always grabs
    )
    state, _ = env.reset_fn(jax.random.PRNGKey(0))
    grip_on = jnp.zeros((2, 10), jnp.float32).at[:, 7].set(1.0)
    state, *_ = env.step_fn(state, grip_on)
    assert np.all(np.asarray(state.held) >= 0)
    grip_off = jnp.zeros((2, 10), jnp.float32).at[:, 7].set(-1.0)
    state, *_ = env.step_fn(state, grip_off)
    assert np.all(np.asarray(state.held) == -1)


def test_arm_renders_in_dynamic_pass():
    env = make_rearrange_env(
        num_envs=2, task="pick", with_visual=True, render_size=(32, 32),
        control="arm", seed=3,
    )
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    dyn = env._dynamic_geometry(state)
    # arm link triangles appended after object/art boxes
    n_obj_art = (env.num_objects + env.table.art_pos.shape[1]) * 12
    assert dyn["v0"].shape[1] == n_obj_art + env.n_joints * 12
    assert obs["robot_head_depth"].shape == (2, 32, 32, 1)


def test_config_maps_arm_action_to_arm_control():
    from habitat_tpu.config.default import get_config
    from habitat_tpu.core.construct import env_from_config

    cfg = get_config("benchmark/rearrange/skills/pick.yaml")
    env = env_from_config(cfg, num_envs=2)
    assert env.control in ("arm", "arm_ee")
    assert env.action_space.shape[0] >= env.n_joints + 3
