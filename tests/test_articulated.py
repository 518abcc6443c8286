"""Embodiment tests (reference test/test_robot_wrapper.py + test_humanoid.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from habitat_tpu.articulated_agents.kinematics import (
    ee_position,
    ee_position_world,
    ik_error,
    ik_solve,
)
from habitat_tpu.articulated_agents.manipulator import (
    FetchRobot,
    FrankaRobot,
    SpotRobot,
    StretchRobot,
    make_robot,
)
from habitat_tpu.articulated_agents.params import ROBOTS


@pytest.mark.parametrize("name", list(ROBOTS))
def test_robot_fk_runs(name):
    robot = make_robot(name)
    p = robot.ee_local_pos
    assert p.shape == (3,)
    assert np.all(np.isfinite(p))
    # moving a joint moves the EE
    q = robot.arm_joint_pos
    q[0] += 0.3
    robot.arm_joint_pos = q
    p2 = robot.ee_local_pos
    assert np.linalg.norm(p2 - p) > 1e-4


def test_joint_limits_enforced():
    robot = FetchRobot()
    robot.arm_joint_pos = np.full(7, 100.0)
    assert np.all(robot.arm_joint_pos <= np.asarray(robot.params.joint_limits_upper) + 1e-6)


def test_ik_reaches_reachable_target():
    robot = FetchRobot()
    params = robot.params
    # pick a reachable target: FK of a random valid joint config
    rng = np.random.default_rng(0)
    lo = np.asarray(params.joint_limits_lower)
    hi = np.asarray(params.joint_limits_upper)
    q_target = jnp.asarray(lo + rng.random(7) * (hi - lo) * 0.5)
    target = ee_position(params, q_target)
    q0 = jnp.asarray(params.resting_pose)
    q = ik_solve(params, target, q0, iters=50)
    err = float(ik_error(params, target, q))
    assert err < 0.05, err


def test_ee_world_transform():
    robot = FetchRobot()
    p0 = np.asarray(
        ee_position_world(
            robot.params,
            jnp.asarray(robot.arm_joint_pos),
            jnp.zeros(3),
            jnp.float32(0.0),
        )
    )
    # rotate base 180deg: x/z components flip
    p1 = np.asarray(
        ee_position_world(
            robot.params,
            jnp.asarray(robot.arm_joint_pos),
            jnp.zeros(3),
            jnp.float32(np.pi),
        )
    )
    np.testing.assert_allclose(p1[1], p0[1], atol=1e-5)
    np.testing.assert_allclose(p1[[0, 2]], -p0[[0, 2]], atol=1e-4)


def test_humanoid_controller_walks():
    from habitat_tpu.articulated_agents.humanoid import (
        HumanoidRearrangeController,
        KinematicHumanoid,
    )

    h = KinematicHumanoid()
    h.controller.reset(np.eye(4))
    start = h.controller.obj_transform_base[:3, 3].copy()
    for _ in range(30):
        h.controller.calculate_walk_pose(np.array([1.0, 0.0, 0.0]))
    h.update()
    moved = np.linalg.norm(h.base_pos - start)
    assert 0.5 < moved < 2.0  # ~1 m/s for 1 second of frames
    pose = h.controller.get_pose()
    assert pose.shape == (17 * 4 + 16,)
