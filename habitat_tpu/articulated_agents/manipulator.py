"""Manipulator / MobileManipulator host classes (API parity).

Counterparts of reference articulated_agents/manipulator.py:19 (URDF load,
joint motors, EE state, gripper logic), articulated_agent_base.py and
mobile_manipulator.py. Kinematic state is plain arrays; reconfigure/update
are trivial (no Bullet); the math lives in kinematics.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from habitat_tpu.articulated_agents.kinematics import (
    ee_position,
    ee_position_world,
    ik_solve,
)
from habitat_tpu.articulated_agents.params import (
    ROBOTS,
    MobileManipulatorParams,
)


class Manipulator:
    """reference manipulator.py: arm joint get/set, EE transform, gripper."""

    def __init__(self, params: MobileManipulatorParams):
        self.params = params
        self._joints = np.asarray(params.resting_pose, np.float32)
        self._gripper = params.gripper_open_state

    # -- joints ----------------------------------------------------------
    @property
    def arm_joint_pos(self) -> np.ndarray:
        return self._joints.copy()

    @arm_joint_pos.setter
    def arm_joint_pos(self, q) -> None:
        lo = np.asarray(self.params.joint_limits_lower)
        hi = np.asarray(self.params.joint_limits_upper)
        self._joints = np.clip(np.asarray(q, np.float32), lo, hi)

    @property
    def arm_motor_pos(self) -> np.ndarray:
        return self.arm_joint_pos

    @arm_motor_pos.setter
    def arm_motor_pos(self, q) -> None:
        self.arm_joint_pos = q

    def reset(self) -> None:
        self._joints = np.asarray(self.params.resting_pose, np.float32)
        self.open_gripper()

    # -- EE ----------------------------------------------------------------
    @property
    def ee_local_pos(self) -> np.ndarray:
        return np.asarray(ee_position(self.params, jnp.asarray(self._joints)))

    def ee_world_pos(self, base_pos, base_yaw) -> np.ndarray:
        return np.asarray(
            ee_position_world(
                self.params,
                jnp.asarray(self._joints),
                jnp.asarray(base_pos),
                jnp.asarray(base_yaw),
            )
        )

    def calculate_ee_inverse_kinematics(self, target_local) -> np.ndarray:
        return np.asarray(
            ik_solve(self.params, jnp.asarray(target_local), jnp.asarray(self._joints))
        )

    # -- gripper -------------------------------------------------------------
    def open_gripper(self) -> None:
        self._gripper = self.params.gripper_open_state

    def close_gripper(self) -> None:
        self._gripper = self.params.gripper_closed_state

    @property
    def is_gripper_open(self) -> bool:
        return abs(self._gripper - self.params.gripper_open_state) < 1e-3


class MobileManipulator(Manipulator):
    """Base pose + arm (reference mobile_manipulator.py)."""

    def __init__(self, params: MobileManipulatorParams):
        super().__init__(params)
        self.base_pos = np.zeros(3, np.float32)
        self.base_rot = 0.0  # yaw

    @property
    def ee_pos(self) -> np.ndarray:
        return self.ee_world_pos(self.base_pos, self.base_rot)


class StaticManipulator(Manipulator):
    """reference static_manipulator.py (fixed base)."""


def make_robot(name: str) -> MobileManipulator:
    """Robot factory by reference class name (FetchRobot/SpotRobot/...)."""
    return MobileManipulator(ROBOTS[name])


class FetchRobot(MobileManipulator):
    def __init__(self):
        super().__init__(ROBOTS["FetchRobot"])


class SpotRobot(MobileManipulator):
    def __init__(self):
        super().__init__(ROBOTS["SpotRobot"])


class StretchRobot(MobileManipulator):
    def __init__(self):
        super().__init__(ROBOTS["StretchRobot"])


class FrankaRobot(StaticManipulator):
    def __init__(self):
        super().__init__(ROBOTS["FrankaRobot"])
