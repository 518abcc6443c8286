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


class UrdfManipulator(Manipulator):
    """Manipulator whose kinematics come from a parsed URDF chain instead of
    a hand-written param table (reference manipulator.py:79-120 loads the
    URDF into Bullet; here `urdf.load_chain` + `kinematics.fk_chain`)."""

    def __init__(self, urdf_path: str, base_link=None, ee_link=None):
        from habitat_tpu.articulated_agents.kinematics import (
            ee_chain,
            ik_solve_chain,
        )
        from habitat_tpu.articulated_agents.params import (
            MobileManipulatorParams,
        )
        from habitat_tpu.articulated_agents.urdf import load_chain

        self.chain = load_chain(urdf_path, base_link=base_link, ee_link=ee_link)
        J = self.chain.num_joints
        rest = np.clip(np.zeros(J), self.chain.lower, self.chain.upper)
        params = MobileManipulatorParams(
            name=self.chain.name,
            arm_joints=J,
            joint_axes=tuple("x" * J),  # unused by the chain path
            link_offsets=tuple((0.0, 0.0, 0.0) for _ in range(J)),
            arm_root_offset=(0.0, 0.0, 0.0),
            joint_limits_lower=tuple(float(v) for v in self.chain.lower),
            joint_limits_upper=tuple(float(v) for v in self.chain.upper),
            resting_pose=tuple(float(v) for v in rest),
        )
        super().__init__(params)
        self._ee_chain = ee_chain
        self._ik_chain = ik_solve_chain

    @property
    def ee_local_pos(self) -> np.ndarray:
        return np.asarray(self._ee_chain(self.chain, jnp.asarray(self._joints)))

    def calculate_ee_inverse_kinematics(self, target_local) -> np.ndarray:
        return np.asarray(
            self._ik_chain(
                self.chain, jnp.asarray(target_local), jnp.asarray(self._joints)
            )
        )


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
