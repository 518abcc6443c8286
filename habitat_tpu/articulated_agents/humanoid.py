"""Kinematic humanoid + controllers.

Counterparts of reference articulated_agents/humanoids/kinematic_humanoid.py
and articulated_agent_controllers/ (HumanoidRearrangeController:52 — walk /
reach pose blending from mocap pickles; HumanoidSeqPoseController). Without
mocap assets, the walk cycle is procedural (phase-driven sinusoidal gait over
the same 17-joint layout); the controller API (reset / calculate_walk_pose /
get_pose) matches so policy-side code is portable.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

NUM_JOINTS = 17  # SMPL-X-ish reduced body
_DIST_TO_STOP = 1e-9


class HumanoidBaseController:
    """reference humanoid_base_controller.py."""

    def __init__(self, motion_fps: float = 30.0, base_offset=(0, 0.9, 0)):
        self.motion_fps = motion_fps
        self.base_offset = np.asarray(base_offset)
        self.obj_transform_base = np.eye(4)
        self.joint_pose = np.zeros((NUM_JOINTS, 4), np.float32)
        self.joint_pose[:, 3] = 1.0  # identity quats

    def reset(self, base_transformation: np.ndarray) -> None:
        self.obj_transform_base = np.asarray(base_transformation)

    def get_pose(self):
        """Flat pose vector (joint quats + base transform), reference
        get_pose() wire format consumed by HumanoidJointAction."""
        return np.concatenate(
            [self.joint_pose.reshape(-1), self.obj_transform_base.reshape(-1)]
        )


class HumanoidRearrangeController(HumanoidBaseController):
    """Walk/reach controller (reference
    humanoid_rearrange_controller.py:52; turn/stop thresholds :23-30)."""

    def __init__(self, walk_pose_path: Optional[str] = None, motion_fps: float = 30.0):
        super().__init__(motion_fps)
        self._phase = 0.0
        self.turning_step_amount = 20  # degrees per turn step (reference :23)
        self.stop_distance = 0.2
        self.walk_speed = 1.0  # m/s

    def calculate_stop_pose(self) -> None:
        self.joint_pose[:] = 0.0
        self.joint_pose[:, 3] = 1.0

    def calculate_turn_pose(self, target_direction: np.ndarray) -> None:
        yaw = float(np.arctan2(-target_direction[0], -target_direction[2]))
        cur = self.obj_transform_base
        R = _yaw_matrix(yaw)
        self.obj_transform_base = cur.copy()
        self.obj_transform_base[:3, :3] = R
        self._swing(0.3)

    def calculate_walk_pose(self, target_direction: np.ndarray, distance_multiplier: float = 1.0) -> None:
        d = np.asarray(target_direction, np.float64)
        dist = np.linalg.norm(d[[0, 2]])
        if dist < _DIST_TO_STOP:
            self.calculate_stop_pose()
            return
        step = min(self.walk_speed / self.motion_fps, dist) * distance_multiplier
        dirn = d / (np.linalg.norm(d) + 1e-9)
        self.obj_transform_base = self.obj_transform_base.copy()
        self.obj_transform_base[:3, 3] += dirn * step
        yaw = float(np.arctan2(-dirn[0], -dirn[2]))
        self.obj_transform_base[:3, :3] = _yaw_matrix(yaw)
        self._phase = (self._phase + 2 * np.pi * 1.6 / self.motion_fps) % (2 * np.pi)
        self._swing(1.0)

    def calculate_reach_pose(self, target: np.ndarray, index_hand: int = 0) -> None:
        """Arm-raise blend toward a 3D point (reference sets hand pose from
        the reach mocap grid)."""
        rel = np.asarray(target) - self.obj_transform_base[:3, 3]
        lift = np.clip(rel[1], -1, 1)
        arm_j = 11 + 3 * index_hand  # left/right shoulder chains
        self.joint_pose[arm_j : arm_j + 3, 0] = 0.4 + 0.4 * lift

    def _swing(self, amp: float) -> None:
        # legs (joints 1-4) and arms (11-16) swing in counter-phase
        s = np.sin(self._phase) * 0.4 * amp
        self.joint_pose[1, 0] = s
        self.joint_pose[2, 0] = -s
        self.joint_pose[11, 0] = -s * 0.6
        self.joint_pose[14, 0] = s * 0.6


class HumanoidSeqPoseController(HumanoidBaseController):
    """Plays back a fixed pose sequence (reference
    humanoid_seq_pose_controller.py)."""

    def __init__(self, poses: Optional[np.ndarray] = None, motion_fps: float = 30.0):
        super().__init__(motion_fps)
        self.poses = poses if poses is not None else np.zeros((1, NUM_JOINTS, 4))
        self._t = 0

    def reset(self, base_transformation) -> None:
        super().reset(base_transformation)
        self._t = 0

    def next_pose(self, cycle: bool = True) -> None:
        self._t = (self._t + 1) % len(self.poses) if cycle else min(
            self._t + 1, len(self.poses) - 1
        )
        self.joint_pose = self.poses[self._t]


class KinematicHumanoid:
    """reference humanoids/kinematic_humanoid.py — humanoid agent shell."""

    def __init__(self, controller: Optional[HumanoidRearrangeController] = None):
        self.controller = controller or HumanoidRearrangeController()
        self.base_pos = np.zeros(3)
        self.base_rot = 0.0

    def reconfigure(self) -> None:
        pass

    def update(self) -> None:
        T = self.controller.obj_transform_base
        self.base_pos = T[:3, 3].copy()


def _yaw_matrix(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
