"""Kinematic humanoid + controllers.

Counterparts of reference articulated_agents/humanoids/kinematic_humanoid.py
and articulated_agent_controllers/ (HumanoidRearrangeController:52 — walk /
reach pose blending from mocap pickles; HumanoidSeqPoseController). Mocap
clips in the reference's walk-pose pickle layout (or .npz) load via
load_motion(); without assets the walk cycle falls back to a procedural
phase-driven sinusoidal gait over the same 17-joint layout. The controller
API (reset / calculate_walk_pose / get_pose) matches either way.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

NUM_JOINTS = 17  # SMPL-X-ish reduced body
_DIST_TO_STOP = 1e-9


class Motion:
    """A loaded mocap clip (reference humanoid_base_controller.py::Motion:40
    — per-frame joint quats + root transforms + fps + total displacement)."""

    def __init__(
        self,
        joints_quat: np.ndarray,  # (T, J, 4)
        transforms: np.ndarray,  # (T, 4, 4)
        fps: float,
        displacement: Optional[np.ndarray] = None,  # (T,) cumulative meters
    ):
        self.poses = np.asarray(joints_quat, np.float32)
        self.transforms = np.asarray(transforms, np.float32)
        self.fps = float(fps)
        self.num_poses = len(self.poses)
        if displacement is None:
            # root-translation arc length per frame
            steps = np.linalg.norm(
                np.diff(self.transforms[:, :3, 3], axis=0), axis=-1
            )
            displacement = np.concatenate([[0.0], np.cumsum(steps)])
        self.displacement = np.asarray(displacement, np.float32)

    @property
    def dist_per_step_size(self) -> float:
        return float(self.displacement[-1]) / max(1, self.num_poses)


def load_motion(path: str, key: str = "walk_motion") -> Motion:
    """Load a mocap clip from the reference's walk-pose pickle layout
    (humanoid_rearrange_controller.py:82-98: dict[key] with
    joints_quat_array / transform_array / fps / displacement) or an .npz
    with the same field names."""
    if path.endswith(".npz"):
        data = dict(np.load(path))
    else:
        import pickle

        with open(path, "rb") as f:
            raw = pickle.load(f)
        data = raw.get(key, raw) if isinstance(raw, dict) else raw
    if key in data and isinstance(data[key], dict):
        data = data[key]
    joints = np.asarray(data["joints_quat_array"], np.float32)
    transforms = np.asarray(data["transform_array"], np.float32)
    fps = float(np.asarray(data.get("fps", 30.0)).reshape(-1)[0])
    disp = data.get("displacement")
    if joints.ndim == 2:  # flat (T, J*4)
        joints = joints.reshape(len(joints), -1, 4)
    return Motion(joints, transforms, fps, disp)


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


def _nlerp(quats: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Weighted quaternion blend with hemisphere alignment (the reference
    blends grid poses the same way, humanoid_rearrange_controller.py
    _trilinear_interpolate): align every quat to the first, weighted sum,
    renormalize. quats (K, J, 4), weights (K,) -> (J, 4)."""
    ref = quats[0]
    sign = np.where(
        np.sum(quats * ref[None], axis=-1, keepdims=True) < 0, -1.0, 1.0
    )
    q = np.sum(quats * sign * weights[:, None, None], axis=0)
    n = np.linalg.norm(q, axis=-1, keepdims=True)
    return (q / np.maximum(n, 1e-9)).astype(np.float32)


class ReachPoseGrid:
    """Hand-reach pose grid (reference hand_processed_data in
    HumanoidRearrangeController: full-body poses sampled over a 3D grid of
    reachable hand positions; reaching = trilinear pose blending over the 8
    cell corners). Without mocap assets, a synthetic grid is built from a
    2-link analytic arm so blended poses still track the target."""

    def __init__(self, xs, ys, zs, poses):
        self.xs = np.asarray(xs, np.float32)
        self.ys = np.asarray(ys, np.float32)
        self.zs = np.asarray(zs, np.float32)
        self.poses = np.asarray(poses, np.float32)  # (Gx,Gy,Gz,J,4)

    @classmethod
    def synthetic(cls, index_hand: int = 0, n: int = 5) -> "ReachPoseGrid":
        xs = np.linspace(-0.6, 0.6, n)
        ys = np.linspace(0.2, 1.6, n)
        zs = np.linspace(-0.8, 0.0, n)
        poses = np.zeros((n, n, n, NUM_JOINTS, 4), np.float32)
        poses[..., 3] = 1.0
        arm_j = 11 + 3 * index_hand
        for i, x in enumerate(xs):
            for j, y in enumerate(ys):
                for k, z in enumerate(zs):
                    # 2-link arm: shoulder pitch/yaw + elbow from distance
                    pitch = np.clip((y - 0.9), -1.2, 1.2)
                    yaw = np.clip(np.arctan2(x, max(-z, 1e-3)), -1.2, 1.2)
                    d = np.sqrt(x * x + (y - 0.9) ** 2 + z * z)
                    elbow = np.clip(1.6 * (1.0 - d / 0.8), 0.0, 1.5)
                    for a, ang in enumerate((pitch, yaw, elbow)):
                        poses[i, j, k, arm_j + a, 0] = np.sin(ang / 2)
                        poses[i, j, k, arm_j + a, 3] = np.cos(ang / 2)
        return cls(xs, ys, zs, poses)

    def blend(self, target_rel: np.ndarray) -> np.ndarray:
        """Trilinear quaternion blend at a hand target (relative to the
        humanoid root). Returns (J, 4)."""
        t = np.asarray(target_rel, np.float64)
        idx, frac = [], []
        for axis, v in zip((self.xs, self.ys, self.zs), t):
            v = np.clip(v, axis[0], axis[-1])
            i = int(np.clip(np.searchsorted(axis, v) - 1, 0, len(axis) - 2))
            idx.append(i)
            frac.append((v - axis[i]) / max(axis[i + 1] - axis[i], 1e-9))
        (i, j, k), (fx, fy, fz) = idx, frac
        corners, weights = [], []
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    corners.append(self.poses[i + dx, j + dy, k + dz])
                    weights.append(
                        (fx if dx else 1 - fx)
                        * (fy if dy else 1 - fy)
                        * (fz if dz else 1 - fz)
                    )
        return _nlerp(np.stack(corners), np.asarray(weights))


class HumanoidRearrangeController(HumanoidBaseController):
    """Walk/reach controller (reference
    humanoid_rearrange_controller.py:52; turn/stop thresholds :23-30)."""

    def __init__(self, walk_pose_path: Optional[str] = None, motion_fps: float = 30.0):
        super().__init__(motion_fps)
        self._phase = 0.0
        self.turning_step_amount = 20  # degrees per turn step (reference :23)
        self.stop_distance = 0.2
        self.walk_speed = 1.0  # m/s
        # mocap walk cycle when assets are available (reference :82-98);
        # procedural gait otherwise
        self.walk_motion: Optional[Motion] = None
        self._motion_frame = 0
        if walk_pose_path is not None:
            self.walk_motion = load_motion(walk_pose_path)
            self.walk_speed = self.walk_motion.dist_per_step_size * self.motion_fps
        # reach grids per hand (reference hand_processed_data)
        self._reach_grids = {
            0: ReachPoseGrid.synthetic(0),
            1: ReachPoseGrid.synthetic(1),
        }

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
        if self.walk_motion is not None:
            # advance frames so mocap displacement matches the distance moved
            # (reference :223-245 scales frame step by fps ratio)
            m = self.walk_motion
            adv = max(1, int(round(step / max(m.dist_per_step_size, 1e-6))))
            self._motion_frame = (self._motion_frame + adv) % m.num_poses
            self.joint_pose = m.poses[self._motion_frame].copy()
            return
        self._phase = (self._phase + 2 * np.pi * 1.6 / self.motion_fps) % (2 * np.pi)
        self._swing(1.0)

    def calculate_reach_pose(self, target: np.ndarray, index_hand: int = 0) -> None:
        """Reach toward a 3D world point: trilinear pose blending over the
        hand-reach grid (reference calculate_reach_pose +
        _trilinear_interpolate in humanoid_rearrange_controller.py)."""
        # target into the root frame (undo base yaw)
        rel_w = np.asarray(target, np.float64) - self.obj_transform_base[:3, 3]
        R = self.obj_transform_base[:3, :3]
        rel = R.T @ rel_w
        blended = self._reach_grids[index_hand].blend(rel)
        # splice only the reaching arm's chain from the blended pose, keep
        # the rest (walk pose etc.)
        arm_j = 11 + 3 * index_hand
        self.joint_pose = self.joint_pose.copy()
        self.joint_pose[arm_j : arm_j + 3] = blended[arm_j : arm_j + 3]

    def calculate_walk_and_reach_pose(
        self,
        target_direction: np.ndarray,
        reach_target: np.ndarray,
        index_hand: int = 0,
        distance_multiplier: float = 1.0,
    ) -> None:
        """Walk while reaching (reference blends the walk cycle with the
        reach grid pose for pick-while-moving)."""
        self.calculate_walk_pose(target_direction, distance_multiplier)
        self.calculate_reach_pose(reach_target, index_hand)

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

    @classmethod
    def from_file(cls, path: str, key: str = "walk_motion"):
        """Load the sequence from a mocap pickle/npz (reference
        humanoid_seq_pose_controller.py loads the same clip format)."""
        m = load_motion(path, key)
        ctrl = cls(m.poses, motion_fps=m.fps)
        ctrl.motion = m
        return ctrl

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
