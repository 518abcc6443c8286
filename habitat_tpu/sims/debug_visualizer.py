"""Offscreen debug camera + image/video dump (reference habitat-lab/habitat/
sims/habitat_simulator/debug_visualizer.py, 778 LoC: DebugVisualizer with
peek-object/peek-scene framing and video output). Renders through the TPU
raycaster from arbitrary look-at poses."""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from habitat_tpu.ops.raycast import render_batch
from habitat_tpu.sims.scene import ScenePack


def _lookat_yaw_pitch(eye: np.ndarray, target: np.ndarray) -> Tuple[float, float]:
    d = np.asarray(target, np.float64) - np.asarray(eye, np.float64)
    yaw = float(np.arctan2(-d[0], -d[2]))
    pitch = float(np.arctan2(d[1], np.linalg.norm(d[[0, 2]])))
    return yaw, pitch


class DebugVisualizer:
    """dbv-style helper: point a camera anywhere, collect frames, dump video."""

    def __init__(
        self,
        pack: ScenePack,
        sid: int = 0,
        resolution: Tuple[int, int] = (256, 256),
        output_path: str = "visual_debug_output",
    ):
        self.pack = pack
        self.sid = sid
        self.resolution = resolution
        self.output_path = output_path
        self._frames: List[np.ndarray] = []

    def render(self, eye, target=None, yaw: float = 0.0, pitch: float = -0.3):
        if target is not None:
            yaw, pitch = _lookat_yaw_pitch(eye, target)
        h, w = self.resolution
        out = render_batch(
            self.pack,
            jnp.asarray([self.sid], jnp.int32),
            jnp.asarray(np.asarray(eye, np.float32))[None],
            jnp.asarray(yaw)[None],
            jnp.asarray(pitch)[None],
            height=h,
            width=w,
        )
        return {k: np.asarray(v[0]) for k, v in out.items()}

    def peek(self, eye, target=None, **kw) -> np.ndarray:
        """Render + stash an rgb frame (reference peek_*)."""
        frame = self.render(eye, target, **kw)["rgb"]
        self._frames.append(frame)
        return frame

    def peek_scene(self, height: float = 9.0) -> np.ndarray:
        """Bird's-eye view of the whole scene (reference peek with scene bb)."""
        lo = np.asarray(self.pack.nav_lo[self.sid])
        center = np.array([lo[0] + 5.0, height, lo[1] + 5.0], np.float32)
        return self.peek(center, target=center * np.array([1, 0, 1]))

    def get_observation(self, look_at=None, look_from=None):
        return self.render(look_from, look_at)

    def make_debug_video(self, output_path: Optional[str] = None, prefix: str = "dbv") -> None:
        from habitat_tpu.utils.visualizations.utils import images_to_video

        if not self._frames:
            return
        images_to_video(self._frames, output_path or self.output_path, prefix)

    def clear(self) -> None:
        self._frames = []
