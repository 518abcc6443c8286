"""Baselines misc utils (reference habitat-baselines/habitat_baselines/utils/
common.py: batch_obs:315, generate_video:380, get_num_actions:729,
LagrangeInequalityCoefficient:749, inference_mode)."""

from __future__ import annotations

import contextlib
import os
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from gymnasium import spaces


def batch_obs(observations: List[Dict[str, Any]], device=None) -> Dict[str, jnp.ndarray]:
    """List of per-env obs dicts -> dict of stacked (N, ...) arrays
    (reference common.py:315 — the TPU engine produces batched obs natively;
    this exists for VectorEnv-facade pipelines)."""
    assert len(observations) > 0
    keys = observations[0].keys()
    out = {k: jnp.asarray(np.stack([np.asarray(o[k]) for o in observations])) for k in keys}
    if device is not None:
        out = jax.device_put(out, device)
    return out


def get_num_actions(action_space) -> int:
    """reference common.py:729."""
    if isinstance(action_space, spaces.Discrete):
        return int(action_space.n)
    if isinstance(action_space, spaces.Box):
        return int(np.prod(action_space.shape))
    if isinstance(action_space, spaces.Dict):
        return sum(get_num_actions(v) for v in action_space.spaces.values())
    raise NotImplementedError(type(action_space))


def is_continuous_action_space(action_space) -> bool:
    return isinstance(action_space, spaces.Box)


@contextlib.contextmanager
def inference_mode():
    """torch.inference_mode parity — a no-op in JAX (functions are pure)."""
    yield


def generate_video(
    video_option: List[str],
    video_dir: Optional[str],
    images: List[np.ndarray],
    episode_id: str,
    checkpoint_idx: int,
    metrics: Dict[str, float],
    tb_writer=None,
    fps: int = 10,
    verbose: bool = True,
) -> None:
    """reference common.py:380."""
    if len(images) < 1:
        return
    metric_strs = []
    for k, v in metrics.items():
        metric_strs.append(f"{k}={v:.2f}")
    video_name = f"episode={episode_id}-ckpt={checkpoint_idx}-" + "-".join(metric_strs)
    if "disk" in video_option and video_dir is not None:
        from habitat_tpu.utils.visualizations.utils import images_to_video

        images_to_video(images, video_dir, video_name, fps=fps, verbose=verbose)
    if "tensorboard" in video_option and tb_writer is not None:
        tb_writer.add_video_from_np_images(
            f"episode{episode_id}", checkpoint_idx, images, fps=fps
        )


class LagrangeInequalityCoefficient:
    """Adaptive coefficient for inequality constraints (reference common.py:749
    — used for Lagrangian-adaptive entropy in PPO, rl/ppo/ppo.py:87-101).

    Maintains log-alpha; project_into_bounds clamps after gradient steps.
    JAX-functional: holds no torch params; value/threshold math only.
    """

    def __init__(
        self,
        threshold: float,
        init_alpha: float = 1.0,
        alpha_min: float = 1e-4,
        alpha_max: float = 1.0,
        greater_than: bool = True,
    ):
        self.threshold = threshold
        self.log_alpha = float(np.log(init_alpha))
        self.log_alpha_min = float(np.log(alpha_min))
        self.log_alpha_max = float(np.log(alpha_max))
        self._greater_than = greater_than

    def alpha(self) -> float:
        return float(np.exp(self.log_alpha))

    def lagrangian_loss_and_update(self, value: float, lr: float = 1e-3) -> float:
        """Penalty term alpha*(threshold - value) (sign by direction); then
        ascend log_alpha toward enforcing the constraint."""
        diff = (
            (self.threshold - value) if self._greater_than else (value - self.threshold)
        )
        loss = self.alpha() * diff
        self.log_alpha += lr * diff
        self.project_into_bounds()
        return loss

    def project_into_bounds(self) -> None:
        self.log_alpha = min(max(self.log_alpha, self.log_alpha_min), self.log_alpha_max)
