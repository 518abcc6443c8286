"""Observation transforms (reference habitat-baselines/habitat_baselines/
common/obs_transformers.py: ResizeShortestEdge:70, CenterCropper:156,
projection converters :234-1244).

Functional: each transform declares the transformed observation space and a
pure batched apply(obs) usable inside the jitted rollout. Projection
converters (cube↔equirect↔fisheye) are planned with the corresponding
sensors; the registry names are reserved.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from gymnasium import spaces

from habitat_tpu.core.registry import registry


class ObservationTransformer:
    def transform_observation_space(self, observation_space: spaces.Dict) -> spaces.Dict:
        return observation_space

    def __call__(self, obs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    @classmethod
    def from_config(cls, config):
        return cls()


def _image_keys(observation_space: spaces.Dict) -> List[str]:
    return [
        k
        for k, v in observation_space.spaces.items()
        if isinstance(v, spaces.Box) and len(v.shape) == 3
    ]


def _resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(..., H, W, C) resize; uint8-safe."""
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)
    out = jax.image.resize(
        x, x.shape[:-3] + (out_h, out_w, x.shape[-1]), method="bilinear"
    )
    if orig_dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    elif orig_dtype == jnp.int32:
        out = jnp.round(out).astype(jnp.int32)
    return out


@registry.register_obs_transformer(name="ResizeShortestEdge")
class ResizeShortestEdge(ObservationTransformer):
    def __init__(self, size: int = 256, channels_last: bool = True, trans_keys: Tuple[str, ...] = ("rgb", "depth", "semantic")):
        self._size = int(size)
        self.trans_keys = trans_keys
        self._shapes: Dict[str, Tuple[int, int]] = {}

    def transform_observation_space(self, observation_space: spaces.Dict) -> spaces.Dict:
        out = dict(observation_space.spaces)
        for k in _image_keys(observation_space):
            if k not in self.trans_keys:
                continue
            h, w, c = observation_space.spaces[k].shape
            short = min(h, w)
            scale = self._size / short
            nh, nw = int(round(h * scale)), int(round(w * scale))
            self._shapes[k] = (nh, nw)
            sp = observation_space.spaces[k]
            out[k] = spaces.Box(
                low=np.min(sp.low),
                high=np.max(sp.high),
                shape=(nh, nw, c),
                dtype=sp.dtype,
            )
        return spaces.Dict(out)

    def __call__(self, obs):
        out = dict(obs)
        for k, (nh, nw) in self._shapes.items():
            if k in out:
                out[k] = _resize_bilinear(out[k], nh, nw)
        return out

    @classmethod
    def from_config(cls, config):
        return cls(size=int(getattr(config, "size", 256)))


@registry.register_obs_transformer(name="CenterCropper")
class CenterCropper(ObservationTransformer):
    def __init__(self, height: int = 256, width: int = 256, trans_keys: Tuple[str, ...] = ("rgb", "depth", "semantic")):
        self._h = int(height)
        self._w = int(width)
        self.trans_keys = trans_keys
        self._crops: Dict[str, Tuple[int, int]] = {}

    def transform_observation_space(self, observation_space: spaces.Dict) -> spaces.Dict:
        out = dict(observation_space.spaces)
        for k in _image_keys(observation_space):
            if k not in self.trans_keys:
                continue
            h, w, c = observation_space.spaces[k].shape
            assert h >= self._h and w >= self._w, (k, h, w, self._h, self._w)
            self._crops[k] = ((h - self._h) // 2, (w - self._w) // 2)
            sp = observation_space.spaces[k]
            out[k] = spaces.Box(
                low=np.min(sp.low),
                high=np.max(sp.high),
                shape=(self._h, self._w, c),
                dtype=sp.dtype,
            )
        return spaces.Dict(out)

    def __call__(self, obs):
        out = dict(obs)
        for k, (oy, ox) in self._crops.items():
            if k in out:
                out[k] = out[k][..., oy : oy + self._h, ox : ox + self._w, :]
        return out

    @classmethod
    def from_config(cls, config):
        return cls(
            height=int(getattr(config, "height", 256)),
            width=int(getattr(config, "width", 256)),
        )


def get_active_obs_transforms(config) -> List[ObservationTransformer]:
    """reference obs_transformers.py get_active_obs_transforms."""
    out = []
    transforms_cfg = config.get_path(
        "habitat_baselines.rl.policy.main_agent.obs_transforms", {}
    )
    for name, cfg in (transforms_cfg or {}).items():
        cls = registry.get_obs_transformer(cfg.get("type", name))
        out.append(cls.from_config(cfg))
    return out


def apply_obs_transforms_batch(obs, transforms: Iterable[ObservationTransformer]):
    for t in transforms:
        obs = t(obs)
    return obs


def apply_obs_transforms_obs_space(obs_space, transforms):
    for t in transforms:
        obs_space = t.transform_observation_space(obs_space)
    return obs_space
