"""Observation transforms (reference habitat-baselines/habitat_baselines/
common/obs_transformers.py: ResizeShortestEdge:70, CenterCropper:156,
projection converters :234-1244).

Functional: each transform declares the transformed observation space and a
pure batched apply(obs) usable inside the jitted rollout. Projection
converters (cube↔equirect↔fisheye) are implemented below as precomputed
bilinear gather plans (build_projection_plan / apply_projection_plan).
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

    def _target_shape(self, h: int, w: int) -> Tuple[int, int]:
        scale = self._size / min(h, w)
        return int(round(h * scale)), int(round(w * scale))

    def __call__(self, obs):
        out = dict(obs)
        for k in self.trans_keys:
            if k not in out or out[k].ndim < 3:
                continue
            # lazy: derive target shape from the incoming array so the
            # transform works without a prior transform_observation_space call
            nh, nw = self._shapes.get(
                k, self._target_shape(out[k].shape[-3], out[k].shape[-2])
            )
            if (nh, nw) != out[k].shape[-3:-1]:
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
        for k in self.trans_keys:
            if k not in out or out[k].ndim < 3:
                continue
            h, w = out[k].shape[-3], out[k].shape[-2]
            if h == self._h and w == self._w:
                continue
            # lazy: center-crop offsets from the incoming array shape
            oy, ox = self._crops.get(k, ((h - self._h) // 2, (w - self._w) // 2))
            out[k] = out[k][..., oy : oy + self._h, ox : ox + self._w, :]
        return out

    @classmethod
    def from_config(cls, config):
        return cls(
            height=int(getattr(config, "height", 256)),
            width=int(getattr(config, "width", 256)),
        )


# ---------------------------------------------------------------------------
# projection converters (reference common/obs_transformers.py:234-1244:
# ProjectionConverter + CubeMap2Equirect / CubeMap2Fisheye / Equirect2CubeMap)
# ---------------------------------------------------------------------------
#
# Re-designed for TPU: each converter precomputes a constant bilinear
# sampling plan (4 flat source indices + weights per output pixel) on the
# host at construction; apply() is then 4 batched gathers + a weighted sum —
# a pure resampling jittable alongside the policy. The reference instead runs
# a grid_sample per frame through torch.
#
# Cube face order matches the reference convention: BACK, DOWN, FRONT, LEFT,
# RIGHT, UP (obs_transformers.py:344-352), with faces rendered by pinhole
# cameras at (yaw, pitch): BACK=(pi,0) DOWN=(0,-pi/2) FRONT=(0,0)
# LEFT=(pi/2,0) RIGHT=(-pi/2,0) UP=(0,pi/2) in this engine's camera
# convention (utils/geometry.camera_rays: forward -z, yaw about +y).

CUBE_FACES = ("BACK", "DOWN", "FRONT", "LEFT", "RIGHT", "UP")
_FACE_POSES = {
    "BACK": (np.pi, 0.0),
    "DOWN": (0.0, -np.pi / 2),
    "FRONT": (0.0, 0.0),
    "LEFT": (np.pi / 2, 0.0),
    "RIGHT": (-np.pi / 2, 0.0),
    "UP": (0.0, np.pi / 2),
}


def _rot_yaw_pitch(yaw: float, pitch: float) -> np.ndarray:
    """World-from-camera rotation (matches utils/geometry.rotate_dirs)."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    r_pitch = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    r_yaw = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    return r_yaw @ r_pitch


def _dirs_to_cube_plan(dirs: np.ndarray, face_hw: int):
    """(H,W,3) world directions -> bilinear plan into a stacked cube tensor.

    Returns (idx (4,H*W) int32 flat indices into (6*face_hw*face_hw), weights
    (4,H*W) f32). Each direction projects into the face whose camera sees it
    most head-on; uv from the 90-deg pinhole projection."""
    H, W, _ = dirs.shape
    d = dirs.reshape(-1, 3)
    best_z = np.full(d.shape[0], -np.inf)
    face = np.zeros(d.shape[0], np.int32)
    uu = np.zeros(d.shape[0])
    vv = np.zeros(d.shape[0])
    for fi, name in enumerate(CUBE_FACES):
        yaw, pitch = _FACE_POSES[name]
        R = _rot_yaw_pitch(yaw, pitch)
        dc = d @ R  # world -> camera (R is orthonormal; dc = R^T d)
        z = -dc[:, 2]  # forwardness
        with np.errstate(divide="ignore", invalid="ignore"):
            u = np.where(z > 1e-9, dc[:, 0] / z, 0.0)
            v = np.where(z > 1e-9, dc[:, 1] / z, 0.0)
        take = z > best_z
        best_z = np.where(take, z, best_z)
        face = np.where(take, fi, face)
        uu = np.where(take, u, uu)
        vv = np.where(take, v, vv)
    # uv in [-1,1] -> pixel coords (camera_rays: x right / y up, row 0 = +v)
    px = (uu + 1.0) * 0.5 * (face_hw - 1)
    py = (1.0 - vv) * 0.5 * (face_hw - 1)
    x0 = np.clip(np.floor(px).astype(np.int64), 0, face_hw - 1)
    y0 = np.clip(np.floor(py).astype(np.int64), 0, face_hw - 1)
    x1 = np.minimum(x0 + 1, face_hw - 1)
    y1 = np.minimum(y0 + 1, face_hw - 1)
    fx = np.clip(px - x0, 0.0, 1.0)
    fy = np.clip(py - y0, 0.0, 1.0)
    base = face.astype(np.int64) * face_hw * face_hw
    idx = np.stack(
        [
            base + y0 * face_hw + x0,
            base + y0 * face_hw + x1,
            base + y1 * face_hw + x0,
            base + y1 * face_hw + x1,
        ]
    )
    wts = np.stack([(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy])
    return idx.astype(np.int32), wts.astype(np.float32)


def _apply_plan(stacked: jnp.ndarray, idx, wts, out_hw, nearest: bool):
    """stacked (N, S, C) flat sources -> (N, H, W, C) resampled output."""
    N, _, C = stacked.shape
    H, W = out_hw
    if nearest:
        best = jnp.argmax(wts, axis=0)  # (H*W,)
        flat = jnp.take(stacked, idx[best, jnp.arange(idx.shape[1])], axis=1)
        return flat.reshape(N, H, W, C)
    acc = 0.0
    for k in range(4):
        acc = acc + wts[k][None, :, None] * jnp.take(stacked, idx[k], axis=1)
    return acc.reshape(N, H, W, C)


def _resample_obs(img6, idx, wts, out_hw):
    """img6: (N, 6, Hf, Wf, C) cube faces -> (N, H, W, C)."""
    N = img6.shape[0]
    C = img6.shape[-1]
    dtype = img6.dtype
    nearest = jnp.issubdtype(dtype, jnp.integer) and dtype != jnp.uint8
    x = img6.reshape(N, -1, C)
    if not nearest:
        x = x.astype(jnp.float32)
    out = _apply_plan(x, idx, wts, out_hw, nearest)
    if dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    elif nearest:
        out = out.astype(dtype)
    return out


class _CubeMapConverter(ObservationTransformer):
    """Shared machinery: consumes groups of 6 cube-face uuids, emits one
    converted key per group (reference ProjectionConverter contract:
    sensor_uuids in BACK/DOWN/FRONT/LEFT/RIGHT/UP order, target = the
    group's first uuid stripped of its face suffix)."""

    def __init__(self, sensor_uuids: List[str], out_hw: Tuple[int, int],
                 target_uuids: Optional[List[str]] = None):
        assert len(sensor_uuids) % 6 == 0, sensor_uuids
        self.groups = [sensor_uuids[i : i + 6] for i in range(0, len(sensor_uuids), 6)]
        self.out_hw = tuple(out_hw)
        if target_uuids is None:
            target_uuids = []
            for g in self.groups:
                name = g[0]
                for f in CUBE_FACES:
                    name = name.replace(f"_{f.lower()}", "").replace(f"_{f}", "")
                target_uuids.append(name)
        self.target_uuids = target_uuids
        self._plan = {}  # face_hw -> (idx, wts)

    def _out_dirs(self) -> np.ndarray:
        raise NotImplementedError

    def _get_plan(self, face_hw: int):
        if face_hw not in self._plan:
            idx, wts = _dirs_to_cube_plan(self._out_dirs(), face_hw)
            self._plan[face_hw] = (jnp.asarray(idx), jnp.asarray(wts))
        return self._plan[face_hw]

    def transform_observation_space(self, observation_space: spaces.Dict) -> spaces.Dict:
        out = dict(observation_space.spaces)
        H, W = self.out_hw
        for g, tgt in zip(self.groups, self.target_uuids):
            if g[0] not in out:
                continue
            sp = out[g[0]]
            c = sp.shape[-1]
            for u in g:
                out.pop(u, None)
            out[tgt] = spaces.Box(
                low=np.min(sp.low), high=np.max(sp.high), shape=(H, W, c),
                dtype=sp.dtype,
            )
        return spaces.Dict(out)

    def __call__(self, obs):
        out = dict(obs)
        for g, tgt in zip(self.groups, self.target_uuids):
            if g[0] not in out:
                continue
            faces = jnp.stack([out.pop(u) for u in g], axis=-4)  # (...,6,H,W,C)
            if faces.ndim == 4:  # unbatched
                faces = faces[None]
                squeeze = True
            else:
                squeeze = False
            idx, wts = self._get_plan(faces.shape[-2])
            res = _resample_obs(faces, idx, wts, self.out_hw)
            out[tgt] = res[0] if squeeze else res
        return out


@registry.register_obs_transformer(name="CubeMap2Equirect")
class CubeMap2Equirect(_CubeMapConverter):
    """6 cube faces -> one equirectangular panorama
    (reference obs_transformers.py:340-420)."""

    def _out_dirs(self) -> np.ndarray:
        H, W = self.out_hw
        lon = np.linspace(-np.pi, np.pi, W, endpoint=False)
        lat = np.linspace(np.pi / 2, -np.pi / 2, H)
        LO, LA = np.meshgrid(lon, lat)
        # matches utils/geometry.equirect_rays at yaw=pitch=0
        x = -np.sin(LO) * np.cos(LA)
        y = np.sin(LA)
        z = -np.cos(LO) * np.cos(LA)
        return np.stack([x, y, z], axis=-1)

    @classmethod
    def from_config(cls, config):
        return cls(
            sensor_uuids=list(config.get("sensor_uuids", [])),
            out_hw=tuple(config.get("eq_shape", (256, 512))),
            target_uuids=list(config.get("target_uuids", [])) or None,
        )


@registry.register_obs_transformer(name="CubeMap2Fisheye")
class CubeMap2Fisheye(_CubeMapConverter):
    """6 cube faces -> a double-sphere-model fisheye image (reference
    obs_transformers.py:730-900; camera model: Usenko et al. 2018, the
    reference's FisheyeParams xi/alpha/focal/principal point)."""

    def __init__(self, sensor_uuids, out_hw, fish_params=(0.2, 0.59, 0.18),
                 target_uuids=None):
        # fish_params = (xi, alpha, focal-ratio); focal scaled by image size
        self.fish_params = fish_params
        super().__init__(sensor_uuids, out_hw, target_uuids)

    def _out_dirs(self) -> np.ndarray:
        H, W = self.out_hw
        xi, alpha, fr = self.fish_params
        fx = fy = fr * min(H, W)
        cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
        u, v = np.meshgrid(np.arange(W), np.arange(H))
        mx = (u - cx) / fx
        my = -(v - cy) / fy  # y up
        r2 = mx * mx + my * my
        # double-sphere unprojection (closed form)
        inner = 1.0 - (2 * alpha - 1.0) * r2
        valid = inner >= 0.0
        inner = np.maximum(inner, 0.0)
        mz = (1.0 - alpha * alpha * r2) / (alpha * np.sqrt(inner) + 1.0 - alpha)
        s = (mz * xi + np.sqrt(np.maximum(mz * mz + (1 - xi * xi) * r2, 0.0))) / (
            mz * mz + r2 + 1e-12
        )
        d = np.stack([s * mx, s * my, -(s * mz - xi)], axis=-1)
        n = np.linalg.norm(d, axis=-1, keepdims=True)
        d = d / np.maximum(n, 1e-9)
        # invalid pixels look straight back -> sample something; mask below
        d[~valid] = np.array([0.0, 0.0, 1.0])
        self._valid_mask = valid
        return d

    def __call__(self, obs):
        out = super().__call__(obs)
        mask = getattr(self, "_valid_mask", None)
        if mask is not None:
            m = jnp.asarray(mask)
            for tgt in self.target_uuids:
                if tgt in out and hasattr(out[tgt], "ndim"):
                    img = out[tgt]
                    if img.shape[-3:-1] == m.shape:
                        out[tgt] = img * m[..., None].astype(img.dtype)
        return out

    @classmethod
    def from_config(cls, config):
        fp = config.get("fish_params", None)
        kw = {}
        if fp is not None:
            kw["fish_params"] = tuple(fp)
        return cls(
            sensor_uuids=list(config.get("sensor_uuids", [])),
            out_hw=tuple(config.get("fish_shape", (256, 256))),
            target_uuids=list(config.get("target_uuids", [])) or None,
            **kw,
        )


@registry.register_obs_transformer(name="Equirect2CubeMap")
class Equirect2CubeMap(ObservationTransformer):
    """One equirect panorama -> 6 cube faces (reference
    obs_transformers.py:950-1080). Output keys = target_uuids (6 per input)."""

    def __init__(self, sensor_uuids: List[str], img_shape: Tuple[int, int],
                 target_uuids: Optional[List[str]] = None):
        self.sensor_uuids = list(sensor_uuids)
        self.out_hw = tuple(img_shape)
        if target_uuids is None:
            target_uuids = [
                f"{u}_{f.lower()}" for u in sensor_uuids for f in CUBE_FACES
            ]
        self.target_uuids = target_uuids
        self._plan = {}

    def _get_plan(self, eq_hw: Tuple[int, int]):
        if eq_hw not in self._plan:
            H, W = self.out_hw
            He, We = eq_hw
            from habitat_tpu.utils.geometry import camera_rays

            idxs, wtss = [], []
            for f in CUBE_FACES:
                yaw, pitch = _FACE_POSES[f]
                d = np.asarray(
                    camera_rays(
                        jnp.float32(yaw), jnp.float32(pitch),
                        jnp.deg2rad(90.0), H, W,
                    )
                ).reshape(-1, 3)
                lon = np.arctan2(-d[:, 0], -d[:, 2])
                lat = np.arcsin(np.clip(d[:, 1], -1, 1))
                px = (lon + np.pi) / (2 * np.pi) * We  # lon=-pi -> col 0
                py = (np.pi / 2 - lat) / np.pi * (He - 1)
                x0 = np.floor(px).astype(np.int64)
                fx = px - x0
                x0 = x0 % We
                x1 = (x0 + 1) % We  # wrap longitude
                y0 = np.clip(np.floor(py).astype(np.int64), 0, He - 1)
                y1 = np.minimum(y0 + 1, He - 1)
                fy = np.clip(py - y0, 0.0, 1.0)
                idx = np.stack(
                    [y0 * We + x0, y0 * We + x1, y1 * We + x0, y1 * We + x1]
                )
                wts = np.stack(
                    [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy]
                )
                idxs.append(idx)
                wtss.append(wts)
            self._plan[eq_hw] = (
                jnp.asarray(np.stack(idxs).astype(np.int32)),
                jnp.asarray(np.stack(wtss).astype(np.float32)),
            )
        return self._plan[eq_hw]

    def transform_observation_space(self, observation_space):
        out = dict(observation_space.spaces)
        H, W = self.out_hw
        ti = 0
        for u in self.sensor_uuids:
            if u not in out:
                ti += 6
                continue
            sp = out.pop(u)
            for _ in range(6):
                out[self.target_uuids[ti]] = spaces.Box(
                    low=np.min(sp.low), high=np.max(sp.high),
                    shape=(H, W, sp.shape[-1]), dtype=sp.dtype,
                )
                ti += 1
        return spaces.Dict(out)

    def __call__(self, obs):
        out = dict(obs)
        ti = 0
        for u in self.sensor_uuids:
            if u not in out:
                ti += 6
                continue
            eq = out.pop(u)
            squeeze = eq.ndim == 3
            if squeeze:
                eq = eq[None]
            N, He, We, C = eq.shape
            idxs, wtss = self._get_plan((He, We))
            flat = eq.reshape(N, He * We, C)
            dtype = eq.dtype
            x = flat if dtype == jnp.float32 else flat.astype(jnp.float32)
            for fi in range(6):
                res = _apply_plan(x, idxs[fi], wtss[fi], self.out_hw, False)
                if dtype == jnp.uint8:
                    res = jnp.clip(jnp.round(res), 0, 255).astype(jnp.uint8)
                elif jnp.issubdtype(dtype, jnp.integer):
                    res = jnp.round(res).astype(dtype)
                out[self.target_uuids[ti]] = res[0] if squeeze else res
                ti += 1
        return out

    @classmethod
    def from_config(cls, config):
        return cls(
            sensor_uuids=list(config.get("sensor_uuids", [])),
            img_shape=tuple(config.get("img_shape", (256, 256))),
            target_uuids=list(config.get("target_uuids", [])) or None,
        )


@registry.register_obs_transformer(name="AddVirtualKeys")
class AddVirtualKeys(ObservationTransformer):
    """Adds zero-filled observation keys (reference obs_transformers.py:1246
    — used by HITL/planning configs that declare policy-side-only keys)."""

    def __init__(self, virtual_keys: Dict[str, int]):
        self.virtual_keys = dict(virtual_keys)

    def transform_observation_space(self, observation_space):
        out = dict(observation_space.spaces)
        for k, dim in self.virtual_keys.items():
            out[k] = spaces.Box(-np.inf, np.inf, (int(dim),), np.float32)
        return spaces.Dict(out)

    def __call__(self, obs):
        out = dict(obs)
        any_leaf = next(iter(obs.values()))
        batch = any_leaf.shape[0] if any_leaf.ndim > 3 or any_leaf.ndim == 2 else None
        for k, dim in self.virtual_keys.items():
            if k in out:
                continue
            shape = (batch, int(dim)) if batch is not None else (int(dim),)
            out[k] = jnp.zeros(shape, jnp.float32)
        return out

    @classmethod
    def from_config(cls, config):
        vk = config.get("virtual_keys", {}) or {}
        items = vk.items() if hasattr(vk, "items") else []
        return cls({str(k): int(v) for k, v in items})


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
