"""Batched triangle raycasting → RGB / Depth / Semantic sensor frames.

TPU-native replacement for habitat-sim's Magnum GL renderer (SURVEY §2.9;
reference call sites sims/habitat_simulator/habitat_simulator.py:373-435,
461-485). All N envs render in one array program: rays are generated from the
batched agent poses, intersected against the HBM-resident ``ScenePack``
triangles (Möller–Trumbore), and shaded flat+lambert. No GL, no host round
trips, frames are native device arrays (the reference's gpu2gpu path is moot).

Two implementations:
- ``raycast_scene``: pure XLA — ``lax.scan`` over triangle chunks, fully
  vectorized over rays. Works on CPU (tests) and TPU.
- a Pallas VMEM-tiled kernel (``raycast_pallas``) for the TPU hot path
  (see ops/raycast_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from habitat_tpu.sims.scene import ScenePack
from habitat_tpu.utils.geometry import camera_rays

_EPS = 1e-7
_TMIN = 1e-3
_TMAX = 1e6


def _mt_chunk(o, d, v0, e1, e2, valid):
    """Möller–Trumbore: rays (R,3) × triangle chunk (C,3) -> (t, hit) (R,C)."""
    # broadcast rays against triangles
    d_ = d[:, None, :]  # (R,1,3)
    o_ = o[:, None, :]
    v0_ = v0[None, :, :]  # (1,C,3)
    e1_ = e1[None, :, :]
    e2_ = e2[None, :, :]

    h = jnp.cross(d_, e2_)  # (R,C,3)
    a = jnp.sum(e1_ * h, axis=-1)  # (R,C)
    f = jnp.where(jnp.abs(a) > _EPS, 1.0 / jnp.where(jnp.abs(a) > _EPS, a, 1.0), 0.0)
    s = o_ - v0_
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1_)
    v = f * jnp.sum(d_ * q, axis=-1)
    t = f * jnp.sum(e2_ * q, axis=-1)
    hit = (
        (jnp.abs(a) > _EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > _TMIN)
        & valid[None, :]
    )
    t = jnp.where(hit, t, _TMAX)
    return t


def raycast_rays(
    tri_v0: jnp.ndarray,  # (T,3) one scene's triangles
    tri_e1: jnp.ndarray,
    tri_e2: jnp.ndarray,
    tri_valid: jnp.ndarray,  # (T,)
    origins: jnp.ndarray,  # (R,3)
    dirs: jnp.ndarray,  # (R,3)
    chunk: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest-hit raycast. Returns (t (R,), tri_index (R,), -1 on miss)."""
    T = tri_v0.shape[0]
    assert T % chunk == 0, f"triangle count {T} must be padded to chunk {chunk}"
    n_chunks = T // chunk

    v0c = tri_v0.reshape(n_chunks, chunk, 3)
    e1c = tri_e1.reshape(n_chunks, chunk, 3)
    e2c = tri_e2.reshape(n_chunks, chunk, 3)
    vc = tri_valid.reshape(n_chunks, chunk)

    R = origins.shape[0]

    def body(carry, xs):
        best_t, best_i = carry
        v0, e1, e2, valid, base = xs
        t = _mt_chunk(origins, dirs, v0, e1, e2, valid)  # (R,C)
        tmin = jnp.min(t, axis=1)
        imin = jnp.argmin(t, axis=1).astype(jnp.int32) + base
        better = tmin < best_t
        best_t = jnp.where(better, tmin, best_t)
        best_i = jnp.where(better, imin, best_i)
        return (best_t, best_i), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_t, best_i), _ = lax.scan(
        body,
        (jnp.full((R,), _TMAX, jnp.float32), jnp.full((R,), -1, jnp.int32)),
        (v0c, e1c, e2c, vc, bases),
    )
    best_i = jnp.where(best_t >= _TMAX, -1, best_i)
    return best_t, best_i


def render_env(
    pack: ScenePack,
    sid: jnp.ndarray,  # scalar int32 scene id
    cam_pos: jnp.ndarray,  # (3,)
    yaw: jnp.ndarray,
    pitch: jnp.ndarray,
    *,
    height: int,
    width: int,
    hfov_deg: float = 90.0,
    max_depth: float = 10.0,
    min_depth: float = 0.0,
    normalize_depth: bool = True,
    tri_chunk: int = 128,
) -> Dict[str, jnp.ndarray]:
    """Render one env's sensors. vmap over envs for the batch.

    Depth semantics match reference HabitatSimDepthSensor
    (habitat_simulator.py:139-199): planar z-depth clipped to
    [min_depth, max_depth], normalized to [0,1] if normalize_depth.
    """
    dirs = camera_rays(yaw, pitch, jnp.deg2rad(hfov_deg), height, width)  # (H,W,3)
    dirs = dirs.reshape(-1, 3)
    R = dirs.shape[0]
    origins = jnp.broadcast_to(cam_pos, (R, 3))

    v0 = pack.tri_v0[sid]
    e1 = pack.tri_e1[sid]
    e2 = pack.tri_e2[sid]
    valid = pack.tri_valid[sid]

    t, idx = raycast_rays(v0, e1, e2, valid, origins, dirs, chunk=tri_chunk)
    hit = idx >= 0
    safe_idx = jnp.maximum(idx, 0)

    # planar depth = t * cos(angle to camera forward)
    from habitat_tpu.utils.geometry import yaw_to_forward

    cp = jnp.cos(pitch)
    fwd_flat = yaw_to_forward(yaw)
    fwd = jnp.stack(
        [fwd_flat[..., 0] * cp, jnp.sin(pitch), fwd_flat[..., 2] * cp], axis=-1
    )
    z = t * jnp.sum(dirs * fwd, axis=-1)
    z = jnp.where(hit, z, max_depth)
    z = jnp.clip(z, min_depth, max_depth)
    if normalize_depth:
        z = (z - min_depth) / (max_depth - min_depth)
    depth = z.reshape(height, width, 1).astype(jnp.float32)

    # flat shading with headlight lambert
    n = jnp.cross(e1[safe_idx], e2[safe_idx])
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    lambert = jnp.abs(jnp.sum(n * dirs, axis=-1))
    shade = 0.35 + 0.65 * lambert
    base = pack.tri_color[sid][safe_idx]
    sky = jnp.array([0.65, 0.75, 0.9], jnp.float32)
    rgb = jnp.where(hit[:, None], base * shade[:, None], sky[None, :])
    rgb_u8 = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8).reshape(height, width, 3)

    sem = jnp.where(hit, pack.tri_sem[sid][safe_idx], 0)
    sem = sem.reshape(height, width, 1).astype(jnp.int32)

    return {"rgb": rgb_u8, "depth": depth, "semantic": sem}


def render_batch(
    pack: ScenePack,
    sids: jnp.ndarray,  # (N,)
    cam_pos: jnp.ndarray,  # (N,3)
    yaw: jnp.ndarray,  # (N,)
    pitch: jnp.ndarray,  # (N,)
    **kw,
) -> Dict[str, jnp.ndarray]:
    """Render all envs: (N,H,W,C) frames. The reference needs N processes +
    a cross-process batch renderer (core/batch_rendering/) for this; here it
    is a single vmap."""
    f = functools.partial(render_env, **kw)
    return jax.vmap(lambda s, p, y, pi: f(pack, s, p, y, pi))(
        sids, cam_pos, yaw, pitch
    )
