"""Geometry/semantics toolbox (reference habitat-lab/habitat/sims/
habitat_simulator/sim_utilities.py, 1605 LoC: bbox math, snap_down raycast
placement :310, spatial predicates above:724/within:755/ontop:841/
on_floor:910/object_in_region:958, receptacle matching :1439).

Operates on axis-aligned bounds + the engine's raycaster/navgrid instead of
Magnum scene nodes. Functions take numpy/jnp arrays and work both host-side
(episode generation) and inside jit (batched predicates).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp


# -- bounding boxes ----------------------------------------------------------


def aabb(center, size) -> Tuple[np.ndarray, np.ndarray]:
    """(lo, hi) corners from center + full size."""
    c = np.asarray(center, np.float64)
    h = np.asarray(size, np.float64) / 2
    return c - h, c + h


def aabb_contains(point, lo, hi, eps: float = 1e-6) -> bool:
    p = np.asarray(point)
    return bool(np.all(p >= np.asarray(lo) - eps) and np.all(p <= np.asarray(hi) + eps))


def aabb_overlap(lo_a, hi_a, lo_b, hi_b) -> bool:
    return bool(
        np.all(np.asarray(hi_a) >= np.asarray(lo_b))
        and np.all(np.asarray(hi_b) >= np.asarray(lo_a))
    )


def get_global_keypoints(center, size) -> np.ndarray:
    """Center + 8 corners (reference get_global_keypoints_from_bb)."""
    lo, hi = aabb(center, size)
    corners = np.array(
        [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1]) for z in (lo[2], hi[2])]
    )
    return np.concatenate([np.asarray(center)[None], corners])


# -- placement / snapping ----------------------------------------------------


def snap_down(scene, center, size, max_drop: float = 2.0) -> Optional[np.ndarray]:
    """Drop an object's bbox down to support (reference snap_down:310 —
    raycast placement; here: floor height from the navgrid + obstacle test)."""
    c = np.asarray(center, np.float64)
    ground = scene.floor_y + size[1] / 2
    if c[1] - ground > max_drop or c[1] < ground - 1e-3:
        return None
    out = c.copy()
    out[1] = ground
    if not scene.is_navigable(np.array([out[0], scene.floor_y, out[2]])):
        return None
    return out


# -- spatial predicates (reference :724-958) ---------------------------------


def above(obj_center, obj_size, other_center, other_size, eps: float = 0.01) -> bool:
    """obj is above other: xz footprints overlap and obj bottom >= other top."""
    lo_a, hi_a = aabb(obj_center, obj_size)
    lo_b, hi_b = aabb(other_center, other_size)
    xz_overlap = (
        hi_a[0] >= lo_b[0]
        and hi_b[0] >= lo_a[0]
        and hi_a[2] >= lo_b[2]
        and hi_b[2] >= lo_a[2]
    )
    return bool(xz_overlap and lo_a[1] >= hi_b[1] - eps)


def within(obj_center, other_center, other_size) -> bool:
    """obj center inside other's bounds (reference within:755 keypoint vote)."""
    lo, hi = aabb(other_center, other_size)
    return aabb_contains(obj_center, lo, hi)


def ontop(obj_center, obj_size, other_center, other_size, tol: float = 0.05) -> bool:
    """Resting contact: above + touching (reference ontop:841)."""
    lo_a, _ = aabb(obj_center, obj_size)
    _, hi_b = aabb(other_center, other_size)
    return above(obj_center, obj_size, other_center, other_size, eps=tol) and bool(
        abs(lo_a[1] - hi_b[1]) <= tol
    )


def on_floor(scene, obj_center, obj_size, tol: float = 0.05) -> bool:
    """reference on_floor:910: resting on the navigable floor."""
    lo, _ = aabb(obj_center, obj_size)
    near_floor = abs(lo[1] - scene.floor_y) <= tol
    return bool(
        near_floor
        and scene.is_navigable(np.array([obj_center[0], scene.floor_y, obj_center[2]]))
    )


def object_in_region(obj_center, region_lo, region_hi) -> bool:
    """reference object_in_region:958 (regions are AABBs here)."""
    return aabb_contains(obj_center, region_lo, region_hi)


# -- articulated-link state helpers (reference :1168-1233) --------------------
#
# The reference mutates Bullet joint positions through the articulated-object
# manager; here links are rows of the batched (N, A) joint-state array with
# per-link (lo, hi) ranges — the helpers are pure functions of that state.


def get_link_normalized_joint_position(q, lo, hi):
    """Joint state -> [0,1] within limits (reference :1190)."""
    rng = np.maximum(np.asarray(hi) - np.asarray(lo), 1e-9)
    return np.clip((np.asarray(q) - np.asarray(lo)) / rng, 0.0, 1.0)


def set_link_normalized_joint_position(nq, lo, hi):
    """[0,1] -> joint state (reference :1205)."""
    return np.asarray(lo) + np.clip(np.asarray(nq), 0.0, 1.0) * (
        np.asarray(hi) - np.asarray(lo)
    )


def link_is_open(q, lo, hi, threshold: float = 0.4) -> bool:
    """reference link_is_open:1168."""
    return bool(get_link_normalized_joint_position(q, lo, hi) >= threshold)


def link_is_closed(q, lo, hi, threshold: float = 0.1) -> bool:
    """reference link_is_closed:1179."""
    return bool(get_link_normalized_joint_position(q, lo, hi) <= threshold)


def open_link(lo, hi):
    """Fully-open joint state (reference open_link:1223)."""
    return set_link_normalized_joint_position(1.0, lo, hi)


def close_link(lo, hi):
    """Fully-closed joint state (reference close_link:1233)."""
    return set_link_normalized_joint_position(0.0, lo, hi)


# -- raycast-based snap (reference snap_down:310 true raycast variant) --------


def snap_down_raycast(
    tri_v0, tri_e1, tri_e2, tri_valid, center, size, max_drop: float = 2.0
):
    """Drop an object onto whatever surface is below it by raycasting the
    bbox bottom keypoints straight down against scene triangles (reference
    snap_down + bb_ray_prescreen, sim_utilities.py:234-380). Returns the
    snapped center or None when there is no support within max_drop."""
    from habitat_tpu.ops.raycast import raycast_rays

    import jax.numpy as _jnp

    c = np.asarray(center, np.float64)
    h = np.asarray(size, np.float64) / 2
    # 5 bottom keypoints: center + 4 corners of the bottom face
    pts = np.array(
        [
            [c[0], c[1], c[2]],
            [c[0] - h[0], c[1], c[2] - h[2]],
            [c[0] + h[0], c[1], c[2] - h[2]],
            [c[0] - h[0], c[1], c[2] + h[2]],
            [c[0] + h[0], c[1], c[2] + h[2]],
        ],
        np.float32,
    )
    dirs = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (5, 1))
    t, idx = raycast_rays(
        _jnp.asarray(tri_v0),
        _jnp.asarray(tri_e1),
        _jnp.asarray(tri_e2),
        _jnp.asarray(tri_valid).astype(bool),
        _jnp.asarray(pts),
        _jnp.asarray(dirs),
    )
    t = np.asarray(t)
    hit = np.asarray(idx) >= 0
    if not hit.any():
        return None
    # support height = highest hit among keypoints (the object rests on it)
    drop = np.min(np.where(hit, t, np.inf))
    if drop > max_drop + h[1]:
        return None
    out = c.copy()
    out[1] = c[1] - drop + h[1]
    return out


# -- receptacle matching (reference :1439-1528) -------------------------------


def get_obj_receptacle_matches(
    obj_center, obj_size, receptacles, ontop_tol: float = 0.08
):
    """Which receptacles support/contain the object (reference
    get_obj_receptacle_and_confidence:1439): a receptacle matches when the
    object's center is inside its (slightly padded) bounds or the object
    rests on its top surface. Returns [(name, confidence)] best-first."""
    c = np.asarray(obj_center, np.float64)
    matches = []
    for rec in receptacles:
        lo, hi = rec.bounds
        lo = np.asarray(lo, np.float64)
        hi = np.asarray(hi, np.float64)
        pad = np.array([ontop_tol, max(obj_size[1], ontop_tol), ontop_tol])
        inside = np.all(c >= lo - pad) and np.all(c <= hi + pad)
        if not inside:
            continue
        # confidence: xz distance from receptacle center, normalized
        rc = (lo + hi) / 2
        ext = np.maximum((hi - lo) / 2, 1e-6)
        d = np.abs(c - rc) / ext
        conf = float(np.clip(1.0 - np.max(d[[0, 2]]), 0.0, 1.0))
        matches.append((rec.name, conf))
    matches.sort(key=lambda x: -x[1])
    return matches


def find_receptacle_for_object(obj_center, obj_size, receptacles):
    """Best-match receptacle name or None (reference usage pattern)."""
    m = get_obj_receptacle_matches(obj_center, obj_size, receptacles)
    return m[0][0] if m else None


# -- batched (jit) variants ---------------------------------------------------


def batched_within(points: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """(N,3) points vs (3,)/(N,3) bounds -> (N,) bool."""
    return jnp.all((points >= lo) & (points <= hi), axis=-1)


def batched_ontop(
    obj_c: jnp.ndarray, obj_s: jnp.ndarray, other_c: jnp.ndarray, other_s: jnp.ndarray, tol: float = 0.05
) -> jnp.ndarray:
    lo_a = obj_c - obj_s / 2
    hi_a = obj_c + obj_s / 2
    lo_b = other_c - other_s / 2
    hi_b = other_c + other_s / 2
    xz = (
        (hi_a[..., 0] >= lo_b[..., 0])
        & (hi_b[..., 0] >= lo_a[..., 0])
        & (hi_a[..., 2] >= lo_b[..., 2])
        & (hi_b[..., 2] >= lo_a[..., 2])
    )
    return xz & (jnp.abs(lo_a[..., 1] - hi_b[..., 1]) <= tol)
