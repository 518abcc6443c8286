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
