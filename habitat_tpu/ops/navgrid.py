"""Device-side navigation-grid queries.

TPU-native replacement for habitat-sim's PathFinder surface (SURVEY §2.9;
reference call sites habitat_simulator.py:528-596, 701-709): navigability
tests, sliding collision resolution for agent motion, geodesic-distance lookups
on precomputed fields, navigable-point sampling, and greedy geodesic following
(replacing GreedyGeodesicFollower, tasks/nav/shortest_path_follower.py:55-86).

All functions are pure jnp, usable under jit/vmap; the grids live in the
``ScenePack`` pytree in HBM.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from habitat_tpu.sims.scene import INF_DIST, ScenePack


def world_to_cell_f(nav_lo: jnp.ndarray, nav_res: float, xz: jnp.ndarray):
    """Continuous cell coordinates (float)."""
    return (xz - nav_lo) / nav_res


def is_navigable(pack: ScenePack, sid: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """pos (...,3) world -> bool. Nearest-cell test, out-of-grid = False."""
    occ = pack.nav_occ[sid]  # (NX,NZ)
    lo = pack.nav_lo[sid]
    cf = world_to_cell_f(lo, pack.nav_res, pos[..., jnp.array([0, 2])])
    ci = jnp.round(cf).astype(jnp.int32)
    nx, nz = occ.shape[-2], occ.shape[-1]
    inb = (
        (ci[..., 0] >= 0)
        & (ci[..., 0] < nx)
        & (ci[..., 1] >= 0)
        & (ci[..., 1] < nz)
    )
    cc = jnp.clip(ci, 0, jnp.array([nx - 1, nz - 1]))
    val = occ[cc[..., 0], cc[..., 1]]
    return inb & val


def try_step(
    pack: ScenePack,
    sid: jnp.ndarray,
    pos: jnp.ndarray,  # (3,)
    target: jnp.ndarray,  # (3,)
    n_substeps: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Move agent toward target with wall sliding; returns (new_pos, collided).

    Mirrors habitat-sim's ``step_filter`` sliding semantics (allow_sliding=True
    default, reference habitat_simulator.py create_sim_config): the full move is
    decomposed into substeps; at each substep we try the full delta, then the
    x-only and z-only components (axis-decomposed sliding). ``collided`` is True
    iff the agent could not complete the full motion
    (reference previous_step_collided, habitat_simulator.py:711).
    """
    delta = (target - pos) / n_substeps

    def substep(carry, _):
        p, collided = carry
        cand = p + delta
        ok_full = is_navigable(pack, sid, cand)
        cand_x = p + delta * jnp.array([1.0, 0.0, 0.0])
        ok_x = is_navigable(pack, sid, cand_x)
        cand_z = p + delta * jnp.array([0.0, 0.0, 1.0])
        ok_z = is_navigable(pack, sid, cand_z)
        new_p = jnp.where(
            ok_full,
            cand,
            jnp.where(ok_x, cand_x, jnp.where(ok_z, cand_z, p)),
        )
        collided = collided | ~ok_full
        return (new_p, collided), None

    (new_pos, collided), _ = jax.lax.scan(
        substep, (pos, jnp.asarray(False)), None, length=n_substeps
    )
    return new_pos, collided


def distance_at(
    field: jnp.ndarray,  # (NX,NZ) distance field (meters)
    nav_lo: jnp.ndarray,  # (2,)
    nav_res: float,
    pos: jnp.ndarray,  # (3,)
) -> jnp.ndarray:
    """Geodesic distance at a world position: min over the 4 surrounding cells
    plus the euclidean offset to that cell (robust near walls where bilinear
    interpolation against INF neighbors would poison the estimate)."""
    cf = world_to_cell_f(nav_lo, nav_res, pos[jnp.array([0, 2])])
    c0 = jnp.floor(cf).astype(jnp.int32)
    nx, nz = field.shape
    best = jnp.float32(INF_DIST)
    for di in (0, 1):
        for dk in (0, 1):
            ci = jnp.clip(c0 + jnp.array([di, dk]), 0, jnp.array([nx - 1, nz - 1]))
            d = field[ci[0], ci[1]]
            off = jnp.linalg.norm((cf - ci.astype(jnp.float32))) * nav_res
            best = jnp.minimum(best, d + off)
    return best


def snap_to_navigable(
    pack: ScenePack, sid: jnp.ndarray, pos: jnp.ndarray, max_radius_cells: int = 10
) -> jnp.ndarray:
    """Snap a world point to the nearest navigable cell center within a window
    (counterpart of PathFinder.snap_point). Returns pos unchanged in y."""
    occ = pack.nav_occ[sid]
    lo = pack.nav_lo[sid]
    nx, nz = occ.shape
    cf = world_to_cell_f(lo, pack.nav_res, pos[jnp.array([0, 2])])
    c = jnp.round(cf).astype(jnp.int32)
    w = max_radius_cells
    di = jnp.arange(-w, w + 1)
    dk = jnp.arange(-w, w + 1)
    ii = jnp.clip(c[0] + di[:, None], 0, nx - 1)
    kk = jnp.clip(c[1] + dk[None, :], 0, nz - 1)
    window = occ[ii, kk]  # (2w+1, 2w+1)
    dist2 = (ii.astype(jnp.float32) - cf[0]) ** 2 + (kk.astype(jnp.float32) - cf[1]) ** 2
    dist2 = jnp.where(window, dist2, jnp.inf)
    flat = jnp.argmin(dist2)
    bi, bk = jnp.unravel_index(flat, dist2.shape)
    xz = jnp.stack([ii[bi, 0], kk[0, bk]]).astype(jnp.float32) * pack.nav_res + lo
    return jnp.array([xz[0], pack.floor_y[sid], xz[1]])


def sample_navigable_point(
    pack: ScenePack, sid: jnp.ndarray, key: jax.Array, n_tries: int = 32
) -> jnp.ndarray:
    """Uniformly sample a navigable point (rejection sampling over the grid,
    counterpart of PathFinder.get_random_navigable_point)."""
    occ = pack.nav_occ[sid]
    lo = pack.nav_lo[sid]
    nx, nz = occ.shape
    ki, kk_ = jax.random.split(key)
    ii = jax.random.randint(ki, (n_tries,), 0, nx)
    kk = jax.random.randint(kk_, (n_tries,), 0, nz)
    good = occ[ii, kk]
    # first valid try (fall back to the argmax over good which is fine too)
    j = jnp.argmax(good)
    xz = jnp.stack([ii[j], kk[j]]).astype(jnp.float32) * pack.nav_res + lo
    p = jnp.array([xz[0], pack.floor_y[sid], xz[1]])
    # if nothing navigable was sampled, snap to navigable
    return jax.lax.cond(
        jnp.any(good), lambda: p, lambda: snap_to_navigable(pack, sid, p)
    )


def greedy_follower_step(
    pack: ScenePack,
    sid: jnp.ndarray,
    field: jnp.ndarray,  # (NX,NZ) distance-to-goal field
    pos: jnp.ndarray,  # (3,)
    yaw: jnp.ndarray,
    *,
    goal_radius: float,
    forward_step: float,
    turn_angle: float,
) -> jnp.ndarray:
    """Greedy geodesic follower: pick {stop=0, fwd=1, left=2, right=3}.

    Replaces habitat-sim GreedyGeodesicFollower (used by
    tasks/nav/shortest_path_follower.py:55-86): evaluates a ring of candidate
    headings one COLLISION-RESOLVED step ahead (sliding via try_step, exactly
    what executing the action would do) and steers toward the ring direction
    with the lowest field value. A small forward bias breaks left/right
    chatter at walls/doorways.
    """
    nav_lo = pack.nav_lo[sid]
    nav_res = pack.nav_res
    d_here = distance_at(field, nav_lo, nav_res, pos)

    n_dirs = 16
    offsets = jnp.arange(n_dirs) * (2 * jnp.pi / n_dirs)
    cand_yaw = yaw + offsets
    f2 = jnp.stack(
        [-jnp.sin(cand_yaw), jnp.zeros_like(cand_yaw), -jnp.cos(cand_yaw)], axis=-1
    )
    targets = pos[None, :] + f2 * forward_step

    def resolved_d(tgt):
        p2, _ = try_step(pack, sid, pos, tgt)
        return distance_at(field, nav_lo, nav_res, p2)

    d_cands = jax.vmap(resolved_d)(targets)  # (n_dirs,)
    # forward bias: prefer slot 0 when it is within half a cell of the best
    bias = jnp.zeros((n_dirs,)).at[0].set(-0.5 * nav_res)
    best = jnp.argmin(d_cands + bias)
    err = offsets[best]
    err = jnp.arctan2(jnp.sin(err), jnp.cos(err))

    act = jnp.where(
        jnp.abs(err) <= jnp.maximum(0.99 * turn_angle, jnp.pi / n_dirs),
        jnp.int32(1),  # forward
        jnp.where(err > 0, jnp.int32(2), jnp.int32(3)),  # left / right
    )
    return jnp.where(d_here <= goal_radius, jnp.int32(0), act)
