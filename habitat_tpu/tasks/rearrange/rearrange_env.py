"""Batched kinematic rearrangement — the Habitat-2.0 stack, TPU-native.

Re-architecture of the reference rearrangement runtime (SURVEY §2.3):
- RearrangeSim (tasks/rearrange/rearrange_sim.py:65: multi-object scenes,
  reconfigure diffing :287, substepped physics :890) — here object state is a
  batched (N, O, 3) array in the env pytree; "reconfigure" is a gather.
- RearrangeGraspManager's magic-snap grasp (rearrange_grasp_manager.py:27-60:
  rigid-constraint attach) — here grasping kinematically parents the object
  to the agent (exactly the reference's kinematic_mode=True recipe, which its
  own social-nav training uses, habitat-baselines/README.md:140).
- Pick/Place sub-tasks + their reward/success measures
  (sub_tasks/pick_task.py:21, place_task.py:13, rearrange_sensors.py).

Dynamics modes: "kinematic" (objects static unless held — the reference's
kinematic_mode=True recipe) and "contacts" (the DEFAULT for config-built
rearrange envs since round 3). Contacts carries full rotational rigid-body
state since round 4/5: quaternion + angular-velocity lanes, solid-box
inertia, 8-corner sequential-impulse floor contacts (tip/tumble/settle,
rigid_body.py), contacts v5 box-box and robot-box impulses applied at the
pair contact point with both lever arms (struck boxes are knocked over),
and — contacts v6 — box-box pair DETECTION by the full 15-axis OBB-OBB
SAT on true orientations (3 face normals per box + 9 edge cross products,
Bullet btBoxBoxDetector's axis set; tests/test_contacts_v6.py): a tipped
box presents its real cross-section, not a fattened upright cover — and
the robot-cylinder contact finds the TRUE closest point on the rotated
box (segment-to-OBB ternary search), so its pushout force and lever-arm
torque act at the real surface. Grasp remains kinematic parenting. Live ForceTerminate throughout. Movable
objects render through the dynamic pass of ops/raycast.render_batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from gymnasium import spaces

from habitat_tpu.articulated_agents import dynamics as arm_dyn
from habitat_tpu.articulated_agents import kinematics as kin
from habitat_tpu.articulated_agents.params import ROBOTS
from habitat_tpu.core.dataset import EpisodeTable
from habitat_tpu.core.registry import registry
from habitat_tpu.ops import navgrid as ng
from habitat_tpu.articulated_agents import legs as legs_mod
from habitat_tpu.tasks.rearrange import rigid_body as rigid
from habitat_tpu.ops.raycast import render_batch
from habitat_tpu.sims.scene import ScenePack
from habitat_tpu.utils.geometry import (
    rotate_agent_to_world,
    rotate_world_to_agent,
    yaw_to_forward,
)

# fixed kinematic EE offset in the agent frame (forward, lifted — stands in
# for the articulated arm's resting EE; reference Fetch params
# articulated_agents/robots/fetch_robot.py)
EE_OFFSET = jnp.array([0.0, 0.9, -0.45])
HELD_OFFSET = jnp.array([0.0, 0.9, -0.45])
OBJ_HALF = 0.12  # rearrange objects are ~24cm boxes (YCB-ish scale)
DOOR_LEN = 0.6  # revolute (fridge) door length, hinge to handle
OBJ_SEM_BASE = 100


@jtu.register_dataclass
@dataclasses.dataclass
class RearrangeTable:
    """Per-episode rearrange data (extends the nav EpisodeTable)."""

    nav: EpisodeTable
    obj_init: jnp.ndarray  # (E, O, 3)
    obj_valid: jnp.ndarray  # (E, O) bool
    # collision/render shape per object: upright OBB half-extents + yaw
    # (reference: Bullet collision shapes from the object asset; here the
    # asset's box dims — VERDICT r2 #4 drops the one-size AABB restriction)
    obj_half: jnp.ndarray  # (E, O, 3)
    obj_yaw: jnp.ndarray  # (E, O)
    target_pos: jnp.ndarray  # (E, O, 3) goal position per object
    target_mask: jnp.ndarray  # (E, O) bool — objects that must move
    pick_target: jnp.ndarray  # (E,) int32 — focus object for pick/place
    # articulated objects (reference sub_tasks/articulated_object_task.py):
    # prismatic (drawer, q in meters along art_axis) or revolute (fridge
    # door, q in radians about the vertical hinge at art_pos; art_axis is
    # the door direction at q=0) — (E, A, ...) with A art objs
    art_pos: jnp.ndarray  # (E, A, 3) body/hinge position
    art_axis: jnp.ndarray  # (E, A, 3) slide axis / door dir at q=0 (unit)
    art_valid: jnp.ndarray  # (E, A) bool
    art_target: jnp.ndarray  # (E,) int32 target art obj
    art_init_q: jnp.ndarray  # (E,) initial joint state of the target
    art_goal_q: jnp.ndarray  # (E,) desired joint state
    art_is_revolute: jnp.ndarray  # (E, A) bool


@jtu.register_dataclass
@dataclasses.dataclass
class RearrangeState:
    """Batched rearrange env state."""

    ep_ptr: jnp.ndarray
    ep_idx: jnp.ndarray
    step: jnp.ndarray
    pos: jnp.ndarray
    yaw: jnp.ndarray
    prev_pos: jnp.ndarray
    obj_pos: jnp.ndarray  # (N, O, 3)
    obj_vel: jnp.ndarray  # (N, O, 3) rigid-body velocity (gravity dynamics)
    # contacts v4 rotational state (rigid_body.py): orientation quaternion
    # (w,x,y,z) + world angular velocity — boxes tip, tumble, settle
    obj_quat: jnp.ndarray  # (N, O, 4)
    obj_omega: jnp.ndarray  # (N, O, 3)
    art_q: jnp.ndarray  # (N, A) joint states
    art_vel: jnp.ndarray  # (N, A) joint velocities (articulated dynamics)
    joints: jnp.ndarray  # (N, J) arm joint positions (real FK chain)
    # legged base (reference articulated_agent_base.py leg_joint_pos): 12
    # Spot leg joints held at leg_init during base motion, FK-rendered;
    # (N, 0) for wheeled/non-legged robots
    leg_q: jnp.ndarray  # (N, L)
    joint_vel: jnp.ndarray  # (N, J) arm joint velocities (arm_dynamics mode)
    motor_target: jnp.ndarray  # (N, J) accumulated PD motor targets
    #   (reference ArmRelPosAction integrates deltas on arm_motor_pos,
    #   actions.py:167-238 — NOT on the measured joint position)
    held: jnp.ndarray  # (N,) int32, -1 = none
    ever_held: jnp.ndarray  # (N,) bool — picked the right object at least once
    # second agent (hab3 multi-agent rearrange: a kinematic humanoid driven
    # through declared agent_1_* task actions; zeros when single-agent)
    human_pos: jnp.ndarray  # (N,3)
    human_yaw: jnp.ndarray  # (N,)
    human_held: jnp.ndarray  # (N,) int32, -1 = none
    accum_force: jnp.ndarray  # (N,) running contact force on the robot
    stop_called: jnp.ndarray
    collided: jnp.ndarray
    collision_count: jnp.ndarray
    last_action: jnp.ndarray
    episode_over: jnp.ndarray
    episode_count: jnp.ndarray
    key: jax.Array


AGENT_RADIUS = 0.3
FORCE_K = 100.0  # pseudo-force per meter of robot-object penetration


def contact_step(
    obj_pos: jnp.ndarray,  # (N,O,3) object BOTTOM positions
    obj_vel: jnp.ndarray,  # (N,O,3)
    free: jnp.ndarray,  # (N,O) bool — simulated (valid & not held)
    floor_y: jnp.ndarray,  # (N,)
    agent_pos: jnp.ndarray,  # (N,3)
    dt: float = 0.1,
    g: float = 9.8,
    n_substeps: int = 4,
    half=OBJ_HALF,  # float | (N,O,3) per-object half-extents
    yaw_o=None,  # None | (N,O) upright-OBB yaw about +Y
    quat=None,  # None | (N,O,4) contacts v4 orientation state
    omega=None,  # None | (N,O,3) world angular velocity
):
    """Impulse/projection contact dynamics (reference: Bullet step_world,
    tasks/rearrange/rearrange_sim.py:1017-1028). The contact shapes ARE the
    rendered geometry — per-object half-extent boxes.

    v3 (quat=None): UPRIGHT OBBs yawed about +Y. Separating-axis test over
    {Y, u_i, w_i, u_j, w_j} (the two footprint axes of each box), MTV
    projection along the least-penetrated axis with zero restitution,
    flush stacking support, floor support with ground friction, and
    robot-cylinder pushout against the OBB's nearest footprint point whose
    penetration integrates into a pseudo contact force (reference
    RobotForce, rearrange_sensors.py:814).
    Returns (obj_pos, obj_vel, robot_force).

    v4/v5 (quat given): full rotational state — gravity/integration/floor
    run through rigid_body.box_floor_substep (8-corner sequential impulses:
    overhanging boxes TIP, tumble, and settle on a face), and box-box /
    robot-box contacts (v5) solve their impulses at the pair contact point
    with both bodies' lever arms and world inverse inertias, so collisions
    transfer torque: a struck or rammed standing box rotates, tips over its
    support edge (floor friction from the corner solver provides the
    pivot), and settles on a face. Contact SHAPES for the pair SAT remain
    upright-OBB covers of the current orientation (effective_upright_obb:
    exact for upright boxes, an AABB-in-yaw-frame cover when tipped — no
    mesh/convex manifolds).
    Returns (obj_pos, obj_vel, robot_force, quat, omega)."""
    N, O, _ = obj_pos.shape
    sdt = dt / n_substeps
    eye = jnp.eye(O, dtype=bool)[None]
    freem = free[..., None]
    force = jnp.zeros((N,), jnp.float32)
    if jnp.ndim(half) == 0:
        half = jnp.broadcast_to(
            jnp.asarray([half, half, half], jnp.float32), (N, O, 3)
        )
    if yaw_o is None:
        yaw_o = jnp.zeros((N, O), jnp.float32)
    fy_c = floor_y[:, None]

    def sat_boxbox(p, v, half_c, hy_c, u_c, w_c, with_floor_anchor,
                   wv=None, iw=None):
        """One box-box SAT pass: MTV projection + restitution-0 impulses.

        Translational mode (wv=None, contacts v3): center-to-center velocity
        impulses. Rotational mode (contacts v5, wv/iw given): the impulse is
        solved and applied AT the pair contact point (midpoint of the two
        closest-surface points), with both bodies' lever arms and world
        inverse inertias in the effective mass — a struck standing box
        acquires angular velocity and can be knocked over (Bullet
        step_world's observable box-box behavior,
        tasks/rearrange/rearrange_sim.py:1017-1028).
        Returns (p, v, wv, support_any)."""

        def proj_radius(axis):
            ri = half_c[..., 0][:, :, None] * jnp.abs(
                jnp.sum(u_c[:, :, None] * axis, -1)
            ) + half_c[..., 2][:, :, None] * jnp.abs(
                jnp.sum(w_c[:, :, None] * axis, -1)
            )
            rj = half_c[..., 0][:, None, :] * jnp.abs(
                jnp.sum(u_c[:, None, :] * axis, -1)
            ) + half_c[..., 2][:, None, :] * jnp.abs(
                jnp.sum(w_c[:, None, :] * axis, -1)
            )
            return ri + rj

        d = p[:, :, None, :] - p[:, None, :, :]  # (N,O,O,3) i<-j
        dxz = d[..., jnp.array([0, 2])]  # (N,O,O,2)
        pen_y = hy_c[:, :, None] + hy_c[:, None, :] - jnp.abs(d[..., 1])
        axes = jnp.stack(
            [
                jnp.broadcast_to(u_c[:, :, None], dxz.shape),
                jnp.broadcast_to(w_c[:, :, None], dxz.shape),
                jnp.broadcast_to(u_c[:, None, :], dxz.shape),
                jnp.broadcast_to(w_c[:, None, :], dxz.shape),
            ],
            axis=0,
        )  # (4,N,O,O,2)
        sep = jnp.sum(axes * dxz[None], -1)  # signed center gap on axis
        pen_xz = jax.vmap(proj_radius)(axes) - jnp.abs(sep)  # (4,N,O,O)
        pair = free[:, :, None] & free[:, None, :] & ~eye
        active = pair & (pen_y > 0.0) & jnp.all(pen_xz > 0.0, axis=0)
        pens = jnp.concatenate([pen_y[None], pen_xz], axis=0)  # (5,N,O,O)
        which = jnp.argmin(pens, axis=0)  # (N,O,O)
        pen = jnp.min(pens, axis=0)
        y_nrm = jnp.stack(
            [
                jnp.zeros_like(pen_y),
                jnp.where(d[..., 1] >= 0, 1.0, -1.0),
                jnp.zeros_like(pen_y),
            ],
            axis=-1,
        )
        sgn = jnp.where(sep >= 0, 1.0, -1.0)[..., None]  # (4,N,O,O,1)
        xz_nrm = axes * sgn  # unit, pushing i away from j
        nrm3 = jnp.stack(
            [
                jnp.stack(
                    [xz_nrm[k][..., 0], jnp.zeros_like(pen_y), xz_nrm[k][..., 1]],
                    axis=-1,
                )
                for k in range(4)
            ],
            axis=0,
        )
        cand = jnp.concatenate([y_nrm[None], nrm3], axis=0)  # (5,N,O,O,3)
        nrm = jnp.take_along_axis(
            cand, which[None, ..., None].astype(jnp.int32), axis=0
        )[0]
        # separation split: grounded (or held) bodies act kinematic — the
        # free body takes the FULL correction. One propagation pass anchors
        # boxes resting ON an anchored box (stable short stacks).
        base = ~free | (p[..., 1] <= fy_c + hy_c + 1e-3)  # held / on floor
        support = active & (which == 0) & (d[..., 1] > 0)  # j supports i
        sup_anchored = base | jnp.any(support & base[:, None, :], axis=2)
        ai = base[:, :, None]
        aj = sup_anchored[:, None, :]
        wgt = jnp.where(aj & ~ai, 1.0, jnp.where(ai & ~aj, 0.0, 0.5))
        corr = jnp.sum(
            jnp.where(active[..., None], (wgt * pen)[..., None] * nrm, 0.0),
            axis=2,
        )
        p = p + corr
        if wv is None:
            rel = v[:, :, None, :] - v[:, None, :, :]
            vn = jnp.sum(rel * nrm, axis=-1)
            imp = jnp.where(active & (vn < 0), -0.5 * vn, 0.0)
            v = v + jnp.sum(imp[..., None] * nrm, axis=2)
            return p, v, None, jnp.any(support, axis=2)

        # ---- contacts v5: impulse at the pair contact point --------------
        zero = jnp.zeros_like(hy_c)
        u3 = jnp.stack([u_c[..., 0], zero, u_c[..., 1]], axis=-1)  # (N,O,3)
        w3 = jnp.stack([w_c[..., 0], zero, w_c[..., 1]], axis=-1)

        def closest_on(rel_c, u3b, w3b, halfb, pb):
            """Closest point on box b (upright-eff frame u3b/w3b/halfb at
            center pb) to a point displaced rel_c from pb."""
            lx = jnp.sum(rel_c * u3b, -1)
            ly = rel_c[..., 1]
            lz = jnp.sum(rel_c * w3b, -1)
            cx = jnp.clip(lx, -halfb[..., 0], halfb[..., 0])
            cy2 = jnp.clip(ly, -halfb[..., 1], halfb[..., 1])
            cz = jnp.clip(lz, -halfb[..., 2], halfb[..., 2])
            out = pb + cx[..., None] * u3b + cz[..., None] * w3b
            return out.at[..., 1].add(cy2)

        pi = p[:, :, None, :]
        pj = p[:, None, :, :]
        cp_j = closest_on(
            d, u3[:, None, :, :], w3[:, None, :, :], half_c[:, None, :, :], pj
        )  # on j, closest to center i (d = p_i - p_j)
        cp_i = closest_on(
            -d, u3[:, :, None, :], w3[:, :, None, :], half_c[:, :, None, :], pi
        )
        c = 0.5 * (cp_i + cp_j)  # (N,O,O,3) shared contact point
        r_i = c - pi
        r_j = c - pj
        vr = (v[:, :, None, :] + jnp.cross(wv[:, :, None, :], r_i)) - (
            v[:, None, :, :] + jnp.cross(wv[:, None, :, :], r_j)
        )
        vn = jnp.sum(vr * nrm, axis=-1)
        # effective mass along nrm with both lever arms; held (non-free)
        # bodies are kinematic (zero inverse mass/inertia)
        mi = jnp.where(free, 1.0, 0.0)  # unit mass
        rxn_i = jnp.cross(r_i, nrm)
        rxn_j = jnp.cross(r_j, nrm)
        ang_i = jnp.sum(
            jnp.cross(jnp.einsum("noab,nopb->nopa", iw, rxn_i), r_i) * nrm, -1
        )
        ang_j = jnp.sum(
            jnp.cross(jnp.einsum("npab,nopb->nopa", iw, rxn_j), r_j) * nrm, -1
        )
        k_n = (
            mi[:, :, None]
            + mi[:, None, :]
            + ang_i * mi[:, :, None]
            + ang_j * mi[:, None, :]
        )
        jn = jnp.where(
            active & (vn < 0.0), -vn / jnp.maximum(k_n, 1e-6), 0.0
        )
        Ji = jn[..., None] * nrm  # impulse ON body i from each j
        v = v + mi[..., None] * jnp.sum(Ji, axis=2)
        wv = wv + mi[..., None] * jnp.einsum(
            "noab,nob->noa", iw, jnp.sum(jnp.cross(r_i, Ji), axis=2)
        )
        return p, v, wv, jnp.any(support, axis=2)

    def sat_boxbox_obb(p, v, q, wv, half, iw):
        """Contacts v6 (round 5): FULL 15-axis OBB-OBB SAT for box-box
        pairs — each body's true rotation matrix, not the upright-OBB
        cover (reference: Bullet's btBoxBoxDetector axis set). Axes: 3
        face normals per box + 9 edge-edge cross products (degenerate
        cross axes are masked). Contact point = midpoint of the two
        closest-surface points in full local frames; impulses are the v5
        lever-arm machinery unchanged. A tipped box now presents its REAL
        diamond cross-section to its neighbours instead of a fattened
        upright cover."""
        R = rigid.quat_to_matrix(q)  # (N,O,3,3), columns = box axes
        d = p[:, :, None, :] - p[:, None, :, :]  # (N,O,O,3) i<-j
        ax = jnp.swapaxes(R, -1, -2)  # (N,O,3axes,3comps) rows = axes
        ax_i = ax[:, :, None]  # (N,O,1,3axes,3)
        ax_j = ax[:, None, :]  # (N,1,O,3axes,3)
        shp = d.shape[:-1]
        axes = [jnp.broadcast_to(ax_i[..., k, :], shp + (3,)) for k in range(3)]
        axes += [jnp.broadcast_to(ax_j[..., k, :], shp + (3,)) for k in range(3)]
        for k in range(3):
            for l in range(3):
                axes.append(
                    jnp.cross(
                        jnp.broadcast_to(ax_i[..., k, :], shp + (3,)),
                        jnp.broadcast_to(ax_j[..., l, :], shp + (3,)),
                    )
                )
        axes = jnp.stack(axes, axis=0)  # (15,N,O,O,3)
        nb = jnp.linalg.norm(axes, axis=-1)
        valid = nb > 1e-6
        axes = axes / jnp.maximum(nb, 1e-6)[..., None]

        # projection radii with the TRUE half extents on both frames
        Ri = R[:, :, None]  # (N,O,1,3,3)
        Rj = R[:, None, :]
        half_i = half[:, :, None]  # (N,O,1,3)
        half_j = half[:, None, :]
        ri = jnp.sum(
            half_i[None] * jnp.abs(
                jnp.einsum(
                    "anopc,nopcl->anopl",
                    axes,
                    jnp.broadcast_to(Ri, shp + (3, 3)),
                )
            ),
            axis=-1,
        )
        rj = jnp.sum(
            half_j[None] * jnp.abs(
                jnp.einsum("anopc,nopcl->anopl", axes, jnp.broadcast_to(Rj, shp + (3, 3)))
            ), axis=-1,
        )
        sep = jnp.sum(axes * d[None], axis=-1)  # (15,N,O,O)
        pen = jnp.where(valid, ri + rj - jnp.abs(sep), jnp.inf)
        pair = free[:, :, None] & free[:, None, :] & ~eye
        active = pair & jnp.all(pen > 0.0, axis=0) & (
            jnp.min(pen, axis=0) < 1e9
        )
        which = jnp.argmin(pen, axis=0)  # (N,O,O)
        pmin = jnp.min(pen, axis=0)
        sgn = jnp.where(sep >= 0, 1.0, -1.0)[..., None]
        nrm = jnp.take_along_axis(
            axes * sgn, which[None, ..., None].astype(jnp.int32), axis=0
        )[0]  # (N,O,O,3) pushes i away from j

        # positional split: anchored bodies act kinematic (v5 logic, with
        # "support" now defined by a mostly-vertical contact normal)
        hw_y = jnp.sum(jnp.abs(R[..., 1, :]) * half, axis=-1)  # world AABB hy
        base = ~free | (p[..., 1] <= fy_c + hw_y + 1e-3)
        support = active & (nrm[..., 1] > 0.7)
        sup_anchored = base | jnp.any(support & base[:, None, :], axis=2)
        ai = base[:, :, None]
        aj = sup_anchored[:, None, :]
        wgt = jnp.where(aj & ~ai, 1.0, jnp.where(ai & ~aj, 0.0, 0.5))
        corr = jnp.sum(
            jnp.where(active[..., None], (wgt * pmin)[..., None] * nrm, 0.0),
            axis=2,
        )
        p = p + corr

        def closest_on_full(x_rel, Rb, halfb, pb):
            """Closest point on box (Rb, halfb) centered at pb to the
            point pb + x_rel, in full 3D local coordinates."""
            l = jnp.einsum("...kc,...k->...c", Rb, x_rel)  # R^T x
            lc = jnp.clip(l, -halfb, halfb)
            return pb + jnp.einsum("...cl,...l->...c", Rb, lc)

        pi = p[:, :, None, :]
        pj = p[:, None, :, :]
        cp_j = closest_on_full(
            d, jnp.broadcast_to(Rj, shp + (3, 3)),
            jnp.broadcast_to(half_j, shp + (3,)), pj,
        )
        cp_i = closest_on_full(
            -d, jnp.broadcast_to(Ri, shp + (3, 3)),
            jnp.broadcast_to(half_i, shp + (3,)), pi,
        )
        c = 0.5 * (cp_i + cp_j)
        r_i = c - pi
        r_j = c - pj
        vr = (v[:, :, None, :] + jnp.cross(wv[:, :, None, :], r_i)) - (
            v[:, None, :, :] + jnp.cross(wv[:, None, :, :], r_j)
        )
        vn = jnp.sum(vr * nrm, axis=-1)
        mi = jnp.where(free, 1.0, 0.0)
        rxn_i = jnp.cross(r_i, nrm)
        rxn_j = jnp.cross(r_j, nrm)
        ang_i = jnp.sum(
            jnp.cross(jnp.einsum("noab,nopb->nopa", iw, rxn_i), r_i) * nrm, -1
        )
        ang_j = jnp.sum(
            jnp.cross(jnp.einsum("npab,nopb->nopa", iw, rxn_j), r_j) * nrm, -1
        )
        k_n = (
            mi[:, :, None]
            + mi[:, None, :]
            + ang_i * mi[:, :, None]
            + ang_j * mi[:, None, :]
        )
        jn = jnp.where(active & (vn < 0.0), -vn / jnp.maximum(k_n, 1e-6), 0.0)
        Ji = jn[..., None] * nrm
        v = v + mi[..., None] * jnp.sum(Ji, axis=2)
        wv = wv + mi[..., None] * jnp.einsum(
            "noab,nob->noa", iw, jnp.sum(jnp.cross(r_i, Ji), axis=2)
        )
        return p, v, wv, jnp.any(support, axis=2)

    def robot_pushout(p, v, half_c, u_c, w_c, force, wv=None, iw=None,
                      sdt_c=None):
        """Robot cylinder vs OBB nearest footprint point -> pseudo force.

        Contacts v5 (wv/iw given): in addition to the positional pushout,
        a normal impulse is applied AT the contact point (nearest surface
        point, at the midpoint of the cylinder/box vertical overlap), so a
        robot ramming a standing box torques it about its support — it tips
        instead of only sliding (reference: Bullet resolves robot-box
        contacts with full rigid-body response)."""
        da = p - agent_pos[:, None, :]
        in_h = jnp.abs(da[..., 1]) < 1.2
        da_xz = da[..., jnp.array([0, 2])]
        lx = -jnp.sum(da_xz * u_c, -1)
        lz = -jnp.sum(da_xz * w_c, -1)
        nearx = jnp.clip(lx, -half_c[..., 0], half_c[..., 0])
        nearz = jnp.clip(lz, -half_c[..., 2], half_c[..., 2])
        gap = jnp.sqrt((lx - nearx) ** 2 + (lz - nearz) ** 2)
        pen_a = jnp.where(free & in_h, AGENT_RADIUS - gap, 0.0)
        hit_a = pen_a > 0.0
        dlen = jnp.sqrt(jnp.sum(da_xz**2, -1))
        nx = da_xz[..., 0] / jnp.maximum(dlen, 1e-6)
        nz = da_xz[..., 1] / jnp.maximum(dlen, 1e-6)
        p = p.at[..., 0].add(jnp.where(hit_a, pen_a * nx, 0.0))
        p = p.at[..., 2].add(jnp.where(hit_a, pen_a * nz, 0.0))
        force = force + FORCE_K * jnp.sum(
            jnp.where(hit_a, pen_a, 0.0), axis=1
        )
        if wv is None:
            return p, v, None, force
        # ---- contacts v5: lever-arm impulse at the contact point ---------
        zero = jnp.zeros_like(pen_a)
        u3 = jnp.stack([u_c[..., 0], zero, u_c[..., 1]], axis=-1)
        w3 = jnp.stack([w_c[..., 0], zero, w_c[..., 1]], axis=-1)
        y_lo = jnp.maximum(
            p[..., 1] - half_c[..., 1], agent_pos[:, None, 1] - 1.2
        )
        y_hi = jnp.minimum(
            p[..., 1] + half_c[..., 1], agent_pos[:, None, 1] + 1.2
        )
        cp = p + nearx[..., None] * u3 + nearz[..., None] * w3
        cp = cp.at[..., 1].set(0.5 * (y_lo + y_hi))
        r = cp - p
        n3 = jnp.stack([nx, zero, nz], axis=-1)  # pushes box away from agent
        vn = jnp.sum((v + jnp.cross(wv, r)) * n3, -1)
        vn_t = jnp.where(hit_a, 0.5 * pen_a / sdt_c, 0.0)  # separating speed
        rxn = jnp.cross(r, n3)
        ang = jnp.sum(
            jnp.cross(jnp.einsum("noab,nob->noa", iw, rxn), r) * n3, -1
        )
        k_n = 1.0 + jnp.maximum(ang, 0.0)
        jn = jnp.where(
            hit_a & (vn < vn_t), (vn_t - vn) / jnp.maximum(k_n, 1e-6), 0.0
        )
        Jv = jn[..., None] * n3
        v = v + Jv
        wv = wv + jnp.einsum("noab,nob->noa", iw, jnp.cross(r, Jv))
        return p, v, wv, force

    def robot_pushout_obb(p, v, q, wv, iw, force, sdt_c):
        """Contacts v6: robot vertical-cylinder vs the TRUE rotated box.

        Closest point between the robot's axis segment and the full OBB by
        ternary search on the (convex) squared point-to-box distance along
        the axis (16 unrolled halvings, batched over (N, O)); pushout,
        pseudo force, and the v5 lever-arm impulse all act at the true
        closest surface point — replacing the upright-OBB footprint cover
        (reference: Bullet resolves robot-box contacts against the real
        collision shape)."""
        R = rigid.quat_to_matrix(q)  # (N,O,3,3)
        rel = agent_pos[:, None, :] - p  # box-center -> agent base
        a0 = jnp.einsum("...kc,...k->...c", R, rel)  # R^T rel (local)
        dL = R[..., 1, :]  # R^T ŷ: world +y in box frame

        def fdist(t):
            l = a0 + t[..., None] * dL
            cl = jnp.clip(l, -half, half)
            return jnp.sum((l - cl) ** 2, axis=-1)

        lo = jnp.full(p.shape[:-1], -1.2, jnp.float32)
        hi = jnp.full(p.shape[:-1], 1.2, jnp.float32)
        for _ in range(16):
            m1 = lo + (hi - lo) / 3.0
            m2 = hi - (hi - lo) / 3.0
            f1, f2 = fdist(m1), fdist(m2)
            pick1 = f1 < f2
            hi = jnp.where(pick1, m2, hi)
            lo = jnp.where(pick1, lo, m1)
        t_s = 0.5 * (lo + hi)
        l_s = a0 + t_s[..., None] * dL
        c_local = jnp.clip(l_s, -half, half)
        cb = p + jnp.einsum("...cl,...l->...c", R, c_local)  # world box pt
        aw = agent_pos[:, None, :] + jnp.stack(
            [jnp.zeros_like(t_s), t_s, jnp.zeros_like(t_s)], axis=-1
        )
        dxz = (cb - aw)[..., jnp.array([0, 2])]
        dlen = jnp.sqrt(jnp.sum(dxz**2, -1))
        # degenerate (axis inside the box): push along center-to-center
        ctr_xz = (p - agent_pos[:, None, :])[..., jnp.array([0, 2])]
        clen = jnp.sqrt(jnp.sum(ctr_xz**2, -1))
        use_ctr = dlen < 1e-5
        nxz = jnp.where(
            use_ctr[..., None],
            ctr_xz / jnp.maximum(clen, 1e-6)[..., None],
            dxz / jnp.maximum(dlen, 1e-6)[..., None],
        )
        pen_a = jnp.where(free, AGENT_RADIUS - dlen, 0.0)
        # vertical gate: the ternary search minimizes 3D distance, so when
        # the box overlaps the cylinder's height span the optimum has
        # cb_y == aw_y; a residual y gap means the box is above/below the
        # robot and the xz distance alone must not trigger contact
        in_h = jnp.abs(cb[..., 1] - aw[..., 1]) < 1e-2
        hit_a = (pen_a > 0.0) & in_h
        n3 = jnp.stack(
            [nxz[..., 0], jnp.zeros_like(dlen), nxz[..., 1]], axis=-1
        )
        p = p + jnp.where(hit_a[..., None], pen_a[..., None] * n3, 0.0)
        force = force + FORCE_K * jnp.sum(jnp.where(hit_a, pen_a, 0.0), 1)
        r = cb - p
        vn = jnp.sum((v + jnp.cross(wv, r)) * n3, -1)
        vn_t = jnp.where(hit_a, 0.5 * pen_a / sdt_c, 0.0)
        rxn = jnp.cross(r, n3)
        ang = jnp.sum(
            jnp.cross(jnp.einsum("noab,nob->noa", iw, rxn), r) * n3, -1
        )
        k_n = 1.0 + jnp.maximum(ang, 0.0)
        jn = jnp.where(
            hit_a & (vn < vn_t), (vn_t - vn) / jnp.maximum(k_n, 1e-6), 0.0
        )
        Jv = jn[..., None] * n3
        v = v + Jv
        wv = wv + jnp.einsum("noab,nob->noa", iw, jnp.cross(r, Jv))
        return p, v, wv, force

    if quat is not None:
        # ---- contacts v4: rotational floor + translational box-box -------
        q, wv = quat, omega
        hy0 = half[..., 1]
        center_off = jnp.stack(
            [jnp.zeros_like(hy0), hy0, jnp.zeros_like(hy0)], axis=-1
        )
        p = obj_pos + center_off
        v = obj_vel
        for _ in range(n_substeps):
            p, v, q, wv = rigid.box_floor_substep(
                p, v, q, wv, half, free, floor_y, sdt, g=g
            )
            yaw_eff, half_eff = rigid.effective_upright_obb(q, half)
            iw = rigid.world_inertia_inv(q, half)
            cy, sy = jnp.cos(yaw_eff), jnp.sin(yaw_eff)
            u_c = jnp.stack([cy, -sy], axis=-1)
            w_c = jnp.stack([sy, cy], axis=-1)
            # contacts v6: box-box pairs use the FULL 15-axis OBB SAT on
            # true orientations (the upright-OBB cover remains only for
            # the robot-cylinder pushout below)
            p, v, wv, supported = sat_boxbox_obb(p, v, q, wv, half, iw)
            v = jnp.where(
                supported[..., None], v * jnp.array([0.2, 0.0, 0.2]), v
            )
            # contacts v6: robot contact against the TRUE rotated box
            p, v, wv, force = robot_pushout_obb(
                p, v, q, wv, iw, force, sdt
            )
        return (
            p - center_off,
            jnp.where(freem, v, 0.0),
            force,
            q,
            jnp.where(freem, wv, 0.0),
        )

    # ---- contacts v3: upright OBBs (kinematic-plus fast mode) -------------
    hy = half[..., 1]
    cy, sy = jnp.cos(yaw_o), jnp.sin(yaw_o)
    u = jnp.stack([cy, -sy], axis=-1)  # (N,O,2)
    w = jnp.stack([sy, cy], axis=-1)
    center_off = jnp.stack(
        [jnp.zeros_like(hy), hy, jnp.zeros_like(hy)], axis=-1
    )
    p = obj_pos + center_off
    v = obj_vel
    for _ in range(n_substeps):
        v = jnp.where(freem, v.at[..., 1].add(-g * sdt), 0.0)
        p = jnp.where(freem, p + v * sdt, p)
        p, v, _, supported = sat_boxbox(p, v, half, hy, u, w, True)
        # floor/support: ground clamp; friction kills horizontal motion on
        # the floor AND on top of a supporting box
        fy = fy_c + hy
        on_ground = p[..., 1] <= fy + 1e-4
        p = p.at[..., 1].set(jnp.maximum(p[..., 1], fy))
        v = jnp.where(
            (on_ground | supported)[..., None],
            v * jnp.array([0.2, 0.0, 0.2]),  # friction + no bounce
            v,
        )
        p, v, _, force = robot_pushout(p, v, half, u, w, force)

    return p - center_off, jnp.where(freem, v, 0.0), force


# discrete kinematic action set (abstract-grasp mode)
A_STOP, A_FWD, A_LEFT, A_RIGHT, A_GRAB = 0, 1, 2, 3, 4
REARRANGE_ACTION_NAMES = ("stop", "move_forward", "turn_left", "turn_right", "grab_release")


class RearrangeBatchedEnv:
    """N batched kinematic rearrange envs.

    task: "pick" (success = holding the target object), "place" (success =
    target object at its goal and released), "rearrange" (all targets at
    goals), "empty" (no objective — RearrangeEmptyTask-v0 parity).
    """

    def __init__(
        self,
        pack: ScenePack,
        table: RearrangeTable,
        episode_order: np.ndarray,
        *,
        task: str = "pick",
        max_episode_steps: int = 300,
        grasp_distance: float = 1.0,
        at_goal_thresh: float = 0.15,
        success_reward: float = 10.0,
        slack_reward: float = -0.01,
        dist_reward_scale: float = 1.0,
        forward_step: float = 0.25,
        turn_angle_deg: float = 10.0,
        render_size: Optional[Tuple[int, int]] = (128, 128),
        with_visual: bool = True,
        continuous: bool = False,
        dynamics: str = "kinematic",  # kinematic | gravity
        control: Optional[str] = None,  # discrete | continuous | arm | arm_ee
        robot: str = "FetchRobot",
        max_joint_delta: float = 0.1,  # rad per step (ArmRelPosAction scale)
        arm_dynamics: bool = False,  # PD motors + gravity (ArmRelPosAction)
        #   vs direct kinematic joint set (ArmRelPosKinematicAction)
        ee_delta: float = 0.06,  # m per step (ArmEEAction scale)
        arm_grasp_distance: float = 0.25,
        max_accum_force: float = -1.0,  # >0 enables ForceTerminate semantics
        # reference RearrangeTask flags (default_structured_configs.py:
        # 1489-1490; defaults True/False there). Off by default here so the
        # kinematic abstract-grasp tasks keep their semantics unless a
        # config asks for constraint physics.
        constraint_violation_ends_episode: bool = False,
        constraint_violation_drops_object: bool = False,
        sensor_keys: Optional[Tuple[str, ...]] = None,
        measure_keys: Optional[Tuple[str, ...]] = None,
        # registry-resolved task actions (tasks/rearrange/task_actions.py):
        # when given, the flat action vector is the declaration-ordered
        # concatenation of each spec's slice (reference gym flattening,
        # gym_wrapper.py:102-161) and step_fn composes their contributions
        action_specs: Optional[list] = None,
        # PDDL domain for GlobalPredicatesSensor grounding (reference
        # habitat.task.pddl_domain_def; "fp" | "tpu_rearrange" | a path).
        pddl_domain: str = "fp",
    ):
        self.pack = pack
        self.table = table
        self.order = jnp.asarray(episode_order, jnp.int32)
        self.num_envs = int(episode_order.shape[0])
        self._order_len = int(episode_order.shape[1])
        self.task = task
        self.dynamics = dynamics
        self.max_accum_force = max_accum_force
        self.cv_ends_episode = constraint_violation_ends_episode
        self.cv_drops_object = constraint_violation_drops_object
        self.max_episode_steps = max_episode_steps
        self.grasp_distance = grasp_distance
        self.at_goal_thresh = at_goal_thresh
        self.success_reward = success_reward
        self.slack_reward = slack_reward
        self.dist_reward_scale = dist_reward_scale
        self.fwd = forward_step
        self.turn = float(np.deg2rad(turn_angle_deg))
        self.with_visual = with_visual and render_size is not None
        self.render_size = render_size
        self.num_objects = int(table.obj_init.shape[1])
        if control is None:
            control = "continuous" if continuous else "discrete"
        self.control = control
        self.continuous = control != "discrete"
        # articulated agent: fixed-topology FK chain (reference Manipulator,
        # articulated_agents/manipulator.py:79-120 — URDF+Bullet there, a
        # batched serial-chain FK here; joint state lives in the env pytree)
        self.rparams = ROBOTS[robot]
        self.n_joints = self.rparams.arm_joints
        self.max_joint_delta = max_joint_delta
        self.arm_dynamics = arm_dynamics
        self._arm_dyn = arm_dyn.default_arm_dynamics(
            self.rparams, kp=300.0, kd=30.0
        )
        self.ee_delta = ee_delta
        self._resting = jnp.asarray(self.rparams.resting_pose, jnp.float32)
        self._arm_root = jnp.asarray(self.rparams.arm_root_offset, jnp.float32)
        # resting EE in the agent frame (RelativeRestingPositionSensor origin)
        self._resting_ee_local = (
            kin.ee_position(self.rparams, self._resting) + self._arm_root
        )
        if control in ("arm", "arm_ee"):
            self.grasp_distance = arm_grasp_distance

        self.action_specs = list(action_specs) if action_specs else None
        # hab3 multi-agent: agent_1_* action specs drive a kinematic
        # humanoid lane (reference hssd_spot_human.yaml declares per-agent
        # prefixed actions; the humanoid is an AGENT here, not env script)
        self.with_humanoid = bool(self.action_specs) and any(
            s.agent_idx >= 1 for s in self.action_specs
        )
        # GlobalPredicatesSensor / MultiAgentGlobalPredicatesSensor
        # (reference multi_task/pddl_sensors.py:25-57, multi_agent_sensors.py
        # :121-156): ground every type-compatible predicate over the env's
        # entity universe once at construction; is_true evaluates batched
        # in-jit. Built when the declared sensors ask for it, or always on
        # multi-agent envs (plan_pop.yaml declares all_predicates).
        want_preds = self.with_humanoid or any(
            k in ("all_predicates", "multi_agent_all_predicates")
            for k in (sensor_keys or ())
        )
        self._grounded_preds = (
            self._ground_all_predicates(pddl_domain) if want_preds else None
        )
        # extra reference sensors emitted only when declared (the default
        # obs layout of existing single-agent envs stays unchanged)
        self._extra_sensors = tuple(
            k
            for k in (
                "obj_goal_pos_sensor",
                "initial_gps_compass_sensor",
                "nav_to_skill_sensor",
            )
            if k in (sensor_keys or ())
        )
        if self.action_specs is not None:
            # composed registry-resolved actions: flat Box in declaration
            # order; grasp uses suction semantics when any grip slice exists
            total = sum(s.dims(self) for s in self.action_specs)
            self.action_space = spaces.Box(
                -np.inf, np.inf, (max(total, 1),), np.float32
            )
            self.action_names = tuple(s.name or type(s).__name__ for s in self.action_specs)
        elif control == "arm":
            # ArmAction composite: 7 joint deltas + grip + base (lin, ang) —
            # reference ArmRelPosAction + MagicGraspAction + BaseVelAction
            # (tasks/rearrange/actions/actions.py:102,167-238,434;
            # grip_actions.py:38)
            self.action_space = spaces.Box(
                -1.0, 1.0, (self.n_joints + 3,), np.float32
            )
            self.action_names = ("arm_action", "base_velocity")
        elif control == "arm_ee":
            # ArmEEAction: 3D EE displacement solved by DLS-IK + grip + base
            # (reference actions.py:738 + IkHelper)
            self.action_space = spaces.Box(-1.0, 1.0, (6,), np.float32)
            self.action_names = ("arm_ee_action", "base_velocity")
        elif control == "continuous":
            # (lin_vel, ang_vel, grip) in [-1,1] — reference BaseVelAction +
            # grip composite (tasks/rearrange/actions/actions.py:434 +
            # grip_actions.py); HabGymWrapper's flattened Box equivalent
            self.action_space = spaces.Box(-1.0, 1.0, (3,), np.float32)
            self.action_names = ("base_velocity", "grip")
        else:
            self.action_space = spaces.Discrete(len(REARRANGE_ACTION_NAMES))
            self.action_names = REARRANGE_ACTION_NAMES
        obs_spaces: Dict[str, spaces.Space] = {
            "obj_start_sensor": spaces.Box(-np.inf, np.inf, (3,), np.float32),
            "obj_goal_sensor": spaces.Box(-np.inf, np.inf, (3,), np.float32),
            "abs_obj_start_sensor": spaces.Box(-np.inf, np.inf, (3,), np.float32),
            "abs_obj_goal_sensor": spaces.Box(-np.inf, np.inf, (3,), np.float32),
            "joint": spaces.Box(-np.inf, np.inf, (self.n_joints,), np.float32),
            "joint_vel": spaces.Box(-np.inf, np.inf, (self.n_joints,), np.float32),
            "is_holding": spaces.Box(0, 1, (1,), np.float32),
            "ee_pos": spaces.Box(-np.inf, np.inf, (3,), np.float32),
            "relative_resting_position": spaces.Box(-np.inf, np.inf, (3,), np.float32),
            "localization_sensor": spaces.Box(-np.inf, np.inf, (4,), np.float32),
            "obj_start_gps_compass": spaces.Box(-np.inf, np.inf, (2,), np.float32),
            "obj_goal_gps_compass": spaces.Box(-np.inf, np.inf, (2,), np.float32),
        }
        if self._grounded_preds is not None:
            P = len(self._grounded_preds)
            obs_spaces["all_predicates"] = spaces.Box(0, 1, (P,), np.float32)
            obs_spaces["multi_agent_all_predicates"] = spaces.Box(
                0, 1, (P,), np.float32
            )
        if "obj_goal_pos_sensor" in self._extra_sensors:
            obs_spaces["obj_goal_pos_sensor"] = spaces.Box(
                -np.inf, np.inf, (3,), np.float32
            )
        if "initial_gps_compass_sensor" in self._extra_sensors:
            obs_spaces["initial_gps_compass_sensor"] = spaces.Box(
                -np.inf, np.inf, (2,), np.float32
            )
        if "nav_to_skill_sensor" in self._extra_sensors:
            obs_spaces["nav_to_skill_sensor"] = spaces.Box(
                0, 1, (8,), np.float32
            )
        if self.with_visual:
            h, w = render_size
            obs_spaces["robot_head_depth"] = spaces.Box(0, 1, (h, w, 1), np.float32)
            obs_spaces["robot_head_rgb"] = spaces.Box(0, 255, (h, w, 3), np.uint8)
        self.observation_space = spaces.Dict(obs_spaces)
        if self.with_humanoid:
            # prefixed multi-agent layout: derive spaces from the traced
            # observation shapes so the space can't drift from the impl
            st0 = jax.eval_shape(self._fresh_state_struct)
            shapes = jax.eval_shape(self._observations, st0)
            self.observation_space = spaces.Dict(
                {
                    k: spaces.Box(
                        -np.inf, np.inf, tuple(v.shape[1:]), np.dtype(v.dtype)
                    )
                    for k, v in shapes.items()
                }
            )

        # registry contract (reference embodied_task.py:275-292): declared
        # lab_sensors/measurements control EXACTLY what the env emits. The
        # superset key sets are derived by abstract evaluation (eval_shape
        # traces without compute), so validation can't drift from the
        # implementation; unknown keys raise here, at construction.
        self.sensor_keys = tuple(sensor_keys) if sensor_keys is not None else None
        self.measure_keys = (
            tuple(measure_keys) if measure_keys is not None else None
        )
        if self.sensor_keys is not None or self.measure_keys is not None:
            st = jax.eval_shape(self._fresh_state_struct)
            if self.sensor_keys is not None:
                avail = set(jax.eval_shape(self._observations, st))
                bad = [k for k in self.sensor_keys if k not in avail]
                if bad:
                    raise ValueError(
                        f"declared sensors {bad} are not available on this "
                        f"env (task={self.task}); available: {sorted(avail)}"
                    )
                self.observation_space = spaces.Dict(
                    {
                        k: v
                        for k, v in obs_spaces.items()
                        if k in self.sensor_keys
                    }
                )
            if self.measure_keys is not None:
                avail = set(jax.eval_shape(self._measures, st))
                avail |= set(self._posthoc_measure_keys())
                bad = [k for k in self.measure_keys if k not in avail]
                if bad:
                    raise ValueError(
                        f"declared measures {bad} are not available on this "
                        f"env (task={self.task}); available: {sorted(avail)}"
                    )
        self._jit_reset = jax.jit(self.reset_fn)
        self._jit_step = jax.jit(self.step_fn, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _ground_all_predicates(self, pddl_domain: str):
        """Reference GlobalPredicatesSensor universe (pddl_domain.py:420-439):
        all type-compatible groundings over constants + the env's entities —
        movable targets, their goals, articulated receptacles, robots —
        sorted by compact_str. Entity order puts objects before robots so
        (obj, robot)-style signatures ground (combinations, not perms)."""
        import os as _os

        from habitat_tpu.tasks.rearrange.multi_task.pddl_yaml import (
            GOAL_TYPE,
            MOVABLE_TYPE,
            ROBOT_TYPE,
            PddlEntity,
            YamlPddlDomain,
        )

        name = str(pddl_domain or "fp")
        if not name.endswith(".yaml"):
            base = _os.path.join(
                _os.path.dirname(
                    _os.path.abspath(
                        __import__(
                            "habitat_tpu.tasks.rearrange.multi_task.pddl_yaml",
                            fromlist=["__file__"],
                        ).__file__
                    )
                ),
                "domain_configs",
            )
            path = _os.path.join(base, f"{name}.yaml")
            if not _os.path.exists(path):
                path = _os.path.join(base, "fp.yaml")
        else:
            path = name
        dom = YamlPddlDomain.from_yaml(path)
        ents = {}
        O = self.num_objects
        for i in range(O):
            ents[f"any_targets|{i}"] = PddlEntity(
                f"any_targets|{i}", MOVABLE_TYPE
            )
        for i in range(O):
            ents[f"TARGET_any_targets|{i}"] = PddlEntity(
                f"TARGET_any_targets|{i}", GOAL_TYPE
            )
        is_rev = np.asarray(self.table.art_is_revolute)
        for j in range(int(self.table.art_pos.shape[1])):
            t = "fridge_type" if bool(is_rev[:, j].any()) else "cab_type"
            if t == "fridge_type" and not dom.types.is_subtype(
                t, "art_receptacle_entity_type"
            ):
                t = "cab_type"
            ent = PddlEntity(f"art_{j}", t)
            ents[ent.name] = ent
            dom.art_slots.setdefault(ent.name, j)
        ents["robot_0"] = PddlEntity("robot_0", ROBOT_TYPE)
        if self.with_humanoid:
            ents["robot_1"] = PddlEntity("robot_1", ROBOT_TYPE)
        return tuple(dom.get_possible_predicates(ents))

    def _predicate_vector(self, state) -> jnp.ndarray:
        """(N, P) f32 truth values, one lane per grounded predicate."""
        vals = [
            p.is_true(self, state).astype(jnp.float32).reshape(self.num_envs)
            for p in self._grounded_preds
        ]
        return jnp.stack(vals, axis=-1)

    # ------------------------------------------------------------------
    def _sid(self, state) -> jnp.ndarray:
        return self.table.nav.scene_idx[state.ep_idx]

    def _arm_mode(self) -> bool:
        return self.control in ("arm", "arm_ee")

    @property
    def capabilities(self) -> Tuple[str, ...]:
        """Capability tags the registry specs validate against."""
        return (self.task, self.control, self.dynamics)

    def _fresh_state_struct(self):
        """Abstract state for eval_shape-based key-set discovery."""
        key = jax.random.PRNGKey(0)
        ep_idx = jnp.zeros((self.num_envs,), jnp.int32)
        return self._fresh(ep_idx, key)

    def _posthoc_measure_keys(self) -> Tuple[str, ...]:
        """Measure keys injected in step_fn after _measures (violation +
        reward-measure names + bad_called_terminate)."""
        reward_key = {
            "pick": "pick_reward",
            "place": "place_reward",
            "reach": "rearrange_reach_reward",
            "open": "art_obj_reward",
            "close": "art_obj_reward",
            "nav_to_obj": "nav_to_obj_reward",
            "rearrange": "move_objects_reward",
        }.get(self.task)
        keys = [
            "constraint_violation",
            "did_violate_hold_constraint",
            "bad_called_terminate",
        ]
        if reward_key:
            keys.append(reward_key)
        if self.task == "rearrange":
            keys.append("pddl_subgoal_reward")
        return tuple(keys)

    def _filter_measures(self, m):
        if self.measure_keys is None:
            return m
        return {k: m[k] for k in self.measure_keys if k in m}

    def _ee_local(self, joints) -> jnp.ndarray:
        """(N,J) joints -> (N,3) EE in the agent frame (FK over the chain)."""
        return jax.vmap(functools.partial(kin.ee_position, self.rparams))(
            joints
        ) + self._arm_root

    def _ee_pos(self, state) -> jnp.ndarray:
        if self._arm_mode():
            local = self._ee_local(state.joints)
            return state.pos + rotate_agent_to_world(local, state.yaw)
        off = rotate_agent_to_world(
            jnp.broadcast_to(EE_OFFSET, state.pos.shape), state.yaw
        )
        return state.pos + off

    def _held_obj_pos(self, state) -> jnp.ndarray:
        return self._ee_pos(state)

    def _target_obj(self, state) -> jnp.ndarray:
        return self.table.pick_target[state.ep_idx]

    def _handle_pos(self, state) -> jnp.ndarray:
        """(N,3) world position of the target handle: drawer front face at
        its current extension (prismatic) or the free edge of the door swung
        by q about the vertical hinge (revolute fridge, reference
        open_fridge/close_fridge)."""
        n_idx = jnp.arange(self.num_envs)
        a = self.table.art_target[state.ep_idx]
        base = self.table.art_pos[state.ep_idx, a]
        axis = self.table.art_axis[state.ep_idx, a]
        q = state.art_q[n_idx, a]
        prism = base + axis * (q[:, None] + 0.3)
        cq, sq = jnp.cos(q), jnp.sin(q)
        door = jnp.stack(
            [
                cq * axis[:, 0] + sq * axis[:, 2],
                axis[:, 1],
                -sq * axis[:, 0] + cq * axis[:, 2],
            ],
            axis=-1,
        )
        rev = base + door * DOOR_LEN
        is_rev = self.table.art_is_revolute[state.ep_idx, a]
        return jnp.where(is_rev[:, None], rev, prism) + jnp.array([0.0, 0.5, 0.0])

    def _obj_world(self, state) -> jnp.ndarray:
        """(N,O,3) object positions with the held one following the agent."""
        held = state.held  # (N,)
        carry_pos = self._held_obj_pos(state)  # (N,3)
        o_idx = jnp.arange(self.num_objects)[None, :]
        is_held = o_idx == held[:, None]
        out = jnp.where(is_held[..., None], carry_pos[:, None, :], state.obj_pos)
        if self.with_humanoid:
            # object carried by the humanoid rides at its hand height
            h_carry = state.human_pos + jnp.array([0.0, 0.8, 0.0])
            h_carry = h_carry + yaw_to_forward(state.human_yaw) * 0.3
            h_held = o_idx == state.human_held[:, None]
            out = jnp.where(h_held[..., None], h_carry[:, None, :], out)
        return out

    def _reach_target(self, state) -> jnp.ndarray:
        """(N,3) per-episode random EE goal in the arm workspace, AGENT frame
        (reference RearrangeReachTask.reset samples the ee_constraint box
        scaled by ee_sample_factor, sub_tasks/reach_task.py:29-55).
        Deterministic in the episode index, so it lives in no state field."""
        keys = jax.vmap(
            lambda e: jax.random.fold_in(jax.random.PRNGKey(4321), e)
        )(state.ep_idx)
        off = jax.vmap(
            lambda k: jax.random.uniform(k, (3,), minval=-1.0, maxval=1.0)
        )(keys)
        return self._resting_ee_local + off * jnp.array([0.2, 0.2, 0.2])

    # -- observations ---------------------------------------------------
    def _observations(self, state: RearrangeState) -> Dict[str, jnp.ndarray]:
        tgt = self._target_obj(state)  # (N,)
        objs = self._obj_world(state)
        n_idx = jnp.arange(self.num_envs)
        tgt_pos = objs[n_idx, tgt]  # (N,3)
        goal_pos = self.table.target_pos[state.ep_idx, tgt]
        ee = self._ee_pos(state)

        # sensors in agent frame (reference rearrange_sensors.py:51-468 —
        # TargetStartSensor/GoalSensor give transformed positions)
        rel = lambda p: rotate_world_to_agent(p - state.pos, state.yaw)
        # the "desired resting" target: the resting pose, except for the
        # reach task where it is the per-episode workspace goal (reference
        # RearrangeReachTask.reset, sub_tasks/reach_task.py:29-55)
        desired_rest = (
            self._reach_target(state)
            if self.task == "reach"
            else self._resting_ee_local
        )
        # polar (rho, phi) of a RELATIVE agent-frame position (reference
        # PositionGpsCompassSensor._get_positions -> compute_pointgoal,
        # rearrange_sensors.py:114-141; forward is -z here)
        def gps_compass(rel_p):
            rho = jnp.linalg.norm(rel_p[:, jnp.array([0, 2])], axis=-1)
            phi = jnp.arctan2(rel_p[:, 0], -rel_p[:, 2])
            return jnp.stack([rho, -phi], axis=-1).astype(jnp.float32)

        rel_start = rel(tgt_pos)
        rel_goal = rel(goal_pos)
        obs = {
            "obj_start_sensor": rel_start.astype(jnp.float32),
            "obj_goal_sensor": rel_goal.astype(jnp.float32),
            # world-frame variants (reference AbsTargetStartSensor/AbsGoalSensor)
            "abs_obj_start_sensor": tgt_pos.astype(jnp.float32),
            "abs_obj_goal_sensor": goal_pos.astype(jnp.float32),
            # live joint state (reference JointSensor, rearrange_sensors.py:51)
            "joint": state.joints.astype(jnp.float32),
            # zero in kinematic modes, live under arm_dynamics (reference
            # JointVelocitySensor reads sim joint velocities)
            "joint_vel": state.joint_vel.astype(jnp.float32),
            "is_holding": (state.held >= 0).astype(jnp.float32)[:, None],
            "ee_pos": rel(ee).astype(jnp.float32),
            # EE relative to the desired resting pose in the agent frame
            # (reference RelativeRestingPositionSensor)
            "relative_resting_position": (
                rel(ee) - desired_rest
            ).astype(jnp.float32),
            # base pos + yaw (reference LocalizationSensor, 4-vector)
            "localization_sensor": jnp.concatenate(
                [state.pos, state.yaw[:, None]], axis=-1
            ).astype(jnp.float32),
            "obj_start_gps_compass": gps_compass(rel_start),
            "obj_goal_gps_compass": gps_compass(rel_goal),
        }
        if self._grounded_preds is not None:
            # GlobalPredicatesSensor truth vector (pddl_sensors.py:25-57);
            # MultiAgentGlobalPredicatesSensor emits the same universe per
            # agent (multi_agent_sensors.py:121-156)
            preds = self._predicate_vector(state)
            obs["all_predicates"] = preds
            obs["multi_agent_all_predicates"] = preds
        if self._extra_sensors:
            # TargetCurrentSensor (rearrange_sensors.py:52-80): target object
            # position in the end-effector frame (EE origin; orientation
            # approximated by the base frame — the batched FK chain carries
            # no full EE rotation matrix in obs)
            if "obj_goal_pos_sensor" in self._extra_sensors:
                obs["obj_goal_pos_sensor"] = rotate_world_to_agent(
                    tgt_pos - ee, state.yaw
                ).astype(jnp.float32)
            # InitialGpsCompassSensor (social_nav_sensors.py:655-695):
            # (rho, -phi) of the current base pos in the episode-start frame
            if "initial_gps_compass_sensor" in self._extra_sensors:
                st_pos = self.table.nav.start_pos[state.ep_idx]
                st_yaw = self.table.nav.start_yaw[state.ep_idx]
                rel_init = rotate_world_to_agent(state.pos - st_pos, st_yaw)
                obs["initial_gps_compass_sensor"] = gps_compass(rel_init)
            # NavToSkillSensor (config default_structured_configs.py:716-718,
            # num_skills one-hot): the skill the oracle plan runs at the nav
            # goal — pick (1) while the target is not held, place (2) after
            if "nav_to_skill_sensor" in self._extra_sensors:
                skill = jnp.where(state.held >= 0, 2, 1)
                obs["nav_to_skill_sensor"] = jax.nn.one_hot(
                    skill, 8, dtype=jnp.float32
                )
        if self.with_visual:
            h, w = self.render_size
            dyn = self._dynamic_geometry(state)
            frames = render_batch(
                self.pack,
                self._sid(state),
                state.pos + jnp.array([0.0, 1.25, 0.0]),
                state.yaw,
                jnp.full((self.num_envs,), -0.45),  # head camera tilts down
                height=h,
                width=w,
                dynamic=dyn,
            )
            obs["robot_head_depth"] = frames["depth"]
            obs["robot_head_rgb"] = frames["rgb"]
        if self.with_humanoid:
            # hab3 multi-agent prefixing (reference RearrangeSim
            # rearrange_sim.py:68-82: agent_{i}_<uuid>): robot sensors under
            # agent_0_, the humanoid's own lane under agent_1_
            def gps_rel(p_self, yaw_self, p_other):
                rel_o = rotate_world_to_agent(p_other - p_self, yaw_self)
                return jnp.stack([-rel_o[:, 2], rel_o[:, 0]], -1).astype(
                    jnp.float32
                )

            h_rel = rotate_world_to_agent(
                tgt_pos - state.human_pos, state.human_yaw
            )
            h_rel_goal = rotate_world_to_agent(
                goal_pos - state.human_pos, state.human_yaw
            )
            dist_ag = jnp.linalg.norm(
                (state.human_pos - state.pos)[:, jnp.array([0, 2])], axis=-1
            )
            within = (dist_ag < 2.0).astype(jnp.float32)[:, None]
            # all_predicates is task-level (unprefixed) in the reference;
            # multi_agent_all_predicates is per-agent prefixed
            preds_ma = obs.pop("all_predicates", None)
            obs.pop("multi_agent_all_predicates", None)
            m_obs = {f"agent_0_{k}": v for k, v in obs.items()}
            if preds_ma is not None:
                m_obs["all_predicates"] = preds_ma
                m_obs["agent_0_multi_agent_all_predicates"] = preds_ma
                m_obs["agent_1_multi_agent_all_predicates"] = preds_ma
            m_obs.update(
                {
                    "agent_1_localization_sensor": jnp.concatenate(
                        [state.human_pos, state.human_yaw[:, None]], -1
                    ).astype(jnp.float32),
                    "agent_1_obj_start_sensor": h_rel.astype(jnp.float32),
                    "agent_1_obj_goal_sensor": h_rel_goal.astype(jnp.float32),
                    "agent_1_is_holding": (state.human_held >= 0).astype(
                        jnp.float32
                    )[:, None],
                    "agent_0_other_agent_gps": gps_rel(
                        state.pos, state.yaw, state.human_pos
                    ),
                    "agent_1_other_agent_gps": gps_rel(
                        state.human_pos, state.human_yaw, state.pos
                    ),
                    "agent_0_agents_within_threshold": within,
                    "agent_1_agents_within_threshold": within,
                }
            )
            return m_obs
        if self.sensor_keys is not None:
            obs = {k: obs[k] for k in self.sensor_keys if k in obs}
        return obs

    def _arm_geometry(self, state) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Arm links as oriented boxes: (N, J*12, 3, 3) world-space triangle
        vertices + (N, J*12) valid. The FK chain's link segments render
        through the dynamic pass (the reference renders the URDF meshes via
        Bullet-transformed scene nodes, rearrange_sim.py:917)."""
        J = self.n_joints
        N = self.num_envs
        pts_local = jax.vmap(functools.partial(kin.fk_positions, self.rparams))(
            state.joints
        )  # (N, J+1, 3) arm-root frame
        pts_agent = pts_local + self._arm_root
        pts_world = state.pos[:, None, :] + rotate_agent_to_world(
            pts_agent, state.yaw[:, None]
        )
        p0 = pts_world[:, :-1]  # (N,J,3)
        p1 = pts_world[:, 1:]
        seg = p1 - p0
        ln = jnp.linalg.norm(seg, axis=-1, keepdims=True)
        u = seg / jnp.maximum(ln, 1e-6)
        up = jnp.array([0.0, 1.0, 0.0])
        alt = jnp.array([1.0, 0.0, 0.0])
        ref = jnp.where(
            (jnp.abs(u @ up) > 0.9)[..., None], alt[None, None], up[None, None]
        )
        v = jnp.cross(u, ref)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)
        w = jnp.cross(u, v)
        r = 0.04  # link radius
        mid = 0.5 * (p0 + p1)
        h = 0.5 * ln
        # 8 corners: mid ± u*h ± v*r ± w*r
        signs = jnp.array(
            [
                [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
            ],
            jnp.float32,
        )  # (8,3) in (u,v,w) coords
        corners = (
            mid[:, :, None, :]
            + signs[None, None, :, 0:1] * u[:, :, None, :] * h[:, :, None, :]
            + signs[None, None, :, 1:2] * v[:, :, None, :] * r
            + signs[None, None, :, 2:3] * w[:, :, None, :] * r
        )  # (N,J,8,3)
        faces = jnp.array(
            [
                [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
                [0, 4, 5], [0, 5, 1], [1, 5, 6], [1, 6, 2],
                [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0],
            ]
        )
        tris = corners[:, :, faces, :]  # (N,J,12,3,3)
        tris = tris.reshape(N, J * 12, 3, 3)
        valid = jnp.ones((N, J * 12), bool)
        return tris, valid

    def _dynamic_geometry(self, state) -> Dict[str, jnp.ndarray]:
        """Movable objects as upright OBBs (the SAME shapes the contact
        solver uses — physics and pixels agree): (N, O*12, 3) triangles
        rebuilt per step."""
        objs = self._obj_world(state)  # (N,O,3)
        corners = jnp.array(
            [
                [-1.0, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
            ]
        )
        faces = jnp.array(
            [
                [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
                [0, 4, 5], [0, 5, 1], [1, 5, 6], [1, 6, 2],
                [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0],
            ]
        )
        unit_tri = corners[faces]  # (12,3,3) unit box
        halves = self.table.obj_half[state.ep_idx]  # (N,O,3)
        scaled = unit_tri[None, None] * halves[:, :, None, None, :]
        # contacts v4: full orientation from the quaternion state (physics
        # and pixels agree — tipped boxes RENDER tipped); upright states
        # reproduce the old yaw rotation exactly (quat_from_yaw convention)
        Rq = rigid.quat_to_matrix(state.obj_quat)  # (N,O,3,3)
        obj_tri = jnp.einsum("noij,noktj->nokti", Rq, scaled)  # (N,O,12,3,3)
        center = objs + jnp.concatenate(
            [jnp.zeros_like(halves[..., :1]), halves[..., 1:2],
             jnp.zeros_like(halves[..., :1])], -1
        )  # sit on floor
        tri = unit_tri * OBJ_HALF  # articulated boxes keep the legacy scale
        # articulated objects render as larger boxes: drawers slide along
        # their axis, fridge doors swing about the vertical hinge
        A = self.table.art_pos.shape[1]
        axis = self.table.art_axis[state.ep_idx]  # (N,A,3)
        q = state.art_q  # (N,A)
        cq, sq = jnp.cos(q), jnp.sin(q)
        door_dir = jnp.stack(
            [
                cq * axis[..., 0] + sq * axis[..., 2],
                axis[..., 1],
                -sq * axis[..., 0] + cq * axis[..., 2],
            ],
            axis=-1,
        )
        is_rev = self.table.art_is_revolute[state.ep_idx][..., None]
        art_center = (
            self.table.art_pos[state.ep_idx]
            + jnp.where(
                is_rev,
                door_dir * (DOOR_LEN * 0.5),
                axis * q[..., None],
            )
            + jnp.array([0.0, 0.4, 0.0])
        )  # (N,A,3)
        art_tri = tri * 3.0  # drawers/doors are ~0.7m boxes
        centers = jnp.concatenate([center, art_center], axis=1)
        tris_all = jnp.concatenate(
            [
                obj_tri,
                jnp.broadcast_to(art_tri, (self.num_envs, A, 12, 3, 3)),
            ],
            axis=1,
        )
        v = centers[:, :, None, None, :] + tris_all  # (N,O+A,12,3,3)
        N = self.num_envs
        v = v.reshape(N, -1, 3, 3)
        valid = jnp.repeat(
            jnp.concatenate(
                [self.table.obj_valid[state.ep_idx], self.table.art_valid[state.ep_idx]],
                axis=1,
            ),
            12,
            axis=1,
        )
        n_dyn = self.num_objects + A
        o_ids = jnp.arange(n_dyn)
        sem = jnp.repeat(
            jnp.broadcast_to(o_ids[None], (N, n_dyn)) + OBJ_SEM_BASE, 12, axis=1
        )
        palette = jnp.asarray(
            np.random.default_rng(7).uniform(0.3, 1.0, (n_dyn, 3)), jnp.float32
        )
        color = jnp.repeat(jnp.broadcast_to(palette[None], (N, n_dyn, 3)), 12, axis=1)
        if self.rparams.leg_joints > 0:
            # legged base (Spot): FK-posed leg segments render through the
            # same dynamic pass — leg_q is load-bearing state
            leg_v, leg_valid = legs_mod.leg_segment_boxes(
                state.pos + jnp.array([0.0, 0.5, 0.0]), state.yaw, state.leg_q
            )
            v = jnp.concatenate([v, leg_v], axis=1)
            valid = jnp.concatenate([valid, leg_valid], axis=1)
            sem = jnp.concatenate(
                [sem, jnp.full((N, leg_v.shape[1]), OBJ_SEM_BASE - 1, sem.dtype)],
                axis=1,
            )
            color = jnp.concatenate(
                [
                    color,
                    jnp.full((N, leg_v.shape[1], 3), 0.85, jnp.float32),
                ],
                axis=1,
            )
        if self._arm_mode():
            # render the real arm through the same dynamic pass
            arm_v, arm_valid = self._arm_geometry(state)
            v = jnp.concatenate([v, arm_v], axis=1)
            valid = jnp.concatenate([valid, arm_valid], axis=1)
            n_arm = arm_v.shape[1]
            sem = jnp.concatenate(
                [sem, jnp.full((N, n_arm), OBJ_SEM_BASE - 1, sem.dtype)], axis=1
            )
            arm_color = jnp.full((N, n_arm, 3), 0.55, jnp.float32)
            color = jnp.concatenate([color, arm_color], axis=1)
        return dict(
            v0=v[:, :, 0],
            e1=v[:, :, 1] - v[:, :, 0],
            e2=v[:, :, 2] - v[:, :, 0],
            valid=valid,
            color=color,
            sem=sem,
        )

    # -- measures ----------------------------------------------------------
    def _measures(self, state: RearrangeState) -> Dict[str, jnp.ndarray]:
        n_idx = jnp.arange(self.num_envs)
        tgt = self._target_obj(state)
        objs = self._obj_world(state)
        tgt_pos = objs[n_idx, tgt]
        goal = self.table.target_pos[state.ep_idx, tgt]
        ee = self._ee_pos(state)
        holding_target = state.held == tgt
        obj_to_goal = jnp.linalg.norm((tgt_pos - goal), axis=-1)
        ee_to_obj = jnp.linalg.norm((tgt_pos - ee), axis=-1)
        # all-targets accounting for full rearrange
        all_d = jnp.linalg.norm(
            self._obj_world(state) - self.table.target_pos[state.ep_idx], axis=-1
        )
        tmask = self.table.target_mask[state.ep_idx]
        at_goal = (all_d < self.at_goal_thresh) & tmask
        frac_at_goal = jnp.sum(at_goal, axis=1) / jnp.maximum(
            jnp.sum(tmask, axis=1), 1
        )
        rel_ee = rotate_world_to_agent(ee - state.pos, state.yaw)
        desired_rest = (
            self._reach_target(state)
            if self.task == "reach"
            else self._resting_ee_local
        )
        measures = {
            "object_to_goal_distance": obj_to_goal,
            "ee_to_object_distance": ee_to_obj,
            # general EE measures (reference EndEffectorToRestDistance /
            # EndEffectorToGoalDistance / BaseToObjectDistance,
            # rearrange_sensors.py:704,579,666)
            "ee_to_rest_distance": jnp.linalg.norm(
                rel_ee - desired_rest, axis=-1
            ),
            "ee_to_goal_distance": jnp.linalg.norm(goal - ee, axis=-1),
            "base_to_object_distance": jnp.linalg.norm(
                (tgt_pos - state.pos)[:, jnp.array([0, 2])], axis=-1
            ),
            "did_pick_object": state.ever_held.astype(jnp.float32),
            "is_holding": (state.held >= 0).astype(jnp.float32),
            "obj_at_goal": at_goal[n_idx, tgt].astype(jnp.float32),
            "objects_at_goal_fraction": frac_at_goal,
            # reference DoesWantTerminate (rearrange_sensors.py:1120)
            "does_want_terminate": state.stop_called.astype(jnp.float32),
            "zero": jnp.zeros((self.num_envs,), jnp.float32),
            # contact mode: accumulated robot-object penetration force
            # (reference RobotForce / ForceTerminate,
            # rearrange_sensors.py:814,918); identically zero in kinematic
            # mode by design
            "robot_force": state.accum_force,
            "force_terminate": (
                (state.accum_force > self.max_accum_force)
                if self.max_accum_force > 0
                else jnp.zeros((self.num_envs,), bool)
            ).astype(jnp.float32),
            "robot_collisions": state.collision_count.astype(jnp.float32),
            "num_steps": state.step.astype(jnp.float32),
        }
        # reference cls_uuid alias (RobotForce.cls_uuid is
        # "articulated_agent_force", rearrange_sensors.py:820)
        measures["articulated_agent_force"] = measures["robot_force"]
        if self.with_humanoid:
            # reference DidAgentsCollide / NumAgentsCollide
            # (multi_agent_sensors.py:18,?)
            d_ag = jnp.linalg.norm(
                (state.human_pos - state.pos)[:, jnp.array([0, 2])], axis=-1
            )
            measures["did_agents_collide"] = (d_ag < 0.5).astype(jnp.float32)
            measures["num_agents_collide"] = measures["did_agents_collide"]
        if self.task in ("open", "close"):
            art_t = self.table.art_target[state.ep_idx]
            q = state.art_q[n_idx, art_t]
            goal_q = self.table.art_goal_q[state.ep_idx]
            handle = self._handle_pos(state)
            measures["art_obj_state"] = q
            measures["art_obj_at_desired_state"] = (
                jnp.abs(q - goal_q) < 0.05
            ).astype(jnp.float32)
            measures["ee_to_marker_dist"] = jnp.linalg.norm(
                (handle - ee)[:, jnp.array([0, 2])], axis=-1
            )
            # reference uuids (art_obj_sensors.py): EndEffectorDistToMarker
            # = "ee_dist_to_marker", ArtObjSuccess = "art_obj_success"
            measures["ee_dist_to_marker"] = measures["ee_to_marker_dist"]
            measures["success"] = measures["art_obj_at_desired_state"]
            measures["art_obj_success"] = measures["success"]
        elif self.task == "reach":
            # EE to the per-episode workspace goal (reference
            # EndEffectorToRestDistance + RearrangeReachSuccess,
            # sub_tasks/reach_sensors.py; succ_thresh default 0.2)
            rel_ee = rotate_world_to_agent(ee - state.pos, state.yaw)
            d_rest = jnp.linalg.norm(rel_ee - self._reach_target(state), axis=-1)
            measures["ee_to_resting_distance"] = d_rest
            measures["rearrange_reach_success"] = (d_rest < 0.2).astype(
                jnp.float32
            )
            measures["success"] = measures["rearrange_reach_success"]
        elif self.task == "pick":
            measures["pick_success"] = holding_target.astype(jnp.float32)
            measures["success"] = measures["pick_success"]
        elif self.task == "place":
            measures["place_success"] = (
                at_goal[n_idx, tgt] & (state.held < 0) & state.ever_held
            ).astype(jnp.float32)
            measures["success"] = measures["place_success"]
        elif self.task == "rearrange":
            measures["success"] = (
                (frac_at_goal >= 1.0) & (state.held < 0)
            ).astype(jnp.float32)
            # composite/PDDL measures (multi_task/composite_sensors.py):
            # PddlSuccess = task solved, PddlStageGoals = fraction of
            # stage predicates satisfied (here: objects at goals)
            measures["pddl_success"] = measures["success"]
            measures["pddl_stage_goals"] = frac_at_goal
        elif self.task == "nav_to_obj":
            # standalone NavToObj (reference sub_tasks/nav_to_obj_task.py +
            # NavToObjSuccess, nav_to_obj_sensors.py: within success
            # distance, LOOKING at the target, and terminated on purpose)
            obj = self._obj_world(state)[n_idx, tgt]
            d_xz = jnp.linalg.norm(
                (obj - state.pos)[:, jnp.array([0, 2])], axis=-1
            )
            rel = rotate_world_to_agent(obj - state.pos, state.yaw)
            ang = jnp.abs(jnp.arctan2(rel[:, 0], -rel[:, 2]))
            measures["rot_dist_to_goal"] = ang
            measures["dist_to_goal"] = d_xz
            measures["nav_to_obj_success"] = (
                (d_xz < 1.5) & (ang < 0.5) & state.stop_called
            ).astype(jnp.float32)
            # reference NavToPosSucc: position-only success (within dist)
            measures["nav_to_pos_success"] = (d_xz < 1.5).astype(jnp.float32)
            measures["success"] = measures["nav_to_obj_success"]
        else:  # empty
            measures["success"] = jnp.zeros((self.num_envs,), jnp.float32)
        return measures

    def _reward(self, state, prev_m, m) -> jnp.ndarray:
        """Distance-delta shaping + success bonus (reference
        RearrangePickReward/PlaceReward structure, sub_tasks/*_sensors.py)."""
        r = jnp.full((self.num_envs,), self.slack_reward)
        if self.task in ("open", "close"):
            r = r + self.dist_reward_scale * (
                prev_m["ee_to_marker_dist"] - m["ee_to_marker_dist"]
            )
            # joint progress toward the goal state (open: +q, close: -q)
            r = r + 2.0 * jnp.abs(m["art_obj_state"] - prev_m["art_obj_state"])
        elif self.task == "reach":
            # dense EE-to-goal delta (reference RearrangeReachReward,
            # sub_tasks/reach_sensors.py:13 — diff mode)
            r = r + self.dist_reward_scale * (
                prev_m["ee_to_resting_distance"] - m["ee_to_resting_distance"]
            )
        elif self.task == "pick":
            r = r + self.dist_reward_scale * (
                prev_m["ee_to_object_distance"] - m["ee_to_object_distance"]
            )
            r = r + 1.0 * (m["did_pick_object"] - prev_m["did_pick_object"])
        elif self.task in ("place", "rearrange"):
            if self.task == "rearrange":
                # staged shaping (reference MoveObjectsReward,
                # composite_sensors.py): EE->object distance until the first
                # pick + a one-time pick bonus; the object->goal term below
                # only moves once the object is carried
                not_picked = 1.0 - prev_m["did_pick_object"]
                r = r + self.dist_reward_scale * not_picked * (
                    prev_m["ee_to_object_distance"] - m["ee_to_object_distance"]
                )
                r = r + 1.0 * jnp.maximum(
                    m["did_pick_object"] - prev_m["did_pick_object"], 0.0
                )
            r = r + self.dist_reward_scale * (
                prev_m["object_to_goal_distance"] - m["object_to_goal_distance"]
            )
        elif self.task == "nav_to_obj":
            # reference NavToObjReward (nav_to_obj_sensors.py): distance
            # progress + angle-to-target progress once near
            r = r + self.dist_reward_scale * (
                prev_m["dist_to_goal"] - m["dist_to_goal"]
            )
            near = (m["dist_to_goal"] < 1.5).astype(jnp.float32)
            r = r + 0.5 * near * (
                prev_m["rot_dist_to_goal"] - m["rot_dist_to_goal"]
            )
        r = r + self.success_reward * jnp.maximum(
            m["success"] - prev_m["success"], 0.0
        )
        return r

    # -- lifecycle -----------------------------------------------------------
    def _fresh(self, ep_idx, key):
        n = self.num_envs
        pos = self.table.nav.start_pos[ep_idx]
        yaw = self.table.nav.start_yaw[ep_idx]
        return RearrangeState(
            ep_ptr=jnp.zeros((n,), jnp.int32),
            ep_idx=ep_idx,
            step=jnp.zeros((n,), jnp.int32),
            pos=pos,
            yaw=yaw,
            prev_pos=pos,
            obj_pos=self.table.obj_init[ep_idx],
            obj_vel=jnp.zeros((n, self.num_objects, 3), jnp.float32),
            obj_quat=rigid.quat_from_yaw(self.table.obj_yaw[ep_idx]),
            obj_omega=jnp.zeros((n, self.num_objects, 3), jnp.float32),
            art_q=jnp.broadcast_to(
                self.table.art_init_q[ep_idx][:, None],
                (n, self.table.art_pos.shape[1]),
            )
            * self.table.art_valid[ep_idx],
            art_vel=jnp.zeros((n, self.table.art_pos.shape[1]), jnp.float32),
            joints=jnp.broadcast_to(self._resting, (n, self.n_joints)),
            leg_q=jnp.broadcast_to(
                jnp.asarray(legs_mod.LEG_INIT[: self.rparams.leg_joints]),
                (n, self.rparams.leg_joints),
            ),
            joint_vel=jnp.zeros((n, self.n_joints), jnp.float32),
            motor_target=jnp.broadcast_to(self._resting, (n, self.n_joints)),
            held=jnp.full((n,), -1, jnp.int32),
            ever_held=jnp.zeros((n,), bool),
            # humanoid spawns a couple of meters behind the robot start,
            # snapped to the navgrid (the generator has no humanoid start;
            # reference hab3 episodes carry one)
            human_pos=jax.vmap(
                functools.partial(ng.snap_to_navigable, self.pack)
            )(
                self.table.nav.scene_idx[ep_idx],
                pos + yaw_to_forward(yaw + jnp.pi) * 2.0,
            ),
            human_yaw=yaw,
            human_held=jnp.full((n,), -1, jnp.int32),
            accum_force=jnp.zeros((n,), jnp.float32),
            stop_called=jnp.zeros((n,), bool),
            collided=jnp.zeros((n,), bool),
            collision_count=jnp.zeros((n,), jnp.int32),
            last_action=jnp.full((n,), -1, jnp.int32),
            episode_over=jnp.zeros((n,), bool),
            episode_count=jnp.zeros((n,), jnp.int32),
            key=key,
        )

    def reset_fn(self, key, env_data=None):  # env_data unused (tables small)
        n = self.num_envs
        ep_idx = self.order[jnp.arange(n), 0]
        state = self._fresh(ep_idx, key)
        return state, self._observations(state)

    def step_fn(self, state: RearrangeState, actions: jnp.ndarray, env_data=None):
        n = self.num_envs
        n_idx = jnp.arange(n)
        prev_m = self._measures(state)
        sid = self._sid(state)

        new_joints = state.joints
        new_joint_vel = state.joint_vel
        new_motor = state.motor_target
        cmd: Dict[str, Any] = {}
        if self.action_specs is not None:
            # composed registry-resolved actions (task_actions.py): each
            # spec consumes its declaration-ordered slice and contributes
            # commands; the rest of the step consumes the merged cmd
            acts_f = actions.astype(jnp.float32)
            off = 0
            cmd1: Dict[str, Any] = {}  # humanoid (agent_1) lane
            for spec in self.action_specs:
                w = spec.dims(self)
                x = acts_f[:, off : off + w]
                if self.with_humanoid and spec.agent_idx >= 1:
                    spec.contribute(
                        self, state, x, cmd1,
                        pose=(state.human_pos, state.human_yaw),
                    )
                else:
                    spec.contribute(self, state, x, cmd)
                off += w
            if "sel_arm" in cmd:
                # SelectBaseOrArmAction (reference actions.py:74-99): base
                # and arm may not move in the same step — the selection
                # gates whichever group is deselected
                sel = cmd["sel_arm"]  # (N,) bool, True = arm
                for k in ("dq", "ee_delta"):
                    if k in cmd:
                        cmd[k] = jnp.where(sel[:, None], cmd[k], 0.0)
                for k in ("lin", "ang"):
                    if k in cmd:
                        cmd[k] = jnp.where(sel, 0.0, cmd[k])
            lo = jnp.asarray(self.rparams.joint_limits_lower, jnp.float32)
            hi = jnp.asarray(self.rparams.joint_limits_upper, jnp.float32)
            if "dq" in cmd:
                if self.arm_dynamics:
                    new_motor = jnp.clip(state.motor_target + cmd["dq"], lo, hi)
                    new_joints, new_joint_vel = jax.vmap(
                        functools.partial(
                            arm_dyn.step_arm,
                            self.rparams,
                            self._arm_dyn,
                            dt=1.0 / 30.0,
                            substeps=4,
                        )
                    )(state.joints, state.joint_vel, new_motor)
                else:
                    new_joints = jnp.clip(state.joints + cmd["dq"], lo, hi)
            elif "ee_delta" in cmd:
                cur_local = self._ee_local(state.joints) - self._arm_root
                target_ee = cur_local + cmd["ee_delta"]
                new_joints = jax.vmap(
                    functools.partial(kin.ik_solve, self.rparams, iters=8)
                )(target_ee, state.joints)
            grip = cmd.get("grip", jnp.zeros((n,), bool))
            lin = jnp.clip(jnp.asarray(cmd.get("lin", jnp.zeros((n,)))), -1.0, 1.0)
            ang = jnp.clip(jnp.asarray(cmd.get("ang", jnp.zeros((n,)))), -1.0, 1.0)
            stop = state.stop_called | cmd.get("stop", jnp.zeros((n,), bool))
            a = jnp.where(grip, A_GRAB, A_FWD).astype(jnp.int32)  # for logs
            yaw = state.yaw + ang * self.turn
            move = lin * self.fwd
        elif self.control == "arm":
            # [J joint deltas | grip | base lin | base ang]
            acts = jnp.clip(actions.astype(jnp.float32), -1.0, 1.0)
            J = self.n_joints
            dq = acts[:, :J] * self.max_joint_delta
            lo = jnp.asarray(self.rparams.joint_limits_lower, jnp.float32)
            hi = jnp.asarray(self.rparams.joint_limits_upper, jnp.float32)
            if self.arm_dynamics:
                # reference ArmRelPosAction: the delta accumulates on the
                # Bullet joint MOTOR target and the multibody integrates
                # under gravity (actions.py:167-238 + manipulator.py:79-120).
                # Here: PD motors + lumped-mass articulated dynamics
                # (dynamics.py).
                new_motor = jnp.clip(state.motor_target + dq, lo, hi)
                new_joints, new_joint_vel = jax.vmap(
                    functools.partial(
                        arm_dyn.step_arm,
                        self.rparams,
                        self._arm_dyn,
                        dt=1.0 / 30.0,
                        substeps=4,
                    )
                )(state.joints, state.joint_vel, new_motor)
            else:
                # reference ArmRelPosKinematicAction: joints set directly
                new_joints = jnp.clip(state.joints + dq, lo, hi)
            grip = acts[:, J] > 0.0
            lin = acts[:, J + 1]
            ang = acts[:, J + 2]
            a = jnp.where(grip, A_GRAB, A_FWD).astype(jnp.int32)  # for logs
            stop = state.stop_called
            yaw = state.yaw + ang * self.turn
            move = lin * self.fwd
        elif self.control == "arm_ee":
            # [EE delta xyz | grip | base lin | base ang] — DLS-IK toward the
            # displaced EE target in the agent frame (reference ArmEEAction)
            acts = jnp.clip(actions.astype(jnp.float32), -1.0, 1.0)
            cur_local = self._ee_local(state.joints) - self._arm_root
            target = cur_local + acts[:, 0:3] * self.ee_delta
            new_joints = jax.vmap(
                functools.partial(kin.ik_solve, self.rparams, iters=8)
            )(target, state.joints)
            grip = acts[:, 3] > 0.0
            lin = acts[:, 4]
            ang = acts[:, 5]
            a = jnp.where(grip, A_GRAB, A_FWD).astype(jnp.int32)
            stop = state.stop_called
            yaw = state.yaw + ang * self.turn
            move = lin * self.fwd
        elif self.continuous:
            acts = actions.astype(jnp.float32)
            lin = jnp.clip(acts[:, 0], -1.0, 1.0)
            ang = jnp.clip(acts[:, 1], -1.0, 1.0)
            grip = acts[:, 2] > 0.0
            a = jnp.where(grip, A_GRAB, A_FWD).astype(jnp.int32)  # for logs
            stop = state.stop_called  # continuous control has no stop action
            yaw = state.yaw + ang * self.turn
            move = lin * self.fwd
        else:
            a = actions.astype(jnp.int32)
            stop = state.stop_called | (a == A_STOP)
            yaw = state.yaw + jnp.where(a == A_LEFT, self.turn, 0.0) - jnp.where(
                a == A_RIGHT, self.turn, 0.0
            )
            move = jnp.where(a == A_FWD, self.fwd, 0.0)
        target = state.pos + yaw_to_forward(yaw) * move[:, None]
        new_pos, collided = jax.vmap(functools.partial(ng.try_step, self.pack))(
            sid, state.pos, target
        )
        # dynamic-obstacle occupancy: movable objects block the base the way
        # the reference's navmesh recompute does after objects move
        # (rearrange_sim.py:465-492) — here it is a per-step disc test
        # against the CURRENT object positions instead of a grid rebake.
        objs_now = self._obj_world(state)
        o_lane = jnp.arange(self.num_objects)[None]
        blockers = self.table.obj_valid[state.ep_idx] & (
            o_lane != jnp.where(state.held < 0, -1, state.held)[:, None]
        )
        d_obj = jnp.linalg.norm(
            (objs_now - new_pos[:, None, :])[..., jnp.array([0, 2])], axis=-1
        )
        obj_rad = jnp.maximum(
            self.table.obj_half[state.ep_idx][..., 0],
            self.table.obj_half[state.ep_idx][..., 2],
        )
        obj_hit = jnp.any(
            blockers & (d_obj < (AGENT_RADIUS + obj_rad) * 0.9), axis=1
        )
        new_pos = jnp.where(obj_hit[:, None], state.pos, new_pos)
        collided = collided | obj_hit
        moved = jnp.abs(move) > 1e-6
        collided = collided & moved
        new_pos = jnp.where(moved[:, None], new_pos, state.pos)

        if self.action_specs is not None:
            if "base_pos_override" in cmd:
                # HumanoidJointAction base transform: teleport-set the root
                # (snapped to the navgrid, like the reference's step_filter)
                ov_set, ov_pos, ov_yaw = cmd["base_pos_override"]
                snapped_ov = jax.vmap(
                    functools.partial(ng.snap_to_navigable, self.pack)
                )(sid, ov_pos)
                new_pos = jnp.where(ov_set[:, None], snapped_ov, new_pos)
                yaw = jnp.where(ov_set, ov_yaw, yaw)
            if "pddl_apply" in cmd:
                # PddlApplyAction nav(e): postcondition teleport next to the
                # entity, facing it (reference applies the action's effects
                # when its precondition holds, pddl_actions.py:57-99)
                objs0 = self._obj_world(state)
                ents0 = jnp.concatenate(
                    [objs0, self.table.target_pos[state.ep_idx]], axis=1
                )
                ev0 = jnp.concatenate(
                    [self.table.obj_valid[state.ep_idx]] * 2, axis=1
                )
                nav_arg = cmd["pddl_apply"][:, 0]
                ne = ents0.shape[1]
                e_i = jnp.clip(nav_arg - 1, 0, ne - 1)
                n_i = jnp.arange(n)
                do_nav = (
                    (nav_arg >= 1) & (nav_arg <= ne) & ev0[n_i, e_i]
                )
                tgt_e = ents0[n_i, e_i]
                snap_e = jax.vmap(
                    functools.partial(ng.snap_to_navigable, self.pack)
                )(sid, tgt_e)
                face = tgt_e - snap_e
                face_yaw = jnp.arctan2(-face[:, 0], -face[:, 2])
                new_pos = jnp.where(do_nav[:, None], snap_e, new_pos)
                yaw = jnp.where(do_nav, face_yaw, yaw)

        # -- humanoid (agent_1) lane: same motion semantics on its own pose
        new_h_pos, new_h_yaw = state.human_pos, state.human_yaw
        if self.with_humanoid:
            h_lin = jnp.clip(jnp.asarray(cmd1.get("lin", jnp.zeros((n,)))), -1.0, 1.0)
            h_ang = jnp.clip(jnp.asarray(cmd1.get("ang", jnp.zeros((n,)))), -1.0, 1.0)
            stop = stop | cmd1.get("stop", jnp.zeros((n,), bool))
            new_h_yaw = state.human_yaw + h_ang * self.turn
            h_target = state.human_pos + yaw_to_forward(new_h_yaw) * (
                h_lin * self.fwd
            )[:, None]
            new_h_pos, _ = jax.vmap(functools.partial(ng.try_step, self.pack))(
                sid, state.human_pos, h_target
            )
            if "pddl_apply" in cmd1:
                # humanoid PddlApplyAction nav(e)
                objs0h = self._obj_world(state)
                ents0h = jnp.concatenate(
                    [objs0h, self.table.target_pos[state.ep_idx]], axis=1
                )
                ev0h = jnp.concatenate(
                    [self.table.obj_valid[state.ep_idx]] * 2, axis=1
                )
                nav1 = cmd1["pddl_apply"][:, 0]
                neh = ents0h.shape[1]
                e1_i = jnp.clip(nav1 - 1, 0, neh - 1)
                n_i1 = jnp.arange(n)
                do_nav1 = (nav1 >= 1) & (nav1 <= neh) & ev0h[n_i1, e1_i]
                tgt1 = ents0h[n_i1, e1_i]
                snap1 = jax.vmap(
                    functools.partial(ng.snap_to_navigable, self.pack)
                )(sid, tgt1)
                face1 = tgt1 - snap1
                new_h_pos = jnp.where(do_nav1[:, None], snap1, new_h_pos)
                new_h_yaw = jnp.where(
                    do_nav1,
                    jnp.arctan2(-face1[:, 0], -face1[:, 2]),
                    new_h_yaw,
                )

        state = dataclasses.replace(
            state,
            pos=new_pos,
            yaw=yaw,
            prev_pos=state.pos,
            joints=new_joints,
            joint_vel=new_joint_vel,
            motor_target=new_motor,
            human_pos=new_h_pos,
            human_yaw=new_h_yaw,
            stop_called=stop,
            collided=collided,
            collision_count=state.collision_count + collided.astype(jnp.int32),
            last_action=a,
            step=state.step + 1,
        )

        # -- articulated interaction (art tasks: grab near the handle slides
        # the prismatic joint toward the goal, reference ArtObj tasks) -------
        if self.task in ("open", "close"):
            interact = (a == A_GRAB)
            handle = self._handle_pos(state)
            near_handle = (
                jnp.linalg.norm((handle - self._ee_pos(state))[:, jnp.array([0, 2])], axis=-1)
                <= self.grasp_distance
            )
            art_t = self.table.art_target[state.ep_idx]
            goal_q = self.table.art_goal_q[state.ep_idx]
            cur_q = state.art_q[n_idx, art_t]
            if self.dynamics in ("gravity", "contacts"):
                # single-DoF articulated dynamics (reference: Bullet steps
                # articulated objects with joint damping/friction inside
                # internal_step, rearrange_sim.py:1017-1028): grasping the
                # handle applies a PD generalized force toward the joint
                # target; a released joint coasts against viscous damping +
                # Coulomb friction; limits clamp with velocity kill.
                dt = 0.1
                is_rev = self.table.art_is_revolute[state.ep_idx, art_t]
                inertia = jnp.where(is_rev, 0.5, 1.0)  # kg·m² / kg
                qd = state.art_vel[n_idx, art_t]
                tau_max = inertia * 6.0  # accel cap, rad/s² | m/s²
                tau = jnp.clip(25.0 * (goal_q - cur_q) - 8.0 * qd, -tau_max, tau_max)
                tau = jnp.where(interact & near_handle, tau, 0.0)
                qd = qd + (tau - 1.0 * qd) / inertia * dt
                # Coulomb friction: decelerate toward rest, never reverse
                fric_dv = 0.8 / inertia * dt
                qd = jnp.sign(qd) * jnp.maximum(jnp.abs(qd) - fric_dv, 0.0)
                init_q = self.table.art_init_q[state.ep_idx]
                lo = jnp.minimum(0.0, jnp.minimum(init_q, goal_q))
                hi = jnp.maximum(0.0, jnp.maximum(init_q, goal_q))
                raw_q = cur_q + qd * dt
                new_q = jnp.clip(raw_q, lo, hi)
                qd = jnp.where((raw_q < lo) | (raw_q > hi), 0.0, qd)
                art_q = state.art_q.at[n_idx, art_t].set(new_q)
                art_vel = state.art_vel.at[n_idx, art_t].set(qd)
                state = dataclasses.replace(state, art_q=art_q, art_vel=art_vel)
            else:
                # kinematic joint slide at a fixed per-step rate:
                # 8cm (prismatic) / 0.15rad (door swing)
                rate = jnp.where(
                    self.table.art_is_revolute[state.ep_idx, art_t], 0.15, 0.08
                )
                dq = jnp.clip(goal_q - cur_q, -rate, rate)
                new_q = jnp.where(interact & near_handle, cur_q + dq, cur_q)
                art_q = state.art_q.at[n_idx, art_t].set(new_q)
                state = dataclasses.replace(state, art_q=art_q)

        # -- magic grasp / release (reference grip_actions.py:38-177) ----
        ee = self._ee_pos(state)
        objs = self._obj_world(state)
        d = jnp.linalg.norm(objs - ee[:, None, :], axis=-1)  # (N,O)
        d = jnp.where(self.table.obj_valid[state.ep_idx], d, 1e6)
        nearest = jnp.argmin(d, axis=1).astype(jnp.int32)
        nearest_d = d[n_idx, nearest]
        if self.action_specs is not None:
            if "grip" in cmd:
                # suction semantics (reference SuctionGraspAction)
                can_grab = grip & (state.held < 0) & (
                    nearest_d <= self.grasp_distance
                )
                do_release = (~grip) & (state.held >= 0)
            else:
                # no grip slice declared: grasp state only changes through
                # PddlApplyAction / HumanoidPickAction below
                can_grab = jnp.zeros((n,), bool)
                do_release = jnp.zeros((n,), bool)
            if "humanoid_pick" in cmd:
                # reference HumanoidPickAction: reach + grasp when the
                # target point is within reach of the agent
                hp_active, hp_target = cmd["humanoid_pick"]
                d_t_obj = jnp.linalg.norm(objs - hp_target[:, None, :], axis=-1)
                d_t_obj = jnp.where(
                    self.table.obj_valid[state.ep_idx], d_t_obj, 1e6
                )
                hp_obj = jnp.argmin(d_t_obj, axis=1).astype(jnp.int32)
                near_tgt = d_t_obj[n_idx, hp_obj] <= 0.4
                reach_ok = (
                    jnp.linalg.norm(
                        (hp_target - state.pos)[:, jnp.array([0, 2])], axis=-1
                    )
                    <= 1.5
                )
                hp_grab = hp_active & near_tgt & reach_ok & (state.held < 0)
                can_grab = can_grab | hp_grab
                nearest = jnp.where(hp_grab, hp_obj, nearest)
            if "pddl_apply" in cmd:
                # pick(o) / place(g) postconditions (pddl_actions.py):
                # pick snaps object o to the hand if the precondition
                # (not holding, robot near o) holds; place releases the
                # held object at goal g
                args = cmd["pddl_apply"]
                O = self.num_objects
                p_arg = args[:, 1]
                p_obj = jnp.clip(p_arg - 1, 0, O - 1)
                p_ok = (
                    (p_arg >= 1)
                    & (p_arg <= O)
                    & self.table.obj_valid[state.ep_idx][n_idx, p_obj]
                )
                near_o = (
                    jnp.linalg.norm(
                        (objs[n_idx, p_obj] - state.pos)[:, jnp.array([0, 2])],
                        axis=-1,
                    )
                    <= 2.0
                )
                p_do = p_ok & near_o & (state.held < 0)
                can_grab = can_grab | p_do
                nearest = jnp.where(p_do, p_obj, nearest)
                pl_arg = args[:, 2]
                g_i = jnp.clip(pl_arg - 1 - O, 0, O - 1)
                pddl_place = (
                    (pl_arg >= O + 1) & (pl_arg <= 2 * O) & (state.held >= 0)
                )
                pddl_place_goal = self.table.target_pos[state.ep_idx][
                    n_idx, g_i
                ]
                do_release = do_release | pddl_place
        elif self._arm_mode() or self.continuous:
            # suction semantics (reference SuctionGraspAction,
            # grip_actions.py:140+): hold while grip > 0, release on <= 0
            can_grab = grip & (state.held < 0) & (nearest_d <= self.grasp_distance)
            do_release = (~grip) & (state.held >= 0)
        else:
            grab = a == A_GRAB
            can_grab = grab & (state.held < 0) & (nearest_d <= self.grasp_distance)
            do_release = grab & (state.held >= 0)

        # release: object drops under the EE (exact spot when navigable,
        # else snapped to the nearest navigable cell)
        ee_floor = jnp.stack(
            [ee[:, 0], self.pack.floor_y[sid], ee[:, 2]], axis=-1
        )
        navigable = jax.vmap(functools.partial(ng.is_navigable, self.pack))(sid, ee_floor)
        snapped = jax.vmap(functools.partial(ng.snap_to_navigable, self.pack))(sid, ee)
        drop = jnp.where(navigable[:, None], ee_floor, snapped)
        if self.dynamics in ("gravity", "contacts"):
            # release in mid-air at the EE; the rigid-body stepper below
            # integrates the fall (reference: Bullet gravity after
            # desnap, RearrangeSim.step_world)
            drop = drop.at[:, 1].set(ee[:, 1])
        if self.action_specs is not None and "pddl_apply" in cmd:
            # place(g) postcondition: the object lands AT the goal
            drop = jnp.where(pddl_place[:, None], pddl_place_goal, drop)
        held_idx = jnp.maximum(state.held, 0)
        obj_pos = state.obj_pos
        obj_pos = jnp.where(
            (do_release[:, None] & (jnp.arange(self.num_objects)[None] == held_idx[:, None]))[..., None],
            drop[:, None, :],
            obj_pos,
        )
        held = jnp.where(do_release, -1, state.held)
        held = jnp.where(can_grab, nearest, held)
        tgt = self._target_obj(state)
        ever_held = state.ever_held | (held == tgt)

        # -- humanoid grasp lane (agent_1 HumanoidPickAction / PddlApply) --
        human_held = state.human_held
        if self.with_humanoid:
            o_lane_h = jnp.arange(self.num_objects)[None]
            h_grab = jnp.zeros((n,), bool)
            h_obj = jnp.zeros((n,), jnp.int32)
            h_release = jnp.zeros((n,), bool)
            h_drop = state.human_pos * jnp.array([1.0, 0.0, 1.0]) + jnp.stack(
                [jnp.zeros((n,)), self.pack.floor_y[sid], jnp.zeros((n,))], -1
            )
            if "humanoid_pick" in cmd1:
                hp_a, hp_t = cmd1["humanoid_pick"]
                d_h = jnp.linalg.norm(objs - hp_t[:, None, :], axis=-1)
                d_h = jnp.where(self.table.obj_valid[state.ep_idx], d_h, 1e6)
                cand = jnp.argmin(d_h, axis=1).astype(jnp.int32)
                g = (
                    hp_a
                    & (d_h[n_idx, cand] <= 0.4)
                    & (
                        jnp.linalg.norm(
                            (hp_t - state.human_pos)[:, jnp.array([0, 2])],
                            axis=-1,
                        )
                        <= 1.5
                    )
                    & (state.human_held < 0)
                )
                h_grab = h_grab | g
                h_obj = jnp.where(g, cand, h_obj)
            if "pddl_apply" in cmd1:
                args1 = cmd1["pddl_apply"]
                O = self.num_objects
                p_arg1 = args1[:, 1]
                p_obj1 = jnp.clip(p_arg1 - 1, 0, O - 1)
                near1 = (
                    jnp.linalg.norm(
                        (objs[n_idx, p_obj1] - state.human_pos)[
                            :, jnp.array([0, 2])
                        ],
                        axis=-1,
                    )
                    <= 2.0
                )
                g1 = (
                    (p_arg1 >= 1)
                    & (p_arg1 <= O)
                    & self.table.obj_valid[state.ep_idx][n_idx, p_obj1]
                    & near1
                    & (state.human_held < 0)
                )
                h_grab = h_grab | g1
                h_obj = jnp.where(g1, p_obj1, h_obj)
                pl1 = args1[:, 2]
                g1_i = jnp.clip(pl1 - 1 - O, 0, O - 1)
                h_place = (
                    (pl1 >= O + 1) & (pl1 <= 2 * O) & (state.human_held >= 0)
                )
                h_release = h_release | h_place
                h_drop = jnp.where(
                    h_place[:, None],
                    self.table.target_pos[state.ep_idx][n_idx, g1_i],
                    h_drop,
                )
            # the robot's held object is not grabbable by the humanoid
            h_grab = h_grab & (h_obj != held)
            obj_pos_h_sel = (
                h_release[:, None] & (o_lane_h == jnp.maximum(state.human_held, 0)[:, None])
            )[..., None]
            obj_pos = jnp.where(obj_pos_h_sel, h_drop[:, None, :], obj_pos)
            human_held = jnp.where(h_release, -1, state.human_held)
            human_held = jnp.where(h_grab, h_obj, human_held)

        obj_vel = state.obj_vel
        obj_quat = state.obj_quat
        obj_omega = state.obj_omega
        step_force = jnp.zeros((n,), jnp.float32)
        if self.dynamics == "gravity":
            # semi-implicit Euler rigid-body step for free objects
            # (reference RearrangeSim substeps Bullet at ctrl_freq;
            # dt here = one control step). Floor contact settles the
            # object with ground friction killing horizontal motion.
            dt, g = 0.1, 9.8
            # positions anchor the object BOTTOM (render adds +OBJ_HALF)
            rest_y = self.pack.floor_y[sid][:, None]
            o_lane = jnp.arange(self.num_objects)[None]
            free = (
                self.table.obj_valid[state.ep_idx]
                & (o_lane != jnp.where(held < 0, -1, held)[:, None])
            )
            if self.with_humanoid:
                free = free & (
                    o_lane
                    != jnp.where(human_held < 0, -1, human_held)[:, None]
                )
            v = obj_vel.at[..., 1].add(-g * dt)
            p = obj_pos + v * dt
            on_ground = p[..., 1] <= rest_y
            p = p.at[..., 1].set(jnp.where(on_ground, rest_y, p[..., 1]))
            v = jnp.where(on_ground[..., None], 0.0, v)
            obj_pos = jnp.where(free[..., None], p, obj_pos)
            obj_vel = jnp.where(free[..., None], v, jnp.zeros_like(v))
        elif self.dynamics == "contacts":
            free = self.table.obj_valid[state.ep_idx] & (
                jnp.arange(self.num_objects)[None]
                != jnp.where(held < 0, -1, held)[:, None]
            )
            if self.with_humanoid:
                free = free & (
                    jnp.arange(self.num_objects)[None]
                    != jnp.where(human_held < 0, -1, human_held)[:, None]
                )
            # contacts v4: rotational state rides the pytree — boxes tip,
            # tumble off supports, and settle on a face (rigid_body.py)
            obj_pos, obj_vel, step_force, obj_quat, obj_omega = contact_step(
                obj_pos,
                obj_vel,
                free,
                self.pack.floor_y[sid],
                state.pos,
                half=self.table.obj_half[state.ep_idx],
                yaw_o=self.table.obj_yaw[state.ep_idx],
                quat=state.obj_quat,
                omega=state.obj_omega,
            )

        # -- grasp constraint violation ----------------------------------
        # The kinematic hold stands in for the reference's rigid p2p
        # constraint (RearrangeGraspManager); penetration of the held box
        # against the floor or another box is a constraint violation: it
        # generates force (-> accum_force / ForceTerminate) and, per the
        # reference task flags, can break the grasp or end the episode
        # (default_structured_configs.py:1489-1490).
        carried = ee  # held box hangs bottom-anchored at the EE
        pen_floor = jnp.maximum(self.pack.floor_y[sid] - carried[:, 1], 0.0)
        halves = self.table.obj_half[state.ep_idx]  # (N,O,3)
        h_held = halves[n_idx, jnp.maximum(held, 0)]  # (N,3)
        c_held = carried + jnp.stack(
            [jnp.zeros((n,)), h_held[:, 1], jnp.zeros((n,))], -1
        )
        centers = obj_pos + jnp.concatenate(
            [jnp.zeros((n, self.num_objects, 1)), halves[..., 1:2],
             jnp.zeros((n, self.num_objects, 1))], -1
        )
        o_lane = jnp.arange(self.num_objects)[None]
        o_other = self.table.obj_valid[state.ep_idx] & (
            o_lane != jnp.where(held < 0, -1, held)[:, None]
        )
        pen3 = (h_held[:, None] + halves) - jnp.abs(
            c_held[:, None, :] - centers
        )
        pen_obj = jnp.max(
            jnp.where(
                o_other & jnp.all(pen3 > 0, axis=-1),
                jnp.min(pen3, axis=-1),
                0.0,
            ),
            axis=1,
        )
        violation = jnp.where(held >= 0, pen_floor + pen_obj, 0.0)
        step_force = step_force + FORCE_K * violation
        if self.cv_drops_object:
            broke = violation > 0.0
            obj_pos = jnp.where(
                (broke[:, None] & (o_lane == held[:, None]))[..., None],
                carried[:, None, :],
                obj_pos,
            )
            held = jnp.where(broke, -1, held)

        state = dataclasses.replace(
            state,
            obj_pos=obj_pos,
            obj_vel=obj_vel,
            obj_quat=obj_quat,
            obj_omega=obj_omega,
            held=held,
            ever_held=ever_held,
            human_held=human_held,
            accum_force=state.accum_force + step_force,
        )

        m = self._measures(state)
        m["constraint_violation"] = (violation > 0.0).astype(jnp.float32)
        episode_over = stop | (state.step >= self.max_episode_steps)
        if self.max_accum_force > 0:
            # reference ForceTerminate (rearrange_sensors.py:918)
            episode_over = episode_over | (m["force_terminate"] > 0)
        if self.cv_ends_episode:
            episode_over = episode_over | (violation > 0.0)
        # pick/place end on success (reference end_on_success for skills)
        done = episode_over | (m["success"] > 0)
        reward = self._reward(state, prev_m, m)

        info = dict(m)
        # reference uuid alias (DidViolateHoldConstraintMeasure)
        info["did_violate_hold_constraint"] = info["constraint_violation"]
        # reference BadCalledTerminate: called stop without having succeeded
        info["bad_called_terminate"] = (
            state.stop_called & ~(m["success"] > 0)
        ).astype(jnp.float32)
        # the task's reward surfaced under its reference reward-measure
        # uuid (pick_reward / place_reward / art_obj_reward / ... — the
        # reference computes reward AS a measure; here it is the same
        # value the trainer optimizes)
        reward_key = {
            "pick": "pick_reward",
            "place": "place_reward",
            "reach": "rearrange_reach_reward",
            "open": "art_obj_reward",
            "close": "art_obj_reward",
            "nav_to_obj": "nav_to_obj_reward",
            "rearrange": "move_objects_reward",
        }.get(self.task)
        if reward_key:
            info[reward_key] = reward
        if self.task == "rearrange":
            info["pddl_subgoal_reward"] = reward
        info = self._filter_measures(info)

        # -- auto-reset --------------------------------------------------
        ep_ptr = jnp.where(done, state.ep_ptr + 1, state.ep_ptr)
        ep_idx = self.order[n_idx, ep_ptr % self._order_len]
        fresh = self._fresh(ep_idx, state.key)
        sel = lambda new, old: jnp.where(
            done.reshape((n,) + (1,) * (old.ndim - 1)), new, old
        )
        state = RearrangeState(
            ep_ptr=ep_ptr,
            ep_idx=jnp.where(done, ep_idx, state.ep_idx),
            step=sel(fresh.step, state.step),
            pos=sel(fresh.pos, state.pos),
            yaw=sel(fresh.yaw, state.yaw),
            prev_pos=sel(fresh.prev_pos, state.prev_pos),
            obj_pos=sel(fresh.obj_pos, state.obj_pos),
            obj_vel=sel(fresh.obj_vel, state.obj_vel),
            obj_quat=sel(fresh.obj_quat, state.obj_quat),
            obj_omega=sel(fresh.obj_omega, state.obj_omega),
            art_q=sel(fresh.art_q, state.art_q),
            art_vel=sel(fresh.art_vel, state.art_vel),
            joints=sel(fresh.joints, state.joints),
            leg_q=sel(fresh.leg_q, state.leg_q),
            joint_vel=sel(fresh.joint_vel, state.joint_vel),
            motor_target=sel(fresh.motor_target, state.motor_target),
            held=sel(fresh.held, state.held),
            ever_held=sel(fresh.ever_held, state.ever_held),
            human_pos=sel(fresh.human_pos, state.human_pos),
            human_yaw=sel(fresh.human_yaw, state.human_yaw),
            human_held=sel(fresh.human_held, state.human_held),
            accum_force=sel(fresh.accum_force, state.accum_force),
            stop_called=sel(fresh.stop_called, state.stop_called),
            collided=sel(fresh.collided, state.collided),
            collision_count=sel(fresh.collision_count, state.collision_count),
            last_action=sel(fresh.last_action, state.last_action),
            episode_over=episode_over,
            episode_count=state.episode_count + done.astype(jnp.int32),
            key=state.key,
        )
        obs = self._observations(state)
        return state, obs, reward, done, info

    # -- host conveniences -------------------------------------------------
    def reset(self, seed: int = 0):
        return self._jit_reset(jax.random.PRNGKey(seed))

    def step(self, state, actions):
        return self._jit_step(state, jnp.asarray(actions))
