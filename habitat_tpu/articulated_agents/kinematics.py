"""Batched forward/inverse kinematics (jnp, vmappable).

Counterpart of the reference's Bullet-backed Manipulator
(articulated_agents/manipulator.py:19 — joint motors, EE state) and IkHelper
(tasks/rearrange/utils.py, pybullet IK). Fixed-topology serial chains run as
pure array math: FK is a scan of axis rotations + link offsets; IK is damped
least squares on the FK Jacobian (jax.jacfwd) — differentiable and batched
over N envs, no native physics engine in the loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from habitat_tpu.articulated_agents.params import MobileManipulatorParams

_AXIS = {"x": 0, "y": 1, "z": 2}


def _axis_rot(axis: int, theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    if axis == 0:
        return jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == 1:
        return jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def fk_positions(params: MobileManipulatorParams, joints: jnp.ndarray) -> jnp.ndarray:
    """Joint angles (J,) -> link positions (J+1, 3) in the arm-root frame."""
    axes = [_AXIS[a] for a in params.joint_axes]
    offsets = jnp.asarray(params.link_offsets, jnp.float32)

    R = jnp.eye(3)
    p = jnp.zeros(3)
    pts = [p]
    for j in range(params.arm_joints):
        R = R @ _axis_rot(axes[j], joints[j])
        p = p + R @ offsets[j]
        pts.append(p)
    return jnp.stack(pts)


def ee_position(params: MobileManipulatorParams, joints: jnp.ndarray) -> jnp.ndarray:
    """End-effector position in the arm-root frame (J,) -> (3,)."""
    return fk_positions(params, joints)[-1]


def ee_position_world(
    params: MobileManipulatorParams,
    joints: jnp.ndarray,
    base_pos: jnp.ndarray,
    base_yaw: jnp.ndarray,
) -> jnp.ndarray:
    """EE world position given the mobile base pose."""
    from habitat_tpu.utils.geometry import rotate_agent_to_world

    local = ee_position(params, joints) + jnp.asarray(params.arm_root_offset)
    return base_pos + rotate_agent_to_world(local, base_yaw)


def ik_solve(
    params: MobileManipulatorParams,
    target: jnp.ndarray,  # (3,) in arm-root frame
    joints0: jnp.ndarray,
    iters: int = 20,
    damping: float = 0.1,
) -> jnp.ndarray:
    """Damped-least-squares IK (reference IkHelper.calc_ik via pybullet)."""
    lo = jnp.asarray(params.joint_limits_lower)
    hi = jnp.asarray(params.joint_limits_upper)

    def body(q, _):
        err = target - ee_position(params, q)
        J = jax.jacfwd(lambda qq: ee_position(params, qq))(q)  # (3, J)
        JJt = J @ J.T + damping**2 * jnp.eye(3)
        dq = J.T @ jnp.linalg.solve(JJt, err)
        q = jnp.clip(q + dq, lo, hi)
        return q, None

    q, _ = jax.lax.scan(body, joints0, None, length=iters)
    return q


def ik_error(params: MobileManipulatorParams, target, joints) -> jnp.ndarray:
    return jnp.linalg.norm(target - ee_position(params, joints))
