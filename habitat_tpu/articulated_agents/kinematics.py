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


# -- URDF chains (arbitrary axes / rpy origins / prismatic joints) -----------
#
# The reference gets this generality from Bullet's URDF importer
# (articulated_agents/manipulator.py:79-120); here `urdf.load_chain` parses
# the file and these functions run the chain as batched array math.


def _rodrigues(axis: jnp.ndarray, theta) -> jnp.ndarray:
    """Rotation about an arbitrary unit axis (3,) by angle theta."""
    x, y, z = axis[0], axis[1], axis[2]
    K = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def fk_chain(chain, joints: jnp.ndarray) -> jnp.ndarray:
    """URDF chain FK: (J,) joint values -> (J+1, 3) frame origins in the
    chain's base frame; the last row is the end-effector (fixed-tail folded).

    Frame update per joint j (urdf.ArticulatedChain):
      T_j = Trans(origin_xyz[j]) @ origin_rot[j] @ Motion_j(q_j)
    with Motion = Rodrigues(axis, q) for revolute, Trans(axis * q) prismatic.
    """
    o_xyz = jnp.asarray(chain.origin_xyz, jnp.float32)
    o_rot = jnp.asarray(chain.origin_rot, jnp.float32)
    axes = jnp.asarray(chain.axis, jnp.float32)
    prism = np.asarray(chain.is_prismatic)

    R = jnp.eye(3)
    p = jnp.zeros(3)
    pts = []
    for j in range(chain.num_joints):
        p = p + R @ o_xyz[j]
        R = R @ o_rot[j]
        pts.append(p)
        if prism[j]:
            p = p + R @ (axes[j] * joints[j])
        else:
            R = R @ _rodrigues(axes[j], joints[j])
    ee = p + R @ jnp.asarray(chain.ee_offset, jnp.float32)
    pts.append(ee)
    return jnp.stack(pts)


def ee_chain(chain, joints: jnp.ndarray) -> jnp.ndarray:
    """URDF-chain end-effector position (J,) -> (3,)."""
    return fk_chain(chain, joints)[-1]


def ik_solve_chain(
    chain,
    target: jnp.ndarray,
    joints0: jnp.ndarray,
    iters: int = 20,
    damping: float = 0.1,
) -> jnp.ndarray:
    """Damped-least-squares IK on the URDF chain (same scheme as ik_solve)."""
    lo = jnp.asarray(chain.lower, jnp.float32)
    hi = jnp.asarray(chain.upper, jnp.float32)

    def body(q, _):
        err = target - ee_chain(chain, q)
        J = jax.jacfwd(lambda qq: ee_chain(chain, qq))(q)
        JJt = J @ J.T + damping**2 * jnp.eye(3)
        dq = J.T @ jnp.linalg.solve(JJt, err)
        return jnp.clip(q + dq, lo, hi), None

    q, _ = jax.lax.scan(body, joints0, None, length=iters)
    return q
