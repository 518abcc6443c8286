"""Contacts v5 (VERDICT r4 #6): box-box and robot-box contacts transfer
TORQUE. The pair impulse is solved at the contact point with both lever
arms (rearrange_env.contact_step), so a struck or rammed standing box tips
over its support edge and settles on a face — Bullet step_world's
observable behavior (reference tasks/rearrange/rearrange_sim.py:1017-1028).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from habitat_tpu.tasks.rearrange.rearrange_env import contact_step
from habitat_tpu.tasks.rearrange.rigid_body import (
    quat_identity,
    quat_to_matrix,
)



def _body_y_upness(q):
    """World-Y component of the BODY y axis: 1.0 standing, ~0 lying down."""
    R = np.asarray(quat_to_matrix(q))
    return np.abs(R[..., 1, 1])


def _face_down(q):
    """Max |world-Y component| over body axes: 1.0 when a face is flat."""
    R = np.asarray(quat_to_matrix(q))
    return np.abs(R[..., 1, :]).max(-1)


def _roll(pos, vel, quat, omega, half, steps, agent_path=None, dt=0.02):
    import jax

    N, O = pos.shape[:2]
    free = jnp.ones((N, O), bool)
    floor = jnp.zeros((N,), jnp.float32)
    far = jnp.array([[50.0, 0.0, 50.0]], jnp.float32)

    @jax.jit
    def step(pos, vel, quat, omega, agent):
        return contact_step(
            pos, vel, free, floor, agent,
            dt=dt, n_substeps=4, half=half, quat=quat, omega=omega,
        )

    force_total = 0.0
    for s in range(steps):
        agent = far if agent_path is None else agent_path(s)
        pos, vel, force, quat, omega = step(pos, vel, quat, omega, agent)
        force_total += float(force.sum())
    return pos, vel, quat, omega, force_total


def test_slider_knocks_standing_box_over():
    """A heavy-ish slider box rams a tall standing box: the lever-arm
    impulse + floor friction pivot tip it; it settles lying on a face."""
    half = jnp.asarray(
        [[[0.05, 0.3, 0.05], [0.1, 0.12, 0.1]]], jnp.float32
    )  # obj0 tall standing, obj1 slider
    pos = jnp.asarray([[[0.0, 0.0, 0.0], [-0.6, 0.0, 0.0]]], jnp.float32)
    vel = jnp.asarray([[[0.0, 0.0, 0.0], [4.0, 0.0, 0.0]]], jnp.float32)
    quat = quat_identity((1, 2))
    omega = jnp.zeros((1, 2, 3))

    up0 = _body_y_upness(quat)[0, 0]
    assert up0 > 0.99

    pos, vel, quat, omega, _ = _roll(pos, vel, quat, omega, half, steps=120)

    up = _body_y_upness(quat)[0, 0]
    face = _face_down(quat)[0, 0]
    top_y = float(pos[0, 0, 1])  # bottom reference point of the tall box
    assert up < 0.5, f"standing box did not tip (body-y upness {up})"
    assert face > 0.95, f"did not settle on a face (face upness {face})"
    assert float(jnp.linalg.norm(omega[0, 0])) < 0.8
    # lying down: center height ~0.05 (its half-thickness), so the bottom
    # reference point p_center - h_y0 sits well below standing height
    center_y = top_y + float(half[0, 0, 1])
    assert center_y < 0.2, f"center still high ({center_y})"


def test_slow_nudge_slides_without_tipping():
    """A slow slider displaces the standing box but leaves it standing —
    the torque coupling must not turn every touch into a topple."""
    half = jnp.asarray(
        [[[0.1, 0.15, 0.1], [0.1, 0.1, 0.1]]], jnp.float32
    )  # squat box, slider starts close (floor friction brakes the slider)
    pos = jnp.asarray([[[0.0, 0.0, 0.0], [-0.35, 0.0, 0.0]]], jnp.float32)
    vel = jnp.asarray([[[0.0, 0.0, 0.0], [1.5, 0.0, 0.0]]], jnp.float32)
    quat = quat_identity((1, 2))
    omega = jnp.zeros((1, 2, 3))
    pos, vel, quat, omega, _ = _roll(pos, vel, quat, omega, half, steps=120)
    assert _body_y_upness(quat)[0, 0] > 0.9, "slow nudge toppled the box"
    assert float(pos[0, 0, 0]) > 0.005, "box did not get pushed at all"


def test_robot_ram_tips_standing_box():
    """A robot cylinder driving through a tall box torques it about its
    support: it tips away from the robot and settles on a face, and the
    contact registers pseudo-force (RobotForce semantics)."""
    half = jnp.asarray([[[0.05, 0.32, 0.05]]], jnp.float32)
    pos = jnp.asarray([[[0.0, 0.0, 0.0]]], jnp.float32)
    vel = jnp.zeros((1, 1, 3))
    quat = quat_identity((1, 1))
    omega = jnp.zeros((1, 1, 3))

    def agent_path(s):
        # drive from x=-0.6 through the box at 1.5 m/s (dt=0.02)
        x = -0.6 + 1.5 * 0.02 * min(s, 30)
        return jnp.asarray([[x, 0.0, 0.0]], jnp.float32)

    pos, vel, quat, omega, force = _roll(
        pos, vel, quat, omega, half, steps=150, agent_path=agent_path
    )
    up = _body_y_upness(quat)[0, 0]
    assert up < 0.5, f"rammed box did not tip (body-y upness {up})"
    assert _face_down(quat)[0, 0] > 0.95
    assert float(pos[0, 0, 0]) > 0.1, "box should be pushed away from robot"
    assert force > 0.0, "robot-box contact produced no pseudo-force"


def test_pair_impulse_conserves_momentum_free_space():
    """Two free boxes colliding far above the floor: the equal/opposite
    contact impulses conserve linear momentum (gravity acts equally)."""
    half = jnp.full((1, 2, 3), 0.1, jnp.float32)
    # meet mid-air: disable floor influence by keeping the test short
    pos = jnp.asarray([[[-0.3, 3.0, 0.0], [0.3, 3.0, 0.0]]], jnp.float32)
    vel = jnp.asarray([[[2.0, 0.0, 0.0], [-2.0, 0.0, 0.0]]], jnp.float32)
    quat = quat_identity((1, 2))
    omega = jnp.zeros((1, 2, 3))
    free = jnp.ones((1, 2), bool)
    floor = jnp.zeros((1,), jnp.float32)
    agent = jnp.array([[50.0, 0.0, 50.0]], jnp.float32)
    p, v = pos, vel
    q, w = quat, omega
    for _ in range(10):
        p, v, _, q, w = contact_step(
            p, v, free, floor, agent, dt=0.02, n_substeps=4,
            half=half, quat=q, omega=w,
        )
    px = float(jnp.sum(v[..., 0]))
    assert abs(px) < 1e-3, f"x-momentum not conserved: {px}"
    # they must have actually collided (velocities changed)
    assert float(v[0, 0, 0]) < 1.9
