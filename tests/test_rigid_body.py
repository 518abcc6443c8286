"""Contacts v4 rigid-body rotation (VERDICT r3 missing #3): boxes tip over
ledges, tumble, and settle on a face — the observable Bullet step_world
behavior for the box/floor case (reference rearrange_sim.py:1017-1028)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.tasks.rearrange.rigid_body import (
    box_floor_substep,
    effective_upright_obb,
    quat_from_yaw,
    quat_identity,
    quat_to_matrix,
    yaw_from_quat,
)



def _run(p, v, q, w, half, steps=200, dt=0.02, ledges=None, mu=0.5):
    free = jnp.ones(p.shape[:2], bool)
    floor = jnp.zeros((p.shape[0],), jnp.float32)

    def body(carry, _):
        p, v, q, w = carry
        p, v, q, w = box_floor_substep(
            p, v, q, w, half, free, floor, dt, mu=mu, ledges=ledges
        )
        return (p, v, q, w), None

    (p, v, q, w), _ = jax.lax.scan(body, (p, v, q, w), None, length=steps)
    return p, v, q, w


def _up_alignment(q):
    """|cos| of the angle between the box's nearest body axis and world up —
    1.0 when some face is flat on the floor."""
    R = np.asarray(quat_to_matrix(q))  # columns = body axes in world
    upness = np.abs(R[..., 1, :])  # world-Y component of each body axis
    return upness.max(-1)


def test_flat_drop_settles_upright():
    half = jnp.full((1, 1, 3), 0.1)
    p = jnp.array([[[0.0, 0.5, 0.0]]])
    q = quat_identity((1, 1))
    v = jnp.zeros((1, 1, 3))
    w = jnp.zeros((1, 1, 3))
    p, v, q, w = _run(p, v, q, w, half)
    assert abs(float(p[0, 0, 1]) - 0.1) < 2e-2
    assert float(jnp.linalg.norm(v)) < 0.05
    assert _up_alignment(q)[0, 0] > 0.99


def test_tilted_drop_settles_on_face():
    """A box dropped tilted 35 deg about x rocks and settles flat."""
    half = jnp.full((1, 1, 3), 0.1)
    a = np.deg2rad(35.0) / 2
    q = jnp.array([[[np.cos(a), np.sin(a), 0.0, 0.0]]], jnp.float32)
    p = jnp.array([[[0.0, 0.4, 0.0]]])
    v = jnp.zeros((1, 1, 3))
    w = jnp.zeros((1, 1, 3))
    p, v, q, w = _run(p, v, q, w, half, steps=400)
    assert _up_alignment(q)[0, 0] > 0.98, _up_alignment(q)
    assert abs(float(p[0, 0, 1]) - 0.1) < 2.5e-2
    assert float(jnp.linalg.norm(w)) < 0.2


def test_ledge_tip_and_tumble():
    """A box nudged past a ledge edge TIPS (gravity torque about the edge),
    tumbles off, and settles on the floor on a face; a box well within the
    ledge stays on it (VERDICT r4 #4 done-criterion)."""
    # ledge: top at y=0.3, x in [-0.5, 0.1]
    ledges = jnp.array([[[-0.2, 0.15, 0.0, 0.3, 0.15, 0.5]]], jnp.float32)
    half = jnp.full((1, 2, 3), 0.06)
    # obj 0: center at x=0.08 — 2/3 of the box overhangs the edge at x=0.1
    # obj 1: center at x=-0.3 — fully supported
    p = jnp.array([[[0.08, 0.36, 0.0], [-0.3, 0.36, 0.0]]])
    q = quat_identity((1, 2))
    v = jnp.array([[[0.25, 0.0, 0.0], [0.0, 0.0, 0.0]]])  # the nudge
    w = jnp.zeros((1, 2, 3))
    traj = []
    free = jnp.ones((1, 2), bool)
    floor = jnp.zeros((1,), jnp.float32)
    step = jax.jit(
        lambda p, v, q, w: box_floor_substep(
            p, v, q, w, half, free, floor, 0.02, ledges=ledges
        )
    )
    for _ in range(500):
        p, v, q, w = step(p, v, q, w)
        traj.append(np.asarray(w[0, 0]))
    # the overhanging box TIPPED: angular speed spiked while falling
    assert max(np.linalg.norm(x) for x in traj) > 2.0
    # ...and ended ON THE FLOOR on a face
    assert float(p[0, 0, 1]) < 0.1, p[0, 0]
    assert abs(float(p[0, 0, 1]) - 0.06) < 2.5e-2
    assert _up_alignment(q)[0, 0] > 0.97
    # the supported box stayed on the ledge, upright
    assert abs(float(p[0, 1, 1]) - 0.36) < 2.5e-2
    assert _up_alignment(q)[0, 1] > 0.99
    assert float(jnp.linalg.norm(v[0, 1])) < 0.05


def test_effective_upright_obb_roundtrip():
    """Upright boxes: the SAT approximation is exact (yaw, half)."""
    yaw = jnp.array([[0.3, -1.2]])
    q = quat_from_yaw(yaw)
    half = jnp.array([[[0.1, 0.2, 0.3], [0.05, 0.1, 0.15]]])
    y2, h2 = effective_upright_obb(q, half)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(yaw), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(half), atol=1e-5)
    # yaw round-trip
    np.testing.assert_allclose(
        np.asarray(yaw_from_quat(quat_from_yaw(yaw))), np.asarray(yaw),
        atol=1e-6,
    )


def test_legged_base_fk_and_render():
    """Spot's 12 leg joints are load-bearing (VERDICT r4 #6): leg_q is env
    state initialized to the reference leg_init_params ([0, 0.7, -1.5] * 4,
    spot_robot.py:24-36), held fixed under base motion
    (articulated_agent_base.py:285-287), and FK-rendered — changing leg_q
    changes the dynamic-pass geometry."""
    import dataclasses

    from habitat_tpu.articulated_agents import legs as legs_mod
    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

    # FK sanity: init pose puts feet below and roughly under the hips
    knee, foot = legs_mod.leg_fk(jnp.asarray(legs_mod.LEG_INIT)[None])
    knee, foot = np.asarray(knee[0]), np.asarray(foot[0])
    assert (foot[:, 1] < knee[:, 1]).all() and (knee[:, 1] < 0).all()
    assert (np.abs(foot[:, 1] + 0.46) < 0.25).all()  # standing height-ish

    env = make_rearrange_env(
        num_envs=2, task="pick", with_visual=False, control="arm",
        robot="SpotRobot", dynamics="contacts", num_objects=2,
    )
    state, obs = env.reset(seed=0)
    assert state.leg_q.shape == (2, 12)
    np.testing.assert_allclose(
        np.asarray(state.leg_q[0]), legs_mod.LEG_INIT, atol=1e-6
    )
    # held fixed during base motion (reference BaseVelAction re-pins them)
    leg0 = np.asarray(state.leg_q).copy()  # step donates the state buffers
    a = jnp.zeros((2, env.action_space.shape[0]), jnp.float32).at[:, -2].set(1.0)
    state2, *_ = env.step(state, a)
    np.testing.assert_allclose(np.asarray(state2.leg_q), leg0, atol=1e-6)
    # leg geometry rides the dynamic pass and responds to leg_q
    dyn1 = env._dynamic_geometry(state2)
    st3 = dataclasses.replace(state2, leg_q=jnp.zeros_like(state2.leg_q))
    dyn2 = env._dynamic_geometry(st3)
    assert dyn1["v0"].shape == dyn2["v0"].shape
    assert not np.allclose(np.asarray(dyn1["v0"]), np.asarray(dyn2["v0"]))


def test_env_tumble_settles():
    """A rearrange env object initialized TIPPED settles onto a face under
    the default contacts dynamics (quat state through the env step)."""
    import dataclasses

    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

    env = make_rearrange_env(
        num_envs=1, task="empty", with_visual=False, dynamics="contacts",
        num_objects=2,
    )
    state, _ = env.reset(seed=0)
    a = np.deg2rad(40.0) / 2
    tipped = jnp.broadcast_to(
        jnp.array([np.cos(a), np.sin(a), 0.0, 0.0], jnp.float32),
        state.obj_quat.shape,
    )
    lifted = state.obj_pos + jnp.array([0.0, 0.25, 0.0])
    state = dataclasses.replace(state, obj_quat=tipped, obj_pos=lifted)
    act = jnp.zeros((1,), jnp.int32)
    for _ in range(25):
        state, obs, r, d, info = env.step(state, act)
    assert _up_alignment(state.obj_quat).min() > 0.97
    assert float(jnp.linalg.norm(state.obj_omega)) < 0.5
