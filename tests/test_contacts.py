"""Contact dynamics v1 (reference: Bullet step_world in
tasks/rearrange/rearrange_sim.py:1017-1028; settle_sim in
datasets/rearrange/rearrange_generator.py:938; RobotForce/ForceTerminate in
rearrange_sensors.py:814,918)."""

import numpy as np
import jax
import jax.numpy as jnp

from habitat_tpu.tasks.rearrange.rearrange_env import (
    OBJ_HALF,
    contact_step,
)
from habitat_tpu.tasks.rearrange.generator import make_rearrange_env, settle_objects


def _run(p, v, free, floor_y, agent, steps):
    for _ in range(steps):
        p, v, f = contact_step(p, v, free, floor_y, agent)
    return p, v


def test_dropped_object_rests_on_floor():
    p = jnp.array([[[0.0, 1.0, 0.0]]])  # one object 1m up
    v = jnp.zeros_like(p)
    free = jnp.ones((1, 1), bool)
    p, v = _run(p, v, free, jnp.zeros((1,)), jnp.full((1, 3), 1e6), 40)
    assert abs(float(p[0, 0, 1])) < 1e-3  # bottom at floor
    assert float(jnp.abs(v).max()) < 1e-2


def test_dropped_object_rests_on_another_not_inside():
    """The round-1 VERDICT criterion: stacking support, no interpenetration."""
    p = jnp.array([[[0.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])  # B on floor, A above
    v = jnp.zeros_like(p)
    free = jnp.ones((1, 2), bool)
    p, v = _run(p, v, free, jnp.zeros((1,)), jnp.full((1, 3), 1e6), 60)
    pa = np.asarray(p[0, 1])
    pb = np.asarray(p[0, 0])
    # sphere centers are bottom + OBJ_HALF: resting contact = 2*OBJ_HALF apart
    gap = np.linalg.norm((pa + [0, OBJ_HALF, 0]) - (pb + [0, OBJ_HALF, 0]))
    # resting contact up to one substep of gravity sag (~6mm at dt/4)
    assert gap >= 2 * OBJ_HALF - 1e-2, gap  # NOT inside each other
    assert pa[1] > pb[1] + OBJ_HALF, (pa, pb)  # A is ON TOP of B


def test_offset_drop_rests_flush_on_top():
    """Box-box (v2) behavior: a box dropped at a lateral offset that still
    overlaps the support box in xz rests FLUSH face-on-face at exactly
    2*OBJ_HALF above it — the v1 sphere model kiss-contacted and slid off."""
    p = jnp.array([[[0.0, 0.0, 0.0], [0.1, 1.0, 0.05]]])  # B on floor, A above
    v = jnp.zeros_like(p)
    free = jnp.ones((1, 2), bool)
    p, v = _run(p, v, free, jnp.zeros((1,)), jnp.full((1, 3), 1e6), 60)
    pa, pb = np.asarray(p[0, 1]), np.asarray(p[0, 0])
    assert abs(pa[1] - (pb[1] + 2 * OBJ_HALF)) < 1e-2, (pa, pb)  # flush
    # kept its lateral offset (support friction, no slide-off)
    assert abs(pa[0] - 0.1) < 0.06 and abs(pa[2] - 0.05) < 0.06, pa
    assert float(jnp.abs(v).max()) < 1e-2


def test_overlapping_spawn_separates():
    p = jnp.array([[[0.0, 0.0, 0.0], [0.05, 0.0, 0.0]]])  # overlapping
    v = jnp.zeros_like(p)
    free = jnp.ones((1, 2), bool)
    p, v = _run(p, v, free, jnp.zeros((1,)), jnp.full((1, 3), 1e6), 40)
    d = float(jnp.linalg.norm(p[0, 0] - p[0, 1]))
    assert d >= 2 * OBJ_HALF - 5e-3, d


def test_robot_push_generates_force():
    p = jnp.array([[[0.1, 0.0, 0.0]]])
    v = jnp.zeros_like(p)
    free = jnp.ones((1, 1), bool)
    agent = jnp.zeros((1, 3))
    p2, v2, force = contact_step(p, v, free, jnp.zeros((1,)), agent)
    assert float(force[0]) > 0.0
    # object pushed out of the agent cylinder
    d = float(jnp.linalg.norm(p2[0, 0, [0, 2]]))
    assert d >= 0.3 + OBJ_HALF - 1e-3


def test_held_object_not_simulated():
    p = jnp.array([[[0.0, 1.0, 0.0]]])
    v = jnp.zeros_like(p)
    free = jnp.zeros((1, 1), bool)  # held
    p2, v2, _ = contact_step(p, v, free, jnp.zeros((1,)), jnp.full((1, 3), 1e6))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-6)


def test_settle_objects_separates_generated_spawns():
    obj = np.array([[[1.0, 0.0, 1.0], [1.05, 0.0, 1.0], [5.0, 0.5, 5.0]]])
    valid = np.ones((1, 3), bool)
    out = settle_objects(obj, valid, np.zeros((1,)), steps=40)
    d01 = np.linalg.norm(out[0, 0] - out[0, 1])
    assert d01 >= 2 * OBJ_HALF - 5e-3
    assert abs(out[0, 2, 1]) < 1e-2  # floater dropped to the floor


def test_contacts_env_end_to_end():
    env = make_rearrange_env(
        num_envs=2,
        task="empty",
        with_visual=False,
        dynamics="contacts",
        max_accum_force=1e9,
        seed=1,
    )
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    a = jnp.zeros((2,), jnp.int32) + 1  # move forward into the scene
    for _ in range(5):
        state, obs, r, d, info = env.step_fn(state, a)
    assert np.all(np.isfinite(np.asarray(state.obj_pos)))
    assert "robot_force" in info and np.all(np.asarray(info["robot_force"]) >= 0)


def test_obb_stacking_non_axis_aligned():
    """Contacts v3 (VERDICT r2 #4): upright OBBs with per-object extents +
    yaw. A box dropped onto a YAWED support box rests ON TOP of it (SAT
    over the footprint axes), and two yawed boxes that only overlap under
    an AABB approximation do NOT collide."""
    far = jnp.full((1, 3), 1e6)
    # support box: 0.2 x 0.1 x 0.2 halves, yawed 40deg; dropped box above it
    half = jnp.asarray([[[0.2, 0.1, 0.2], [0.1, 0.1, 0.1]]], jnp.float32)
    yaw = jnp.asarray([[0.7, 0.0]], jnp.float32)
    p = jnp.asarray([[[0.0, 0.0, 0.0], [0.05, 0.8, 0.05]]], jnp.float32)
    v = jnp.zeros_like(p)
    free = jnp.ones((1, 2), bool)
    for _ in range(50):
        p, v, f = contact_step(
            p, v, free, jnp.zeros((1,)), far, half=half, yaw_o=yaw
        )
    # dropped box settles on the support's top face: bottom at support top
    assert abs(float(p[0, 1, 1]) - 0.2) < 2e-2, np.asarray(p)
    assert float(jnp.abs(v).max()) < 5e-2

    # diagonal-gap case: two long thin boxes yawed 45deg, offset so their
    # AABBs overlap but the OBBs do not -> no contact impulse, no motion
    # tall plates: Y overlap (1.0) exceeds any footprint penetration, so
    # the MTV is an XZ axis — the case AABB contacts get wrong
    half2 = jnp.asarray([[[0.30, 0.5, 0.02], [0.30, 0.5, 0.02]]], jnp.float32)
    yaw2 = jnp.asarray([[np.pi / 4, np.pi / 4]], jnp.float32)
    # offset along the plates' THIN axis w=(sin, cos)/|.|: |d.w|=0.14 > 0.04
    # separates the OBBs while the ~0.23-half AABBs still overlap
    p2 = jnp.asarray([[[0.0, 0.0, 0.0], [0.1, 0.0, 0.1]]], jnp.float32)
    v2 = jnp.zeros_like(p2)
    p2b, v2b, _ = contact_step(
        p2, v2, jnp.ones((1, 2), bool), jnp.zeros((1,)), far,
        half=half2, yaw_o=yaw2,
    )
    # same-yaw parallel plates offset along the diagonal: separated
    assert float(jnp.abs(p2b[..., [0, 2]] - p2[..., [0, 2]]).max()) < 1e-4

    # rotate the second plate to cross the first -> OBB contact resolves
    yaw3 = jnp.asarray([[np.pi / 4, -np.pi / 4]], jnp.float32)
    p3 = jnp.asarray([[[0.0, 0.0, 0.0], [0.02, 0.0, 0.0]]], jnp.float32)
    p3b, v3b, _ = contact_step(
        p3, jnp.zeros_like(p3), jnp.ones((1, 2), bool), jnp.zeros((1,)), far,
        half=half2, yaw_o=yaw3,
    )
    assert float(jnp.abs(p3b[..., [0, 2]] - p3[..., [0, 2]]).max()) > 1e-3


def test_obb_default_matches_legacy_aabb():
    """Scalar half + no yaw reproduces the v2 axis-aligned behavior."""
    p = jnp.array([[[0.0, 0.0, 0.0], [0.1, 0.5, 0.0]]])
    v = jnp.zeros_like(p)
    free = jnp.ones((1, 2), bool)
    far = jnp.full((1, 3), 1e6)
    for _ in range(40):
        p, v, _ = contact_step(p, v, free, jnp.zeros((1,)), far)
    # stacked flush: top box bottom at 2*OBJ_HALF
    assert abs(float(p[0, 1, 1]) - 2 * OBJ_HALF) < 2e-2, np.asarray(p)
