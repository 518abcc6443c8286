"""Contacts v6 (round 5): box-box pairs use the FULL 15-axis OBB-OBB SAT
on true orientations, not the upright-OBB cover. The observable difference
from v5: a diagonally-tipped box presents its REAL cross-section — a
neighbour that only intersects the fattened upright cover is NOT touched,
while true overlaps still resolve (reference: Bullet's btBoxBoxDetector).
"""

import numpy as np
import jax
import jax.numpy as jnp

from habitat_tpu.tasks.rearrange.rearrange_env import contact_step
from habitat_tpu.tasks.rearrange.rigid_body import (
    effective_upright_obb,
    quat_identity,
)


def _quat_roll_z(a):
    """Rotation about world +Z by angle a (tips a box sideways)."""
    h = 0.5 * a
    return jnp.asarray([np.cos(h), 0.0, 0.0, np.sin(h)], jnp.float32)


def _step_once(pos, quat, half, n=1):
    N, O = pos.shape[:2]
    vel = jnp.zeros((N, O, 3), jnp.float32)
    omega = jnp.zeros((N, O, 3), jnp.float32)
    free = jnp.ones((N, O), bool)
    floor = jnp.zeros((N,), jnp.float32)
    agent = jnp.array([[50.0, 0.0, 50.0]], jnp.float32)
    step = jax.jit(
        lambda p, v, q, w: contact_step(
            p, v, free, floor, agent, dt=0.02, n_substeps=2,
            half=half, quat=q, omega=w,
        )
    )
    for _ in range(n):
        pos, vel, force, quat, omega = step(pos, vel, quat, omega)
    return pos, vel, quat, omega


def test_tipped_box_true_cross_section_no_phantom_contact():
    """A cube rolled 45 deg about Z presents a DIAMOND cross-section: at
    its bottom-tip heights the true width shrinks to ~0, while the
    upright cover keeps the full h*sqrt(2) at every height. A SHORT
    neighbour parked low, inside the cover's footprint but clear of the
    diamond, must see NO lateral interaction under v6 (the v5 cover
    pushed it away)."""
    h = 0.15
    h2 = 0.05
    s2 = float(np.sqrt(2.0))
    half = jnp.asarray([[[h, h, h], [h2, h2, h2]]], jnp.float32)
    q_tip = _quat_roll_z(np.pi / 4)
    quat = jnp.stack(
        [jnp.stack([q_tip, quat_identity(()).reshape(4)])], axis=0
    )
    # tipped-cube center rests at y = h*sqrt(2) (balanced on its edge);
    # diamond half-width at height y is h*sqrt(2) - |y - h*sqrt(2)|.
    # Neighbour spans y in [0, 0.1]: diamond width there <= 0.10, so a
    # left face at x = 0.14 clears it; the cover spans |x| <= 0.212 at
    # every height, so the cover DOES overlap.
    nx = 0.19
    pos = jnp.asarray(
        [[[0.0, h * s2 - h, 0.0], [nx, 0.0, 0.0]]], jnp.float32
    )
    _, half_eff = effective_upright_obb(quat, half)
    assert float(half_eff[0, 0, 0]) + h2 > nx  # cover would touch
    p0 = np.asarray(pos)
    pos2, vel2, quat2, _ = _step_once(pos, quat, half, n=1)
    assert abs(float(pos2[0, 1, 0]) - p0[0, 1, 0]) < 1e-4, (
        "phantom cover contact moved the upright neighbour"
    )
    assert abs(float(vel2[0, 1, 0])) < 1e-4


def test_tipped_box_true_contact_resolves():
    """Slide the upright neighbour INTO the tipped cube's true diamond:
    the 15-axis SAT must separate them (positions adjust / velocity
    impulse appears)."""
    h = 0.15
    s2 = float(np.sqrt(2.0))
    half = jnp.asarray([[[h, h, h], [h, h, h]]], jnp.float32)
    q_tip = _quat_roll_z(np.pi / 4)
    quat = jnp.stack(
        [jnp.stack([q_tip, quat_identity(()).reshape(4)])], axis=0
    )
    # deep true overlap at the diamond's widest height (center level)
    pos = jnp.asarray(
        [[[0.0, h * s2 - h, 0.0], [h * s2 + h - 0.12, h * s2 - h, 0.0]]],
        jnp.float32,
    )
    p0 = np.asarray(pos)
    pos2, _, _, _ = _step_once(pos, quat, half, n=2)
    moved = abs(float(pos2[0, 1, 0]) - p0[0, 1, 0]) + abs(
        float(pos2[0, 0, 0]) - p0[0, 0, 0]
    )
    assert moved > 5e-3, "true OBB overlap was not resolved"
    # separation direction: the pair moved APART in x
    gap0 = p0[0, 1, 0] - p0[0, 0, 0]
    gap2 = float(pos2[0, 1, 0]) - float(pos2[0, 0, 0])
    assert gap2 > gap0
