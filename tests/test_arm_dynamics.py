"""Articulated dynamics (dynamics.py) — mass-matrix properties, inverse/
forward round trip, analytic pendulum check, energy conservation, PD motor
tracking (reference Bullet joint motors, manipulator.py:79-120)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.articulated_agents.dynamics import (
    ArmDynParams,
    bias_forces,
    default_arm_dynamics,
    forward_dynamics,
    inverse_dynamics,
    kinetic_energy,
    mass_matrix,
    potential_energy,
    step_arm,
)
from habitat_tpu.articulated_agents.params import FETCH, MobileManipulatorParams

PENDULUM = MobileManipulatorParams(
    name="pendulum",
    arm_joints=1,
    joint_axes=("z",),
    link_offsets=((0.5, 0.0, 0.0),),
    arm_root_offset=(0.0, 0.0, 0.0),
    joint_limits_lower=(-100.0,),
    joint_limits_upper=(100.0,),
    resting_pose=(0.0,),
)


def _pend_dyn(m=2.0):
    return ArmDynParams(
        masses=jnp.array([m]),
        kp=jnp.zeros(1),
        kd=jnp.zeros(1),
        lower=jnp.array([-100.0]),
        upper=jnp.array([100.0]),
        armature=0.0,
    )


def test_mass_matrix_symmetric_positive_definite():
    dyn = default_arm_dynamics(FETCH)
    q = jnp.asarray(FETCH.resting_pose) + 0.1
    M = np.asarray(mass_matrix(FETCH, dyn, q))
    np.testing.assert_allclose(M, M.T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(M) > 0)


def test_inverse_forward_round_trip():
    dyn = default_arm_dynamics(FETCH)
    key = jax.random.PRNGKey(0)
    q = jnp.asarray(FETCH.resting_pose, jnp.float32)
    qd = 0.3 * jax.random.normal(key, (7,))
    qdd = jax.random.normal(jax.random.fold_in(key, 1), (7,))
    tau = inverse_dynamics(FETCH, dyn, q, qd, qdd)
    qdd2 = forward_dynamics(FETCH, dyn, q, qd, tau)
    np.testing.assert_allclose(np.asarray(qdd2), np.asarray(qdd), atol=1e-3)


def test_pendulum_matches_analytic():
    """Point pendulum, length L about z with gravity -y:
    qdd = -(g/L) cos(theta), M = m L^2."""
    dyn = _pend_dyn(m=2.0)
    L, g = 0.5, 9.81
    for theta in (0.0, 0.7, -1.2):
        q = jnp.array([theta])
        M = float(mass_matrix(PENDULUM, dyn, q)[0, 0])
        np.testing.assert_allclose(M, 2.0 * L * L, atol=1e-6)
        qdd = float(
            forward_dynamics(PENDULUM, dyn, q, jnp.zeros(1), jnp.zeros(1))[0]
        )
        np.testing.assert_allclose(qdd, -(g / L) * np.cos(theta), rtol=1e-4)
    # centrifugal force of a single point pendulum does no generalized work
    c = bias_forces(PENDULUM, dyn, jnp.array([0.3]), jnp.array([2.0]),
                    gravity=jnp.zeros(3))
    np.testing.assert_allclose(float(c[0]), 0.0, atol=1e-5)


def test_free_swing_conserves_energy():
    dyn = _pend_dyn()
    q, qd = jnp.array([1.2]), jnp.zeros(1)
    e0 = float(kinetic_energy(PENDULUM, dyn, q, qd) + potential_energy(PENDULUM, dyn, q))

    step = jax.jit(
        lambda q, qd: step_arm(PENDULUM, dyn, q, qd, q_target=q, dt=1 / 240.0, substeps=4)
    )
    for _ in range(240):
        q, qd = step(q, qd)
    e1 = float(kinetic_energy(PENDULUM, dyn, q, qd) + potential_energy(PENDULUM, dyn, q))
    assert abs(e1 - e0) < 0.05 * abs(e0) + 0.05, (e0, e1)


def test_pd_motors_track_target_batched():
    """vmapped over envs: PD motors drive the 7-DoF Fetch arm to a target
    pose under gravity (the reference trains ArmRelPos against exactly these
    Bullet joint motors)."""
    dyn = default_arm_dynamics(FETCH, kp=300.0, kd=30.0)
    n = 4
    q0 = jnp.tile(jnp.asarray(FETCH.resting_pose, jnp.float32), (n, 1))
    qd0 = jnp.zeros((n, 7))
    targets = q0 + 0.25 * jax.random.normal(jax.random.PRNGKey(2), (n, 7))
    # reachable targets: strictly inside the joint limits
    targets = jnp.clip(targets, dyn.lower + 0.05, dyn.upper - 0.05)

    step = jax.jit(
        jax.vmap(
            lambda q, qd, tgt: step_arm(FETCH, dyn, q, qd, tgt, dt=1 / 30.0, substeps=8),
            in_axes=(0, 0, 0),
        )
    )
    q, qd = q0, qd0
    for _ in range(60):  # 2 s of sim time
        q, qd = step(q, qd, targets)
    # pure PD leaves a gravity-sag offset of |c|/kp (~0.07 rad at these
    # masses/gains on the x-axis joints; the reference's Bullet motors show
    # the same effect) — assert tracking within that band and at rest
    err = np.max(np.abs(np.asarray(q - targets)))
    assert err < 0.1, err
    assert np.max(np.abs(np.asarray(qd))) < 0.5


def test_env_arm_dynamics_mode():
    """RearrangeBatchedEnv(arm_dynamics=True): the arm integrates toward the
    ACCUMULATED motor target under PD motors + gravity (reference
    ArmRelPosAction over Bullet joint motors), vs the kinematic mode's
    direct joint set (ArmRelPosKinematicAction)."""
    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

    a = jnp.tile(
        jnp.array([[0.5, -0.3, 0.2, 0.4, -0.2, 0.3, -0.4, -1.0, 0.0, 0.0]],
                  jnp.float32),
        (2, 1),
    )
    moved = {}
    for dyn_mode in (False, True):
        env = make_rearrange_env(
            num_envs=2, task="pick", with_visual=False,
            control="arm", arm_dynamics=dyn_mode,
        )
        step = jax.jit(env.step_fn)
        state, obs = jax.jit(env.reset_fn)(jax.random.PRNGKey(0))
        q0 = np.asarray(state.joints)
        for _ in range(10):
            state, obs, rew, done, info = step(state, a)
        dq0 = float(np.asarray(state.joints)[0, 0] - q0[0, 0])
        moved[dyn_mode] = dq0
        assert np.all(np.isfinite(np.asarray(state.joints)))
        if dyn_mode:
            # target accumulated the full command; the arm lags under inertia
            assert float(state.motor_target[0, 0] - q0[0, 0]) == pytest.approx(0.5)
            assert 0.05 < dq0 < 0.5
            assert float(jnp.max(jnp.abs(state.joint_vel))) > 0.0
        else:
            assert dq0 == pytest.approx(0.5)
            assert float(jnp.max(jnp.abs(state.joint_vel))) == 0.0
