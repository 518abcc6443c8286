"""Batched env semantics: sensor math, measures, reward/done, auto-reset.

Mirrors the reference's sensor/measure numeric assertions
(test/test_sensors.py:224 pointgoal-with-gps-compass vector math) and env
lifecycle tests (test/test_habitat_env.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.core.batched_env import RewardSpec
from habitat_tpu.datasets.pointnav import make_procedural_pointnav

N_ENVS = 4

# action ids with DEFAULT_NAV_ACTIONS
STOP, FWD, LEFT, RIGHT = 0, 1, 2, 3


@pytest.fixture(scope="module")
def env_setup():
    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=2, episodes_per_scene=6, seed=1
    )
    assert len(episodes) >= 8
    env = make_nav_env(
        scenes,
        episodes,
        N_ENVS,
        sensor_specs=(
            ("PointGoalWithGPSCompassSensor", None),
            ("GPSSensor", None),
            ("CompassSensor", None),
            ("HeadingSensor", None),
        ),
        precomputed_fields=fields,
        max_episode_steps=50,
    )
    return env, scenes, episodes


def test_reset_shapes_and_values(env_setup):
    env, scenes, episodes = env_setup
    state, obs = env.reset(seed=0)
    assert obs["pointgoal_with_gps_compass"].shape == (N_ENVS, 2)
    assert obs["gps"].shape == (N_ENVS, 2)
    # at reset: gps = 0, compass = 0
    np.testing.assert_allclose(np.asarray(obs["gps"]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(obs["compass"]), 0.0, atol=1e-5)
    # pointgoal rho matches euclidean distance to goal
    ep = np.asarray(state.ep_idx)
    goal = np.asarray(env.table.goal_pos)[ep, 0]
    start = np.asarray(env.table.start_pos)[ep]
    rho = np.linalg.norm((goal - start)[:, [0, 2]], axis=-1)
    np.testing.assert_allclose(
        np.asarray(obs["pointgoal_with_gps_compass"])[:, 0], rho, atol=1e-4
    )


def test_turn_updates_compass_and_heading(env_setup):
    env, *_ = env_setup
    state, obs = env.reset(seed=0)
    yaw0 = np.asarray(state.yaw).copy()
    state, obs, r, d, info = env.step(state, jnp.full((N_ENVS,), LEFT))
    # turn_left increases yaw by 10 deg
    np.testing.assert_allclose(
        np.asarray(state.yaw) - yaw0, np.deg2rad(10.0), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(obs["compass"])[:, 0], np.deg2rad(10.0), atol=1e-5
    )


def test_forward_moves_and_gps(env_setup):
    env, *_ = env_setup
    state, obs = env.reset(seed=0)
    pos0 = np.asarray(state.pos).copy()
    state, obs, r, d, info = env.step(state, jnp.full((N_ENVS,), FWD))
    moved = np.linalg.norm(np.asarray(state.pos) - pos0, axis=-1)
    collided = np.asarray(state.collided)
    # moved 0.25m unless collided
    assert np.all((np.abs(moved - 0.25) < 1e-4) | collided)
    # gps x (forward in start frame) ~ moved distance at step 1
    gps = np.asarray(obs["gps"])
    assert np.all(np.abs(gps[:, 0] - moved) < 0.05)


def _follower_actions(env, state):
    """Batched greedy geodesic follower actions (tests ops/navgrid follower)."""
    import functools
    from habitat_tpu.ops.navgrid import greedy_follower_step

    if not hasattr(env, "_follower_jit"):

        def fn(ep_idx, pos, yaw):
            fields = env.table.dist_field[ep_idx].astype(jnp.float32)
            sid = env.table.scene_idx[ep_idx]
            f = functools.partial(
                greedy_follower_step,
                goal_radius=0.2,
                forward_step=0.25,
                turn_angle=np.deg2rad(10.0),
            )
            return jax.vmap(lambda s_, fl, p, y: f(env.pack, s_, fl, p, y))(
                sid, fields, pos, yaw
            )

        env._follower_jit = jax.jit(fn)
    return env._follower_jit(state.ep_idx, state.pos, state.yaw)


def test_follower_decreases_geodesic_distance(env_setup):
    env, *_ = env_setup
    state, obs = env.reset(seed=0)
    d_start = None
    d_min = None
    # stay under the 50-step episode limit so no env auto-resets mid-test
    for t in range(45):
        act = _follower_actions(env, state)
        # don't let follower stop (keep episode running): replace STOP by FWD
        act = jnp.where(act == STOP, FWD, act)
        state, obs, r, d, info = env.step(state, act)
        d_now = np.asarray(info["distance_to_goal"])
        if d_start is None:
            d_start = d_now.copy()
            d_min = d_now.copy()
        d_min = np.minimum(d_min, d_now)
        assert not np.any(np.asarray(d)), "no env should reset in 45 steps"
    # the follower must make progress on every env
    assert np.all(d_min < d_start - 0.2), (d_start, d_min)


def test_stop_terminates_and_autoresets(env_setup):
    env, *_ = env_setup
    state, obs = env.reset(seed=0)
    ep0 = np.asarray(state.ep_idx).copy()
    state, obs, r, done, info = env.step(state, jnp.full((N_ENVS,), STOP))
    assert np.all(np.asarray(done))
    # auto-reset advanced to the next episode, step reset to 0
    assert np.all(np.asarray(state.step) == 0)
    assert np.all(np.asarray(state.episode_count) == 1)
    ep1 = np.asarray(state.ep_idx)
    assert np.any(ep1 != ep0) or len(set(ep0)) == 1
    # success=0 when stopping far from goal
    assert np.all(np.asarray(info["success"]) == 0.0)
    # slack reward only
    np.testing.assert_allclose(np.asarray(r), -0.01, atol=1e-5)


def test_max_steps_truncation(env_setup):
    env, *_ = env_setup
    state, obs = env.reset(seed=0)
    done_seen = np.zeros(N_ENVS, bool)
    for t in range(50):
        state, obs, r, done, info = env.step(state, jnp.full((N_ENVS,), LEFT))
        done_seen |= np.asarray(done)
    assert np.all(done_seen)  # 50-step limit forces done with no stop


@pytest.fixture(scope="module")
def long_env(env_setup):
    """Same scenes/episodes but a 250-step limit so the follower can finish."""
    _, scenes, episodes = env_setup
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav

    _, _, fields = make_procedural_pointnav(num_scenes=2, episodes_per_scene=6, seed=1)
    return make_nav_env(
        scenes, episodes, N_ENVS, precomputed_fields=fields, max_episode_steps=250
    )


def test_success_and_spl_when_reaching_goal(long_env):
    """Drive the geodesic follower; on stop at goal: success=1, spl>0."""
    env = long_env
    state, obs = env.reset(seed=0)
    success_hit = np.zeros(N_ENVS, bool)
    spl_vals = np.zeros(N_ENVS, np.float32)
    for t in range(200):
        act = _follower_actions(env, state)
        state, obs, r, done, info = env.step(state, act)
        s = np.asarray(info["success"]) > 0
        newly = s & ~success_hit
        spl_vals[newly] = np.asarray(info["spl"])[newly]
        success_hit |= s
        # success must imply positive reward (success_reward=2.5)
        if np.any(newly):
            assert np.all(np.asarray(r)[newly] > 2.0)
    # greedy euclidean steering succeeds in at least one env
    assert success_hit.sum() >= 1, success_hit
    assert np.all(spl_vals[success_hit] > 0.05)
    assert np.all(spl_vals[success_hit] <= 1.0 + 1e-5)


def test_collision_counting(env_setup):
    env, *_ = env_setup
    state, obs = env.reset(seed=0)
    # ram forward into a wall for 60 steps; collisions must accumulate
    for _ in range(45):
        state, obs, r, done, info = env.step(state, jnp.full((N_ENVS,), FWD))
    assert np.asarray(info["collisions"]).max() > 0


def test_step_is_jit_pure(env_setup):
    """step_fn under an outer jit + scan (the trainer's usage)."""
    env, *_ = env_setup

    def unroll(state, _):
        state, obs, r, d, info = env.step_fn(state, jnp.full((N_ENVS,), FWD))
        return state, (r, d)

    state, obs = env.reset(seed=0)
    state2, (rs, ds) = jax.jit(
        lambda s: jax.lax.scan(unroll, s, None, length=8)
    )(state)
    assert rs.shape == (8, N_ENVS)
