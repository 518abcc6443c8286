"""Rearrangement stack tests (mirrors reference test/test_rearrange_task.py:
task smoke, grasp semantics, pick/place success logic)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.tasks.rearrange.generator import make_rearrange_env
from habitat_tpu.tasks.rearrange.rearrange_env import (
    A_FWD,
    A_GRAB,
    A_LEFT,
    A_RIGHT,
    A_STOP,
)

N = 4


@pytest.fixture(scope="module")
def pick_env():
    return make_rearrange_env(
        num_envs=N,
        task="pick",
        with_visual=False,
        max_episode_steps=150,
        n_rooms_per_axis=1,
        n_clutter=0,
    )


def test_reset_and_sensors(pick_env):
    env = pick_env
    state, obs = env.reset(seed=0)
    assert obs["obj_start_sensor"].shape == (N, 3)
    assert obs["obj_goal_sensor"].shape == (N, 3)
    assert obs["is_holding"].shape == (N, 1)
    assert np.all(np.asarray(obs["is_holding"]) == 0)
    assert obs["joint"].shape == (N, 7)


def test_grab_out_of_range_no_pick(pick_env):
    env = pick_env
    state, obs = env.reset(seed=0)
    # episodes start >= 1m from objects; EE reach is <= grasp_distance from
    # the agent, so immediate grab may or may not connect; drive away first
    for _ in range(3):
        state, obs, r, d, info = env.step(state, jnp.full((N,), A_LEFT))
    assert np.all(np.asarray(state.held) >= -1)


def _drive_to_target(env, state, max_steps=150, stop_dist=0.7):
    """Greedy drive toward the pick target using the relative sensor."""
    for t in range(max_steps):
        obs = env._observations(state)
        rel = np.asarray(obs["obj_start_sensor"])  # agent frame
        dist = np.linalg.norm(rel[:, [0, 2]], axis=-1)
        # angle to object: forward is -z in agent frame, left positive
        ang = np.arctan2(-rel[:, 0], -rel[:, 2])
        act = np.where(
            dist < stop_dist,
            A_GRAB,
            np.where(
                np.abs(ang) < np.deg2rad(12),
                A_FWD,
                np.where(ang > 0, A_LEFT, A_RIGHT),
            ),
        )
        state, obs2, r, d, info = env.step(state, jnp.asarray(act))
        if np.any(np.asarray(info["did_pick_object"]) > 0):
            return state, info, True
    return state, info, False


def test_pick_success_via_greedy_drive(pick_env):
    env = pick_env
    state, obs = env.reset(seed=0)
    state, info, picked = _drive_to_target(env, state)
    assert picked, "no env managed to grab its target object"


def test_place_task_success():
    env = make_rearrange_env(
        num_envs=N,
        task="place",
        with_visual=False,
        max_episode_steps=250,
        seed=1,
        n_rooms_per_axis=1,
        n_clutter=0,
    )
    state, obs = env.reset(seed=0)
    succeeded = False
    for t in range(200):
        obs = env._observations(state)
        holding = np.asarray(obs["is_holding"])[:, 0] > 0
        rel_obj = np.asarray(obs["obj_start_sensor"])
        rel_goal = np.asarray(obs["obj_goal_sensor"])
        rel = np.where(holding[:, None], rel_goal, rel_obj)
        dist = np.linalg.norm(rel[:, [0, 2]], axis=-1)
        ang = np.arctan2(-rel[:, 0], -rel[:, 2])
        # when near the objective: grab (if not holding) or release (if close
        # to goal while holding)
        near = dist < np.where(holding, 0.45, 0.7)
        act = np.where(
            near,
            A_GRAB,
            np.where(
                np.abs(ang) < np.deg2rad(12),
                A_FWD,
                np.where(ang > 0, A_LEFT, A_RIGHT),
            ),
        )
        state, obs2, r, d, info = env.step(state, jnp.asarray(act))
        if np.any(np.asarray(info["place_success"]) > 0):
            succeeded = True
            break
    assert succeeded, "no env placed its object at the goal"
    # success implies positive reward for those envs
    winners = np.asarray(info["place_success"]) > 0
    assert np.all(np.asarray(r)[winners] > 1.0)


def test_held_object_follows_agent(pick_env):
    env = pick_env
    state, obs = env.reset(seed=0)
    state, info, picked = _drive_to_target(env, state)
    held = np.asarray(state.held)
    moving = held >= 0
    if not moving.any():
        pytest.skip("no grab achieved")
    objs_before = np.asarray(env._obj_world(state))
    for _ in range(4):
        state, obs, r, d, info = env.step(state, jnp.full((N,), A_FWD))
    objs_after = np.asarray(env._obj_world(state))
    i = int(np.nonzero(moving)[0][0])
    if bool(np.asarray(state.held)[i] >= 0) and not bool(np.asarray(state.episode_over)[i]):
        o = int(held[i])
        moved = np.linalg.norm(objs_after[i, o] - objs_before[i, o])
        collided_all = np.asarray(state.collision_count)[i] >= 4
        assert moved > 0.01 or collided_all


def test_rearrange_render_includes_objects():
    env = make_rearrange_env(
        num_envs=2, task="pick", with_visual=True, render_size=(48, 48), seed=2
    )
    state, obs = env.reset(seed=0)
    assert obs["robot_head_rgb"].shape == (2, 48, 48, 3)
    assert obs["robot_head_depth"].shape == (2, 48, 48, 1)
    # dynamic pass ran: some pixels carry object semantic ids in a render
    # pointing at an object (hard to guarantee; at least frames are valid)
    assert np.asarray(obs["robot_head_depth"]).min() >= 0.0


def test_step_jit_scan():
    env = make_rearrange_env(num_envs=2, task="pick", with_visual=False)
    state, obs = env.reset(seed=0)

    def unroll(s, _):
        s, o, r, d, i = env.step_fn(s, jnp.full((2,), A_FWD))
        return s, r

    s2, rs = jax.jit(lambda s: jax.lax.scan(unroll, s, None, length=4))(state)
    assert rs.shape == (4, 2)


def test_rearrange_from_config():
    from habitat_tpu.config.default import get_config
    from habitat_tpu.core.construct import env_from_config

    cfg = get_config(
        "benchmark/rearrange/pick_procgen.yaml",
        [
            "habitat.dataset.procedural.num_scenes=1",
            "habitat.dataset.procedural.episodes_per_scene=4",
        ],
    )
    assert cfg.habitat.task.type == "RearrangePickTask-v0"
    env = env_from_config(cfg, num_envs=2)
    assert env.task == "pick"
    state, obs = env.reset(seed=0)
    assert "robot_head_depth" in obs


def test_rearrange_gym_id():
    import gymnasium as gym
    import habitat_tpu.gym.gym_definitions  # noqa: F401

    env = gym.make(
        "HabitatPick-v0",
        with_visual=False,
        num_scenes=1,
        episodes_per_scene=2,
        n_rooms_per_axis=1,
        n_clutter=0,
    )
    obs, _ = env.reset(seed=0)
    assert "obj_start_sensor" in obs
    obs, reward, term, trunc, info = env.step(1)
    assert "pick_success" in info
    env.close()


@pytest.mark.slow
def test_rearrange_pick_learns():
    """PPO on kinematic pick: success must emerge within 80 updates."""
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.models.policy import make_pointnav_resnet_policy

    env = make_rearrange_env(
        num_envs=8,
        task="pick",
        with_visual=False,
        n_rooms_per_axis=1,
        n_clutter=0,
        max_episode_steps=64,
    )
    policy = make_pointnav_resnet_policy(
        env.action_space.n, has_visual=False, hidden_size=64, goal_keys=()
    )
    learner = PPOLearner(
        env,
        policy,
        PPOConfig(num_steps=32, num_mini_batch=2, ppo_epoch=2, lr=1e-3),
        measure_keys=("success",),
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    late_succ = []
    for i in range(80):
        ts, m = step(ts)
        dc = float(m["done_count"])
        if i >= 40 and dc > 0:
            late_succ.append(float(m.get("m_success", 0.0)) / dc)
    assert np.mean(late_succ) > 0.05, np.mean(late_succ)


def test_art_obj_open_drawer():
    """ArtObj open task (reference sub_tasks/articulated_object_task.py):
    navigate to the drawer handle, interact until open."""
    env = make_rearrange_env(
        num_envs=N,
        task="open",
        with_visual=False,
        max_episode_steps=200,
        n_rooms_per_axis=1,
        n_clutter=0,
        seed=4,
    )
    state, obs = env.reset(seed=0)
    assert np.allclose(np.asarray(state.art_q), 0.0)
    opened = False
    for t in range(200):
        # steer to the handle using the measure-provided handle position
        handle = np.asarray(env._handle_pos(state))
        pos = np.asarray(state.pos)
        yaw = np.asarray(state.yaw)
        d = handle - pos
        dist = np.linalg.norm(d[:, [0, 2]], axis=-1)
        # agent-frame angle
        ang_world = np.arctan2(-d[:, 0], -d[:, 2])
        ang = np.arctan2(np.sin(ang_world - yaw), np.cos(ang_world - yaw))
        act = np.where(
            dist < 0.8,
            A_GRAB,
            np.where(np.abs(ang) < np.deg2rad(12), A_FWD, np.where(ang > 0, A_LEFT, A_RIGHT)),
        )
        state, obs, r, done, info = env.step(state, jnp.asarray(act))
        if np.any(np.asarray(info["art_obj_at_desired_state"]) > 0):
            opened = True
            break
    assert opened, "no env opened its drawer"
    assert np.asarray(info["art_obj_state"]).max() > 0.3


def test_art_obj_renders():
    env = make_rearrange_env(
        num_envs=2, task="open", with_visual=True, render_size=(32, 32), seed=5
    )
    state, obs = env.reset(seed=0)
    assert obs["robot_head_rgb"].shape == (2, 32, 32, 3)


def test_gfx_replay_roundtrip(pick_env, tmp_path):
    """Keyframe record/write/load + replay render (reference write_gfx_replay
    + GfxReplayMeasure semantics)."""
    from habitat_tpu.utils.gfx_replay import (
        GfxReplayRecorder,
        load_gfx_replay,
        render_keyframe,
    )

    env = pick_env
    state, obs = env.reset(seed=0)
    rec = GfxReplayRecorder(env, env_idx=0)
    for _ in range(5):
        state, obs, r, d, info = env.step(state, jnp.full((N,), A_FWD))
        rec.record(state)
    path = str(tmp_path / "replay.json.gz")
    rec.write(path)
    kfs = load_gfx_replay(path)
    assert len(kfs) == 5
    assert "rigid_objects" in kfs[0] and "articulated_states" in kfs[0]
    frame = render_keyframe(env, kfs[-1], height=32, width=32)
    assert frame["rgb"].shape == (32, 32, 3)


def test_gravity_dynamics():
    """Opt-in rigid-body stepper: released objects fall and settle."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

    env = make_rearrange_env(
        num_envs=2, task="place", seed=5, n_rooms_per_axis=1, n_clutter=0,
        dynamics="gravity",
    )
    state, _ = jax.jit(env.reset_fn)(jax.random.PRNGKey(0))
    n_idx = jnp.arange(env.num_envs)
    tgt = env.table.pick_target[state.ep_idx]
    # force-hold the target (place task starts holding anyway for some seeds)
    import dataclasses as dc

    state = dc.replace(state, held=tgt)
    step = jax.jit(env.step_fn)
    # release mid-air: GRAB drops the object at EE height (~0.9m up)
    state, *_ = step(state, jnp.full((env.num_envs,), 4, jnp.int32))
    y0 = np.asarray(state.obj_pos)[np.arange(2), np.asarray(tgt), 1]
    floor = np.asarray(env.pack.floor_y)[np.asarray(env.table.nav.scene_idx[state.ep_idx])]
    assert (y0 > floor + 0.2).all(), "object should start falling from EE height"
    # a few steps later it has settled on the floor with zero velocity
    for _ in range(8):
        state, *_ = step(state, jnp.zeros((env.num_envs,), jnp.int32))
    y1 = np.asarray(state.obj_pos)[np.arange(2), np.asarray(tgt), 1]
    np.testing.assert_allclose(y1, floor, atol=1e-4)
    v = np.asarray(state.obj_vel)[np.arange(2), np.asarray(tgt)]
    np.testing.assert_allclose(v, 0.0, atol=1e-6)


def test_open_fridge_revolute():
    """Revolute (fridge-door) articulated task: steering to the swinging
    handle and grabbing drives q in radians to the open goal (reference
    open_fridge, sub_tasks/articulated_object_task.py)."""
    env = make_rearrange_env(
        num_envs=2, task="open", art_joint="revolute", with_visual=False,
        max_episode_steps=300, seed=1, n_rooms_per_axis=1, n_clutter=0,
    )
    assert bool(np.asarray(env.table.art_is_revolute).all())
    state, obs = env.reset(seed=0)
    q0 = np.asarray(state.art_q).copy()
    opened = False
    for t in range(300):
        handle = np.asarray(env._handle_pos(state))
        pos = np.asarray(state.pos)
        yaw = np.asarray(state.yaw)
        d = handle - pos
        dist = np.linalg.norm(d[:, [0, 2]], axis=-1)
        ang_world = np.arctan2(-d[:, 0], -d[:, 2])
        ang = np.arctan2(np.sin(ang_world - yaw), np.cos(ang_world - yaw))
        act = np.where(
            dist < 0.8,
            A_GRAB,
            np.where(np.abs(ang) < np.deg2rad(12), A_FWD,
                     np.where(ang > 0, A_LEFT, A_RIGHT)),
        )
        state, obs, r, done, info = env.step(state, jnp.asarray(act))
        if np.any(np.asarray(info["art_obj_at_desired_state"]) > 0):
            opened = True
            break
    assert opened, "no env opened its fridge door"
    # success-step measures (pre-auto-reset): the door swung in RADIANS
    assert np.asarray(info["art_obj_state"]).max() > 1.0


def test_nav_to_obj_task():
    """Standalone NavToObj (reference sub_tasks/nav_to_obj_task.py): drive to
    the target object, face it, call stop -> success."""
    env = make_rearrange_env(
        num_envs=2, task="nav_to_obj", with_visual=False,
        max_episode_steps=300, seed=2, n_rooms_per_axis=1, n_clutter=0,
    )
    state, obs = env.reset(seed=0)
    got = False
    for t in range(300):
        n_idx = np.arange(env.num_envs)
        tgt = np.asarray(env.table.pick_target[state.ep_idx])
        obj = np.asarray(env._obj_world(state))[n_idx, tgt]
        pos = np.asarray(state.pos); yaw = np.asarray(state.yaw)
        d = obj - pos
        dist = np.linalg.norm(d[:, [0, 2]], axis=-1)
        ang_world = np.arctan2(-d[:, 0], -d[:, 2])
        ang = np.arctan2(np.sin(ang_world - yaw), np.cos(ang_world - yaw))
        act = np.where(
            (dist < 1.2) & (np.abs(ang) < 0.3),
            A_STOP,
            np.where(np.abs(ang) < np.deg2rad(12), A_FWD,
                     np.where(ang > 0, A_LEFT, A_RIGHT)),
        )
        state, obs, r, done, info = env.step(state, jnp.asarray(act))
        if np.asarray(info["nav_to_obj_success"]).any():
            got = True
            break
    assert got, "no env reached + faced + stopped at its object"


def test_constraint_violation_grasp():
    """Grasp-constraint violation (reference RearrangeGraspManager rigid
    constraint + task flags, default_structured_configs.py:1489-1490): a held
    box penetrating another box generates force, is reported as a measure,
    and with constraint_violation_drops_object the grasp breaks."""
    import dataclasses

    env = make_rearrange_env(
        num_envs=2, task="empty", with_visual=False, seed=5,
        n_rooms_per_axis=1, n_clutter=0, num_objects=3,
        constraint_violation_drops_object=True,
    )
    state, obs = env.reset(seed=0)
    # hold object 0 and park object 1 exactly at the EE -> AABB overlap
    ee = np.asarray(env._ee_pos(state))
    obj_pos = np.array(state.obj_pos)
    obj_pos[:, 1] = ee
    state = dataclasses.replace(
        state,
        held=jnp.zeros((2,), jnp.int32),
        obj_pos=jnp.asarray(obj_pos),
    )
    f0 = np.asarray(state.accum_force).copy()
    state, obs, r, done, info = env.step(state, jnp.full((2,), A_LEFT))
    assert np.all(np.asarray(info["constraint_violation"]) == 1.0)
    assert np.all(np.asarray(state.accum_force) > f0)
    assert np.all(np.asarray(state.held) == -1)  # grasp broke

    # control: no overlap -> no violation, grasp holds
    state2, _ = env.reset(seed=1)
    state2 = dataclasses.replace(state2, held=jnp.zeros((2,), jnp.int32))
    # park other objects far away
    far = np.array(state2.obj_pos)
    far[:, 1:] = 50.0
    state2 = dataclasses.replace(state2, obj_pos=jnp.asarray(far))
    state2, obs, r, done, info = env.step(state2, jnp.full((2,), A_LEFT))
    assert np.all(np.asarray(info["constraint_violation"]) == 0.0)
    assert np.all(np.asarray(state2.held) == 0)


def test_reach_task_trains_to_success():
    """RearrangeReachTask-v0 parity (reference sub_tasks/reach_task.py +
    the CI learning floor, test/test_baseline_training.py:428): arm-control
    PPO reaches the per-episode workspace goal."""
    import jax

    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.models.policy import make_gaussian_resnet_policy

    env = make_rearrange_env(
        num_envs=32, task="reach", with_visual=False, control="arm",
        n_rooms_per_axis=1, n_clutter=0, max_episode_steps=40, seed=0,
    )
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    assert obs["relative_resting_position"].shape == (32, 3)
    dim = env.action_space.shape[0]
    policy = make_gaussian_resnet_policy(dim, has_visual=False, hidden_size=64)
    learner = PPOLearner(
        env, policy,
        PPOConfig(num_steps=16, num_mini_batch=2, ppo_epoch=2, lr=3e-4),
        measure_keys=("rearrange_reach_success", "ee_to_resting_distance"),
        action_type="gaussian",
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    succ = 0.0
    for u in range(60):
        ts, m = step(ts)
        dc = float(m.get("done_count", 0.0))
        if dc > 0:
            succ = float(m.get("m_rearrange_reach_success", 0.0)) / dc
        if u > 20 and succ > 0.6:
            break
    assert succ > 0.6, succ


def test_articulated_dynamics_open_and_coast():
    """Articulated joint dynamics (dynamic modes): pulling the handle
    accelerates the joint toward the goal; releasing mid-way lets it COAST
    under inertia and settle by friction (reference: Bullet articulated
    step with joint damping, rearrange_sim.py:1017-1028) — unlike the
    kinematic mode where the joint freezes the moment the grab stops."""
    env = make_rearrange_env(
        num_envs=N,
        task="open",
        with_visual=False,
        max_episode_steps=500,
        n_rooms_per_axis=1,
        n_clutter=0,
        seed=4,
        dynamics="contacts",
    )
    state, obs = env.reset(seed=0)
    assert np.allclose(np.asarray(state.art_vel), 0.0)
    # drive every env to its handle, then hold grab
    pulled_steps = np.zeros(N, np.int32)
    for t in range(300):
        handle = np.asarray(env._handle_pos(state))
        pos = np.asarray(state.pos)
        yaw = np.asarray(state.yaw)
        d = handle - pos
        dist = np.linalg.norm(d[:, [0, 2]], axis=-1)
        ang_world = np.arctan2(-d[:, 0], -d[:, 2])
        ang = np.arctan2(np.sin(ang_world - yaw), np.cos(ang_world - yaw))
        at_handle = dist < 0.8
        act = np.where(
            at_handle,
            A_GRAB,
            np.where(np.abs(ang) < np.deg2rad(12), A_FWD, np.where(ang > 0, A_LEFT, A_RIGHT)),
        )
        pulled_steps += at_handle.astype(np.int32)
        state, obs, r, done, info = env.step(state, jnp.asarray(act))
        art_t = np.asarray(env.table.art_target)[np.asarray(state.ep_idx)]
        qd = np.asarray(state.art_vel)[np.arange(N), art_t]
        q = np.asarray(state.art_q)[np.arange(N), art_t]
        # pick an env that has been pulling for a few steps and is mid-slide
        mid = (pulled_steps >= 3) & (q > 0.05) & (q < 0.25) & (qd > 0.05)
        if np.any(mid):
            i = int(np.argmax(mid))
            break
    else:
        raise AssertionError("no env reached a mid-slide pulling state")

    # release: step with a no-op action; the joint must coast forward
    q0 = float(np.asarray(state.art_q)[i, art_t[i]])
    qd0 = float(np.asarray(state.art_vel)[i, art_t[i]])
    noop = jnp.full((N,), A_FWD, jnp.int32)
    coasted = 0.0
    for _ in range(40):
        state, obs, r, done, info = env.step(state, noop)
        if bool(np.asarray(done)[i]):
            break
        qd_i = float(np.asarray(state.art_vel)[i, art_t[i]])
        coasted = float(np.asarray(state.art_q)[i, art_t[i]]) - q0
        if qd_i == 0.0:
            break
    assert coasted > 0.01, (q0, qd0, coasted)  # inertia carried it forward
    # and friction eventually stops it
    assert float(np.asarray(state.art_vel)[i, art_t[i]]) == 0.0
    # joint stays inside its limits
    goal = float(np.asarray(env.table.art_goal_q)[np.asarray(state.ep_idx)[i]])
    qf = float(np.asarray(state.art_q)[i, art_t[i]])
    assert 0.0 <= qf <= max(goal, 0.0) + 1e-6
