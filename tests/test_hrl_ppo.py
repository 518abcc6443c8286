"""HRL-PPO updater + ArtObjSkill."""

import numpy as np

import jax
import jax.numpy as jnp

from habitat_tpu.baselines.hrl.hierarchical import (
    ArtObjSkill,
    FixedHighLevelPolicy,
    HierarchicalPolicy,
    NavToGoalSkill,
    OracleNavSkill,
    PickSkill,
    PlaceSkill,
)
from habitat_tpu.baselines.hrl.hrl_ppo import HrlPPOConfig, HrlPPOLearner
from habitat_tpu.core.registry import registry
from habitat_tpu.tasks.rearrange.generator import make_rearrange_env


def test_hrl_ppo_train_step():
    env = make_rearrange_env(
        num_envs=4, task="rearrange", seed=0, n_rooms_per_axis=1, n_clutter=0
    )
    skills = [OracleNavSkill(), PickSkill(), NavToGoalSkill(), PlaceSkill()]
    learner = HrlPPOLearner(
        env,
        skills,
        HrlPPOConfig(num_macro_steps=4, hl_interval=4, hidden_size=32),
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step)
    ts, m = step(ts)
    p0 = ts.params
    ts, m = step(ts)
    assert np.isfinite(float(m["losses/hl_loss"]))
    assert np.isfinite(float(m["reward"]))
    assert m["success"].shape == ()
    # parameters actually move
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(ts.params))
    )
    assert diff > 0
    assert int(ts.update_idx) == 2


def test_hrl_ppo_registered():
    assert registry.get_updater("hrl_ppo") is HrlPPOLearner


def test_art_obj_skill_opens():
    env = make_rearrange_env(
        num_envs=4, task="open", seed=1, n_rooms_per_axis=1, n_clutter=0
    )
    state, _ = jax.jit(env.reset_fn)(jax.random.PRNGKey(0))
    hl = FixedHighLevelPolicy(env, [ArtObjSkill()])
    pol = HierarchicalPolicy(env, hl)
    q0 = np.asarray(state.art_q)
    state, _, rs, dones, succ = jax.jit(
        lambda s, h: pol.rollout(s, h, 120), static_argnums=()
    )(state, pol.init_state())
    n_idx = np.arange(env.num_envs)
    art_t = np.asarray(env.table.art_target)[np.asarray(state.ep_idx)]
    goal = np.asarray(env.table.art_goal_q)[np.asarray(state.ep_idx)]
    q = np.asarray(state.art_q)[n_idx, art_t]
    # joints moved toward goal in at least most envs (auto-reset lanes may
    # have restarted); require mean progress vs the initial state
    d0 = np.abs(q0[n_idx, art_t] - goal).mean()
    d1 = np.abs(q - goal).mean()
    assert d1 < d0 or np.asarray(succ).any()
