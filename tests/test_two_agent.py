"""Two-learned-agent training (reference rl/multi_agent/: MultiAgentAccessMgr
:35 + pop_play_wrappers.py — here both policies act in ONE rollout scan and
each runs its own PPO update)."""

import numpy as np
import jax
import jax.numpy as jnp

from habitat_tpu.baselines.multi_agent import TwoAgentPPOLearner
from habitat_tpu.baselines.ppo import PPOConfig
from habitat_tpu.models.policy import make_pointnav_resnet_policy
from habitat_tpu.tasks.rearrange.social_nav import make_social_nav_env


def _make():
    env = make_social_nav_env(
        num_envs=4, num_scenes=1, episodes_per_scene=4, seed=2, two_agent=True
    )
    pols = [
        make_pointnav_resnet_policy(
            env.action_space.n,
            has_visual=False,
            hidden_size=32,
            goal_keys=(),
        )
        for _ in range(2)
    ]
    return env, TwoAgentPPOLearner(
        env, pols, PPOConfig(num_steps=8, num_mini_batch=1, ppo_epoch=1)
    )


def test_two_agent_env_obs_prefixing():
    env = make_social_nav_env(
        num_envs=2, num_scenes=1, episodes_per_scene=2, seed=2, two_agent=True
    )
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    assert "agent_0_gps" in obs and "agent_1_gps" in obs
    assert "agent_1_humanoid_detector_sensor" in obs
    # both agents move under their own actions
    a = jnp.array([[1, 1], [1, 1]], jnp.int32)  # both forward
    s2, o2, r, d, info = env.step_fn(state, a)
    assert np.linalg.norm(np.asarray(s2.pos - state.pos)) > 1e-4
    assert np.linalg.norm(np.asarray(s2.human_pos - state.human_pos)) > 1e-4
    assert r.shape == (2,)


def test_both_agents_params_update():
    env, learner = _make()
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step)
    p0_before = jax.tree.leaves(ts["params"][0])[0].copy()
    p1_before = jax.tree.leaves(ts["params"][1])[0].copy()
    ts, m = step(ts)
    assert np.isfinite(float(m["losses/agent0_loss"]))
    assert np.isfinite(float(m["losses/agent1_loss"]))
    p0_after = jax.tree.leaves(ts["params"][0])[0]
    p1_after = jax.tree.leaves(ts["params"][1])[0]
    assert not np.allclose(np.asarray(p0_before), np.asarray(p0_after))
    assert not np.allclose(np.asarray(p1_before), np.asarray(p1_after))


def test_two_agent_learning_signal():
    """A couple of updates keep everything finite and episodes progress."""
    env, learner = _make()
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(1))
    step = jax.jit(learner.train_step)
    for _ in range(3):
        ts, m = step(ts)
    assert np.isfinite(float(m["reward_step_mean"]))
