"""IL (behavior cloning) tests (reference il/ trainer coverage)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.baselines.il.bc_trainer import BCConfig, BCLearner
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.models.policy import make_pointnav_resnet_policy


def test_bc_learns_to_imitate_follower():
    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=2, episodes_per_scene=6, seed=5, extent=8.0
    )
    env = make_nav_env(
        scenes, episodes, num_envs=8, precomputed_fields=fields, max_episode_steps=100
    )
    policy = make_pointnav_resnet_policy(
        len(env.actions), has_visual=False, hidden_size=64
    )
    learner = BCLearner(env, policy, BCConfig(num_steps=32, lr=2e-3))
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    first, last = [], []
    for i in range(30):
        ts, m = step(ts)
        if i < 5:
            first.append(float(m["teacher_match"]))
        if i >= 25:
            last.append(float(m["teacher_match"]))
    # the clone must track the teacher increasingly well
    assert np.mean(last) > np.mean(first) + 0.15, (np.mean(first), np.mean(last))
    assert np.mean(last) > 0.5
