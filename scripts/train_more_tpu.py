"""TPU training runs: articulated OPEN task, then social-nav."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
from habitat_tpu.models.policy import make_pointnav_resnet_policy


def train(env, n_act, updates, budget_s, tag):
    policy = make_pointnav_resnet_policy(
        n_act, backbone="resnet9", hidden_size=128, has_visual=False, goal_keys=()
    )
    learner = PPOLearner(
        env, policy, PPOConfig(num_steps=64, num_mini_batch=2, ppo_epoch=2, lr=2.5e-4)
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    t0 = time.time()
    m = {}
    for u in range(updates + 1):
        ts, m = step(ts)
        if time.time() - t0 > budget_s:
            break
    jax.block_until_ready(m["losses/learner_loss"])
    out = {k: round(float(v), 4) for k, v in m.items() if v.ndim == 0}
    print(f"{tag}: upd {u} ({time.time()-t0:.0f}s) {out}", flush=True)


from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

env = make_rearrange_env(
    num_envs=128, task="open", num_scenes=8, episodes_per_scene=16, seed=0,
    with_visual=False, n_rooms_per_axis=1, n_clutter=0, max_episode_steps=120,
)
train(env, env.action_space.n, 6000, 420, "OPEN")

from habitat_tpu.tasks.rearrange.social_nav import make_social_nav_env

senv = make_social_nav_env(num_envs=128, num_scenes=8, seed=0)
train(senv, senv.action_space.n, 6000, 480, "SOCIAL_NAV")
