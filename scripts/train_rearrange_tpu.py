"""TPU training run: composite rearrange (nav-pick-nav-place) with RL (state obs, discrete actions).

Learning-evidence capstone beyond PointNav: PPO on the batched rearrange
engine, one chip. Prints train metrics per 50 updates and a final eval.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
from habitat_tpu.models.policy import make_pointnav_resnet_policy
from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

env = make_rearrange_env(
    num_envs=128,
    task="rearrange",
    num_scenes=8,
    episodes_per_scene=16,
    seed=0,
    with_visual=False,
    n_rooms_per_axis=1,
    n_clutter=0,
    max_episode_steps=300,
)

n_act = env.action_space.n
policy = make_pointnav_resnet_policy(
    n_act, backbone="resnet9", hidden_size=128, has_visual=False, goal_keys=()
)
learner = PPOLearner(
    env, policy, PPOConfig(num_steps=64, num_mini_batch=2, ppo_epoch=2, lr=2.5e-4)
)
ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
step = jax.jit(learner.train_step, donate_argnums=(0,))
t0 = time.time()
budget_updates = 4000
for u in range(budget_updates + 1):
    ts, m = step(ts)
    if u % 200 == 0:
        jax.block_until_ready(m["losses/learner_loss"])
        rew = float(m.get("reward", jnp.nan))
        succ = float(m.get("success", m.get("metrics/success", jnp.nan)))
        print(
            f"upd {u}: rew {rew:.2f} succ {succ:.3f} "
            f"loss {float(m['losses/learner_loss']):.4f} ({time.time()-t0:.0f}s)",
            flush=True,
        )
    if time.time() - t0 > 1200:
        print(f"time budget reached at {u}", flush=True)
        break
print("final metrics:", {k: round(float(v), 4) for k, v in m.items() if v.ndim == 0}, flush=True)
