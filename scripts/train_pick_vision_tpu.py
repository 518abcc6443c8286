"""TPU run: VISION-based pick (64x64 head depth via the Pallas renderer)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
from habitat_tpu.models.policy import make_pointnav_resnet_policy
from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

env = make_rearrange_env(
    num_envs=128, task="pick", num_scenes=8, episodes_per_scene=16, seed=0,
    with_visual=True, render_size=(64, 64), n_rooms_per_axis=1, n_clutter=0,
    max_episode_steps=120,
)
policy = make_pointnav_resnet_policy(
    env.action_space.n, backbone="resnet9", hidden_size=128, goal_keys=()
)
learner = PPOLearner(
    env, policy, PPOConfig(num_steps=64, num_mini_batch=2, ppo_epoch=2, lr=2.5e-4)
)
ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
step = jax.jit(learner.train_step, donate_argnums=(0,))
t0 = time.time()
m = {}
for u in range(4001):
    ts, m = step(ts)
    if u % 200 == 0:
        jax.block_until_ready(m["losses/learner_loss"])
        print(f"upd {u} ({time.time()-t0:.0f}s): succ_window "
              f"{float(m['m_success']):.0f}/{float(m['done_count']):.0f}", flush=True)
    if time.time() - t0 > 900:
        break
jax.block_until_ready(m["losses/learner_loss"])
print("final:", {k: round(float(v), 4) for k, v in m.items() if v.ndim == 0}, flush=True)
