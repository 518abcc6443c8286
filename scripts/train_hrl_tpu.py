"""TPU run: HRL-PPO — neural high-level skill selection on composite rearrange."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

from habitat_tpu.baselines.hrl.hierarchical import (
    NavToGoalSkill, OracleNavSkill, PickSkill, PlaceSkill,
)
from habitat_tpu.baselines.hrl.hrl_ppo import HrlPPOConfig, HrlPPOLearner
from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

env = make_rearrange_env(
    num_envs=128, task="rearrange", num_scenes=8, episodes_per_scene=16,
    seed=0, with_visual=False, n_rooms_per_axis=1, n_clutter=0,
    max_episode_steps=300,
)
skills = [OracleNavSkill(), PickSkill(), NavToGoalSkill(), PlaceSkill()]
learner = HrlPPOLearner(
    env, skills, HrlPPOConfig(num_macro_steps=16, hl_interval=8, hidden_size=64)
)
ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
step = jax.jit(learner.train_step, donate_argnums=(0,))
t0 = time.time()
m = {}
for u in range(2001):
    ts, m = step(ts)
    if time.time() - t0 > 420:
        break
jax.block_until_ready(m["losses/hl_loss"])
print(f"HRL upd {u} ({time.time()-t0:.0f}s):",
      {k: round(float(v), 4) for k, v in m.items()}, flush=True)
