"""TPU run: ImageNav — navigate to the view shown in a goal image."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.models.policy import make_pointnav_resnet_policy

scenes, episodes, fields = make_procedural_pointnav(
    num_scenes=8, episodes_per_scene=24, seed=0, extent=8.0
)
env = make_nav_env(
    scenes, episodes, num_envs=128, precomputed_fields=fields,
    max_episode_steps=200, goal_image_size=64,
    sensor_specs=(
        ("HabitatSimRGBSensor", {"height": 64, "width": 64}),
        ("ImageGoalSensor", {"height": 64, "width": 64}),
        ("CompassSensor", None),
        ("GPSSensor", None),
    ),
)
policy = make_pointnav_resnet_policy(
    len(env.actions), backbone="resnet9", hidden_size=192, goal_keys=()
)
learner = PPOLearner(
    env, policy, PPOConfig(num_steps=64, num_mini_batch=2, ppo_epoch=2, lr=2.5e-4)
)
data = env.env_data
ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0), data)
step = jax.jit(learner.train_step, donate_argnums=(0,))
t0 = time.time()
m = {}
for u in range(6001):
    ts, m = step(ts, data)
    if u % 200 == 0:
        jax.block_until_ready(m["losses/learner_loss"])
        print(f"upd {u} ({time.time()-t0:.0f}s): succ_window "
              f"{float(m['m_success']):.0f}/{float(m['done_count']):.0f} "
              f"spl_sum {float(m.get('m_spl', 0)):.1f}", flush=True)
    if time.time() - t0 > 1100:
        break
jax.block_until_ready(m["losses/learner_loss"])
print("final:", {k: round(float(v), 4) for k, v in m.items() if v.ndim == 0}, flush=True)
