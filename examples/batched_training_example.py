"""The TPU-native API in one page: thousands of envs as one array program.

No reference counterpart — this is the engine's idiomatic surface (the
reference's examples/example.py equivalent for batched training)."""

import jax
import jax.numpy as jnp
import numpy as np

from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.models.policy import make_pointnav_resnet_policy


def main(num_envs: int = 16, updates: int = 20):
    # 1. scenes + episodes (procedural here; HM3D/MP3D archives load the same way)
    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=2, episodes_per_scene=8
    )

    # 2. one batched env: state in HBM, step is a pure jittable function
    env = make_nav_env(
        scenes, episodes, num_envs=num_envs, precomputed_fields=fields
    )

    # 3. policy + fused PPO train step (rollout scan + GAE + update in ONE jit)
    policy = make_pointnav_resnet_policy(
        len(env.actions), has_visual=False, hidden_size=64
    )
    learner = PPOLearner(env, policy, PPOConfig(num_steps=32, lr=1e-3))
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step, donate_argnums=(0,))

    for i in range(updates):
        ts, metrics = step(ts)
        if i % 5 == 0:
            dc = max(float(metrics["done_count"]), 1.0)
            print(
                f"update {i}: ep_reward={float(metrics['reward_sum'])/dc:.3f} "
                f"episodes={int(dc)}"
            )


if __name__ == "__main__":
    main()
