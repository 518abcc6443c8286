"""Headline bench at N in {256, 512, 1024}: does batch scaling lift sps?

VERDICT round-1 item (iii) sanctions scaling env count with the bf16 obs
pipeline. Fixed per-update costs (dispatch, GAE epilogue, RNN plumbing,
optimizer) amortize over 4x more frames; conv/raycast work scales linearly.
Slope-timed (scripts/_timing.py recipe).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(num_envs: int, num_steps: int = 32) -> float:
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.models.policy import make_pointnav_resnet_policy
    from habitat_tpu.parallel.compile_opts import tpu_compiler_options

    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=4, episodes_per_scene=16, seed=0
    )
    env = make_nav_env(
        scenes,
        episodes,
        num_envs=num_envs,
        precomputed_fields=fields,
        max_episode_steps=500,
        sensor_specs=(
            ("HabitatSimDepthSensor", {"height": 128, "width": 128}),
            ("HabitatSimRGBSensor", {"height": 128, "width": 128}),
            ("PointGoalWithGPSCompassSensor", None),
        ),
    )
    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone="resnet18", hidden_size=512
    )
    learner = PPOLearner(
        env, policy, PPOConfig(num_steps=num_steps, num_mini_batch=2, ppo_epoch=2)
    )
    data = env.env_data
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0), data)
    jax.block_until_ready(ts.params)

    def one_update(carry):
        return learner.train_step(carry, data)[0]

    def chain(k):
        def run(x):
            out = jax.lax.fori_loop(0, k, lambda i, c: one_update(c), x)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf.astype(jnp.float32).ravel()[:1])

        return jax.jit(run, compiler_options=tpu_compiler_options())

    k1, k2 = 2, 6
    c1, c2 = chain(k1), chain(k2)
    for c in (c1, c2):
        float(c(ts))

    def timed(c, repeats=3):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            float(c(ts))
            best = min(best, time.time() - t0)
        return best

    dt = (timed(c2) - timed(c1)) / (k2 - k1)
    sps = num_envs * num_steps / dt
    print(f"N={num_envs} T={num_steps}: {dt*1e3:.1f} ms/update -> {sps:,.0f} sps")
    return sps


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    for n in [int(a) for a in (sys.argv[1:] or ["256", "512", "1024"])]:
        measure(n)
