"""Headline benchmark: batched PointNav env-steps/sec/chip.

Measures the FULL training pipeline on one chip — 128x128 RGB-D rendering
(fused Pallas raycast), batched env step (actions/collisions/measures/reward/
auto-reset), and the PPO update (ResNet18+LSTM-512, GAE, clipped surrogate) —
as one jitted train step, N=256 envs x T=32 steps per update.

Prints ONE JSON line:
  {"metric": ..., "value": steps/sec, "unit": "env-steps/s/chip", "vs_baseline": value/50000}

Baseline: BASELINE.json north star = 50,000 env-steps/s/chip (render+step+PPO).
"""

import json
import time

import jax


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

    import jax.numpy as jnp
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.models.policy import make_pointnav_resnet_policy

    num_envs = 256
    num_steps = 32

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

    data = env.env_data  # tables as jit arguments, not embedded constants
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0), data)
    jax.block_until_ready(ts.params)

    # Slope timing (scripts/_timing.py): k updates chained by data
    # dependency inside ONE jit via fori_loop, timed at two chain lengths;
    # per-update cost = slope. On this image the host<->device tunnel makes
    # naive wall-timing unreliable both ways (block_until_ready can return
    # early for plain XLA ops; a sync scalar pull costs a 0.03-1.6s RTT),
    # and the slope cancels RTT + dispatch exactly. Chain lengths 2/10
    # amortize 8 real updates per measurement.
    def one_update(carry):
        return learner.train_step(carry, data)[0]

    def chain(k):
        def run(x):
            out = jax.lax.fori_loop(0, k, lambda i, c: one_update(c), x)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf.astype(jnp.float32).ravel()[:1])

        # scoped-VMEM ceiling raised for the conv emitter (sweep + rationale
        # in habitat_tpu/parallel/compile_opts.py)
        from habitat_tpu.parallel.compile_opts import tpu_compiler_options

        return jax.jit(run, compiler_options=tpu_compiler_options())

    k1, k2 = 2, 10
    c1, c2 = chain(k1), chain(k2)
    for c in (c1, c2):  # compile both before timing
        float(c(ts))

    def timed(c, repeats=3):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            float(c(ts))  # () scalar -> host: one tunnel RTT
            best = min(best, time.time() - t0)
        return best

    dt = (timed(c2) - timed(c1)) / (k2 - k1)
    sps = num_envs * num_steps / dt

    print(
        json.dumps(
            {
                "metric": "PointNav 128x128 RGBD env-steps/sec/chip (render+step+PPO, resnet18+LSTM512)",
                "value": round(sps, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(sps / 50000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
