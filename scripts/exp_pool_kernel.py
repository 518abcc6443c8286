"""Slope-time the headline train step with the Pallas maxpool VJP on vs off
(off = XLA select-and-scatter fallback, forced via ops.pool._supported)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from scripts._timing import chain_time

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")


def build(pool_on: bool):
    import habitat_tpu.ops.pool as pool

    if pool_on == 0:  # gather-form XLA fallback
        pool._supported = lambda x: False
    elif pool_on == 2:  # plain XLA maxpool VJP (select-and-scatter)
        import habitat_tpu.models.resnet as resnet

        resnet.max_pool_3x3s2 = lambda x: pool._xla_maxpool(x)
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.models.policy import make_pointnav_resnet_policy

    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=4, episodes_per_scene=16, seed=0
    )
    env = make_nav_env(
        scenes, episodes, num_envs=256, precomputed_fields=fields,
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
        env, policy, PPOConfig(num_steps=32, num_mini_batch=2, ppo_epoch=2)
    )
    data = env.env_data
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0), data)
    jax.block_until_ready(ts.params)

    def step(carry):
        return learner.train_step(carry, data)[0]

    return step, ts


def main():
    on = int(os.environ.get("POOL_ON", "1"))
    step, ts = build(on)
    dt = chain_time(step, ts, k1=2, k2=6)
    print(f"pool_on={on}: {dt*1e3:.1f} ms/update = {256*32/dt:.0f} sps")


if __name__ == "__main__":
    main()
