"""Ground-truth timings via scripts/_timing.chain_time (slope method).

Settles what the tunnel's unreliable sync primitives left ambiguous:
  1. the REAL full-train-step time (and therefore the honest headline sps),
  2. the REAL raycast kernel time,
  3. the REAL XLA conv time at the update's thin-channel shapes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from scripts._timing import chain_time


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    rng = np.random.default_rng(0)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("conv", "all"):
        B = 4096
        x = jnp.asarray(rng.normal(size=(B, 32, 32, 32)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 32, 32)) * 0.05, jnp.bfloat16)

        def conv_step(x):
            y = lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )
            return y * jnp.bfloat16(0.999)

        per = chain_time(conv_step, x, k1=4, k2=20)
        gf = 2 * 32 * 32 * 32 * 9 * 32 * B / 1e9
        print(f"layer1 conv fwd: {per*1e3:.3f} ms -> {gf/per/1e3:.1f} TF/s",
              flush=True)

        xc = jnp.asarray(rng.normal(size=(B, 128, 128, 4)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(7, 7, 4, 32)) * 0.05, jnp.bfloat16)
        wp = jnp.asarray(rng.normal(size=(1, 1, 32, 4)) * 0.05, jnp.bfloat16)

        def conv1_step(x):
            y = lax.conv_general_dilated(
                x, w1, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )
            y = jnp.repeat(jnp.repeat(y, 2, 1), 2, 2)
            return lax.conv_general_dilated(
                y, wp, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )

        per1 = chain_time(conv1_step, xc, k1=2, k2=8)
        gf1 = 2 * 64 * 64 * 32 * 49 * 4 * B / 1e9
        print(f"conv1(7x7/2)+proj fwd: {per1*1e3:.3f} ms "
              f"(conv1 share ~{gf1/per1/1e3:.1f} TF/s lower bound)", flush=True)

    if which in ("ray", "all"):
        from habitat_tpu.core.env_factory import make_nav_env
        from habitat_tpu.datasets.pointnav import make_procedural_pointnav
        from habitat_tpu.ops.raycast import ray_features
        from habitat_tpu.ops.raycast_pallas import raycast_pallas_index

        scenes, episodes, fields = make_procedural_pointnav(
            num_scenes=4, episodes_per_scene=16, seed=0
        )
        env = make_nav_env(
            scenes, episodes, num_envs=256, precomputed_fields=fields,
            sensor_specs=(("HabitatSimDepthSensor", {"height": 128, "width": 128}),),
        )
        pack = env.pack
        N, R = 256, 128 * 128
        sids = jnp.zeros((N,), jnp.int32)
        o = jnp.asarray(rng.uniform(-2, 2, (N, R, 3)).astype(np.float32))
        d = rng.normal(size=(N, R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        feats = jax.jit(ray_features)(o, jnp.asarray(d))

        def ray_step(f):
            t, idx = raycast_pallas_index(pack.tri_mat, sids, f)
            # fold the result back into the carry so iterations chain
            return f + (t[..., None] * 0.0)

        per = chain_time(ray_step, feats, k1=2, k2=10)
        print(f"raycast kernel (N=256,R=16k,T=128): {per*1e3:.2f} ms", flush=True)

    if which in ("train", "all"):
        from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
        from habitat_tpu.core.env_factory import make_nav_env
        from habitat_tpu.datasets.pointnav import make_procedural_pointnav
        from habitat_tpu.models.policy import make_pointnav_resnet_policy

        num_envs, num_steps = 256, 32
        scenes, episodes, fields = make_procedural_pointnav(
            num_scenes=4, episodes_per_scene=16, seed=0
        )
        env = make_nav_env(
            scenes, episodes, num_envs=num_envs, precomputed_fields=fields,
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
            env, policy,
            PPOConfig(num_steps=num_steps, num_mini_batch=2, ppo_epoch=2),
        )
        data = env.env_data
        ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0), data)

        def train(ts):
            ts2, m = learner.train_step(ts, data)
            return ts2

        per = chain_time(train, ts, k1=1, k2=4, repeats=2)
        sps = num_envs * num_steps / per
        print(f"train step: {per*1e3:.1f} ms -> {sps:.0f} env-steps/s/chip",
              flush=True)


if __name__ == "__main__":
    main()
