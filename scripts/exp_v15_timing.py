"""v15 deployed-path scan timing: 256-env render_batch ms + scan_train_sps.

Measures the DEPLOYED large-scene path (select_chunks -> v15 packed-exact
select -> exactsel kernel -> v14 channel-major epilogue) on the 860k-tri
scan scene, then the full train step rate — the two numbers VERDICT r4 #2
tracks (252.8 ms / 977.6 sps at end of round 4).

NOTE: run alongside the flagship campaign the chip is time-shared; pass
--quick for the render row only.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")


def main():
    from habitat_tpu.sims.procedural import generate_scan_apartment, build_lod_scene
    from habitat_tpu.sims.scene import pack_scenes
    from habitat_tpu.ops.raycast import render_batch

    res = {}
    scene = generate_scan_apartment(0, tess=0.04, n_clutter=40)
    lod = build_lod_scene(scene, cells=(0.08, 0.25, 0.6), bands=(1.2, 3.0, 8.0))
    lod.scene_id = scene.scene_id
    pack = pack_scenes([lod])
    res["tris"] = int(lod.num_triangles)

    N, H, W = 256, 128, 128
    rng = np.random.default_rng(0)
    pos = np.stack([scene.sample_navigable_point(rng) for _ in range(N)])
    pos[:, 1] = scene.floor_y + 1.2
    posj = jnp.asarray(pos, jnp.float32)
    yawj = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
    pitchj = jnp.zeros((N,), jnp.float32)
    sids = jnp.zeros((N,), jnp.int32)

    fn = jax.jit(
        lambda pk, p, y, pi: render_batch(
            pk, sids, p, y, pi, height=H, width=W
        )["depth"]
    )
    out = fn(pack, posj, yawj, pitchj)
    out.block_until_ready()
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = fn(pack, posj, yawj, pitchj)
    out.block_until_ready()
    res["render_256env_ms"] = round((time.time() - t0) / reps * 1e3, 1)

    if "--quick" not in sys.argv:
        from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
        from habitat_tpu.core.env_factory import make_nav_env
        from habitat_tpu.datasets.pointnav import generate_pointnav_episode
        from habitat_tpu.models.policy import make_pointnav_resnet_policy

        erng = np.random.default_rng(0)
        pairs = [
            generate_pointnav_episode(scene, str(i), erng) for i in range(16)
        ]
        pairs = [p for p in pairs if p is not None]
        env = make_nav_env(
            [lod], [p[0] for p in pairs], num_envs=N, max_episode_steps=500,
            precomputed_fields={e.episode_id: f for (e, f) in pairs},
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
        step = jax.jit(learner.train_step, donate_argnums=(0,))
        ts, m = step(ts, data)
        float(jnp.asarray(m["losses/learner_loss"]).ravel()[0])
        t0 = time.time()
        for _ in range(3):
            ts, m = step(ts, data)
        float(jnp.asarray(m["losses/learner_loss"]).ravel()[0])
        res["scan_train_sps"] = round(N * 32 * 3 / (time.time() - t0), 1)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
