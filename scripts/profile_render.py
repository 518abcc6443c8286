"""Micro-profile the render path of the headline bench on the real chip."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.ops.raycast import render_batch, ray_feature_matrix, camera_rays
    from habitat_tpu.ops.raycast_pallas import raycast_pallas_batch

    num_envs = 256
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
    pack = env.pack
    res = {"T": int(pack.tri_mat.shape[-1]), "S": int(pack.tri_mat.shape[0])}

    state, obs = jax.jit(env.reset_fn)(jax.random.PRNGKey(0))
    sids = env.table.scene_idx[state.ep_idx] if hasattr(env, "table") else jnp.zeros(
        (num_envs,), jnp.int32
    )
    pos = state.pos
    yaw = state.yaw
    pitch = jnp.zeros_like(yaw)
    cam = pos.at[:, 1].add(1.25)

    # full render_batch
    rb = jax.jit(
        lambda s, p, y, pt: render_batch(pack, s, p, y, pt, height=128, width=128)
    )
    res["render_batch_ms"] = round(timeit(rb, sids, cam, yaw, pitch) * 1e3, 2)

    # kernel alone (with feature matmul)
    def kern(s, p, y, pt):
        d_cam = camera_rays(
            jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), 128, 128
        ).reshape(-1, 3)
        B = ray_feature_matrix(p, y, pt)
        d_aug = jnp.concatenate(
            [d_cam, jnp.ones((d_cam.shape[0], 1), jnp.float32)], axis=-1
        )
        F = jnp.einsum("rk,nkf->nrf", d_aug, B, precision=jax.lax.Precision.HIGHEST)
        return raycast_pallas_batch(pack.tri_mat, pack.tri_attr, s, features=F)

    kj = jax.jit(kern)
    res["kernel_ms"] = round(timeit(kj, sids, cam, yaw, pitch) * 1e3, 2)

    # kernel with different ray tiles
    for rt in (1024, 4096):
        def kern_rt(s, p, y, pt, rt=rt):
            d_cam = camera_rays(
                jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), 128, 128
            ).reshape(-1, 3)
            B = ray_feature_matrix(p, y, pt)
            d_aug = jnp.concatenate(
                [d_cam, jnp.ones((d_cam.shape[0], 1), jnp.float32)], axis=-1
            )
            F = jnp.einsum(
                "rk,nkf->nrf", d_aug, B, precision=jax.lax.Precision.HIGHEST
            )
            return raycast_pallas_batch(
                pack.tri_mat, pack.tri_attr, s, features=F, ray_tile=rt
            )

        res[f"kernel_rt{rt}_ms"] = round(
            timeit(jax.jit(kern_rt), sids, cam, yaw, pitch) * 1e3, 2
        )

    # env step WITHOUT visual sensors
    env2 = make_nav_env(
        scenes,
        episodes,
        num_envs=num_envs,
        precomputed_fields=fields,
        max_episode_steps=500,
        sensor_specs=(("PointGoalWithGPSCompassSensor", None),),
    )
    st2, _ = jax.jit(env2.reset_fn)(jax.random.PRNGKey(0))
    act = jnp.ones((num_envs,), jnp.int32)
    sj = jax.jit(lambda s, a: env2.step_fn(s, a))
    res["env_step_novis_ms"] = round(timeit(sj, st2, act) * 1e3, 2)

    # full env step (with render)
    sj3 = jax.jit(lambda s, a: env.step_fn(s, a))
    res["env_step_full_ms"] = round(timeit(sj3, state, act) * 1e3, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
