"""Drill into the 20ms render: kernel alone vs feature build vs epilogue,
and sweep ray_tile to find the per-program overhead."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.ops.raycast import (
        camera_rays,
        ray_feature_matrix,
        render_batch,
    )
    from habitat_tpu.ops.raycast_pallas import raycast_pallas_batch

    num_envs = 256
    H = W = 128
    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=4, episodes_per_scene=16, seed=0
    )
    env = make_nav_env(
        scenes, episodes, num_envs=num_envs, precomputed_fields=fields,
        max_episode_steps=500,
        sensor_specs=(("HabitatSimDepthSensor", {"height": H, "width": W}),),
    )
    pack = env.pack
    res = {"T": int(pack.tri_mat.shape[3])}

    sids = jnp.zeros((num_envs,), jnp.int32)
    pos = jnp.tile(jnp.array([[1.0, 1.2, 1.0]], jnp.float32), (num_envs, 1))
    yaw = jnp.linspace(0, 6.28, num_envs).astype(jnp.float32)
    pitch = jnp.zeros((num_envs,), jnp.float32)

    # full render
    rend = jax.jit(
        lambda p, y: render_batch(pack, sids, p, y, pitch, height=H, width=W)
    )
    res["full_render_ms"] = timeit(rend, pos, yaw)

    # features only
    d_cam = camera_rays(
        jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), H, W
    ).reshape(-1, 3)
    d_aug = jnp.concatenate(
        [d_cam, jnp.ones((d_cam.shape[0], 1), jnp.float32)], axis=-1
    )

    def feats(p, y):
        B = ray_feature_matrix(p, y, pitch)
        return jnp.einsum("rk,nkf->nrf", d_aug, B, precision=jax.lax.Precision.HIGHEST)

    feats_j = jax.jit(feats)
    res["features_ms"] = timeit(feats_j, pos, yaw)
    F = feats_j(pos, yaw)

    # kernel only at various ray tiles
    for rt in (1024, 2048, 4096, 8192, 16384):
        k = jax.jit(
            lambda F, rt=rt: raycast_pallas_batch(
                pack.tri_mat, pack.tri_attr, sids, features=F, ray_tile=rt
            )
        )
        try:
            res[f"kernel_rt{rt}_ms"] = timeit(k, F)
        except Exception as e:
            res[f"kernel_rt{rt}_err"] = repr(e)[:120]

    for k_, v in res.items():
        if isinstance(v, float):
            res[k_] = round(v, 2)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
