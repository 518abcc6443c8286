"""Validate the Pallas raycast kernel vs the scalar oracle on real TPU,
then time it. Run after any kernel change."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.ops.raycast import (
        camera_rays,
        ray_feature_matrix,
        raycast_rays,
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

    # --- correctness: small-N full-res vs oracle ---
    n_val = 4
    sids_v = jnp.arange(n_val, dtype=jnp.int32) % pack.tri_mat.shape[0]
    pos_v = jnp.tile(jnp.array([[1.0, 1.2, 1.0]], jnp.float32), (n_val, 1))
    yaw_v = jnp.array([0.0, 1.3, 2.9, 4.4], jnp.float32)
    pitch_v = jnp.zeros((n_val,), jnp.float32)

    d_cam = camera_rays(
        jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), 64, 64
    ).reshape(-1, 3)
    from habitat_tpu.utils.geometry import view_rotation_matrix

    rot = view_rotation_matrix(yaw_v, pitch_v)
    dirs = jnp.einsum("nij,rj->nri", rot, d_cam)
    origins = jnp.broadcast_to(pos_v[:, None, :], dirs.shape)

    t_k, attrs_k = jax.jit(
        lambda o, d: raycast_pallas_batch(
            pack.tri_mat, pack.tri_attr, sids_v, origins=o, dirs=d
        )
    )(origins, dirs)

    # oracle
    mism = 0
    terr = 0.0
    total = 0
    for i in range(n_val):
        sid = int(sids_v[i])
        v0 = pack.tri_v0[sid]
        e1 = pack.tri_e1[sid]
        e2 = pack.tri_e2[sid]
        valid = pack.tri_valid[sid]
        t_o, idx_o = raycast_rays(v0, e1, e2, valid, origins[i], dirs[i])
        t_o = np.asarray(t_o)
        tk = np.asarray(t_k[i])
        hit_o = np.asarray(idx_o) >= 0
        hit_k = np.asarray(attrs_k[i][..., 7]) > 0.5
        mism += int((hit_o != hit_k).sum())
        both = hit_o & hit_k
        if both.any():
            terr = max(terr, float(np.abs(t_o[both] - tk[both]).max()))
        total += t_o.size
    res["hit_mismatch"] = mism
    res["hit_mismatch_frac"] = round(mism / total, 6)
    res["max_t_err"] = round(terr, 6)

    # --- timing: kernel alone + full render at N=256 ---
    sids = jnp.zeros((num_envs,), jnp.int32)
    pos = jnp.tile(jnp.array([[1.0, 1.2, 1.0]], jnp.float32), (num_envs, 1))
    yaw = jnp.linspace(0, 6.28, num_envs).astype(jnp.float32)
    pitch = jnp.zeros((num_envs,), jnp.float32)

    B = ray_feature_matrix(pos, yaw, pitch)
    d_cam_f = camera_rays(
        jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), H, W
    ).reshape(-1, 3)
    d_aug = jnp.concatenate(
        [d_cam_f, jnp.ones((d_cam_f.shape[0], 1), jnp.float32)], axis=-1
    )
    F = jnp.einsum("rk,nkf->nrf", d_aug, B)

    kern = jax.jit(
        lambda F: raycast_pallas_batch(pack.tri_mat, pack.tri_attr, sids, features=F)
    )
    out = kern(F)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(20):
        out = kern(F)
    jax.block_until_ready(out)
    res["kernel_ms"] = round((time.time() - t0) / 20 * 1e3, 2)

    rend = jax.jit(
        lambda p, y: render_batch(pack, sids, p, y, pitch, height=H, width=W)
    )
    o = rend(pos, yaw)
    jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(20):
        o = rend(pos, yaw)
    jax.block_until_ready(o)
    res["render_ms"] = round((time.time() - t0) / 20 * 1e3, 2)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
