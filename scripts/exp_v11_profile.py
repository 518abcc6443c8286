"""Profile the v11 select + epilogue phases to find the hot XLA ops."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    from habitat_tpu.sims.loaders import load_scene
    from habitat_tpu.sims.procedural import build_lod_scene
    from habitat_tpu.sims.scene import pack_scenes
    from habitat_tpu.ops.raycast import (
        ray_feature_matrix,
        select_chunks,
        select_chunklets_exact,
        chunklet_aabbs,
        tile_plane_normals_cam,
    )
    from habitat_tpu.utils.geometry import camera_rays

    loaded = load_scene("/tmp/scan_apartment.gltf")
    lod = build_lod_scene(loaded, cells=(0.08, 0.25, 0.6), bands=(1.2, 3.0, 8.0))
    lod.scene_id = loaded.scene_id
    pack = pack_scenes([lod])
    C_big = pack.tri_mat.shape[3] // pack.chunk_bounds.shape[1]

    N, H, W = 256, 128, 128
    R = H * W
    rng = np.random.default_rng(1)
    pos = np.stack([loaded.sample_navigable_point(rng) for _ in range(N)])
    pos[:, 1] = loaded.floor_y + 1.2
    posj = jnp.asarray(pos, jnp.float32)
    yawj = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
    pitchj = jnp.zeros((N,), jnp.float32)
    sids = jnp.zeros((N,), jnp.int32)
    d_all = jax.vmap(
        lambda y: camera_rays(y, jnp.float32(0.0), jnp.deg2rad(90.0), H, W)
    )(yawj).reshape(N, -1, 3)

    def blk(x):
        tail = x.shape[2:]
        x = x.reshape((N, H // 32, 32, W // 32, 32) + tail)
        return jnp.swapaxes(x, 2, 3).reshape((N, R) + tail)

    db = blk(d_all)
    ob = jnp.broadcast_to(posj[:, None, :], db.shape)
    cb = pack.chunk_bounds[sids]
    planes_l = jnp.asarray(tile_plane_normals_cam(np.deg2rad(90.0), H, W, 32, 32))

    f_l0 = jax.jit(lambda cb, ob, db: select_chunks(cb, ob, db, 1024, 320, with_cnt=True))
    ids0, cnt0 = f_l0(cb, ob, db)
    ab = jax.jit(lambda v0, e1, e2, va: chunklet_aabbs(v0, e1, e2, va, c=32))(
        pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid)

    def f_sel(v0, e1, e2, va, ab, ids0, cnt0):
        return select_chunklets_exact(
            v0, e1, e2, va, ab, sids, posj, yawj, pitchj, planes_l,
            ids0, cnt0, parent_c=C_big, c=32,
        )
    f_sel = jax.jit(f_sel)
    ids, cnt = f_sel(pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab, ids0, cnt0)
    sync(cnt)

    with jax.profiler.trace("/tmp/v11_trace"):
        for _ in range(3):
            ids, cnt = f_sel(pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab, ids0, cnt0)
        sync(cnt)
    print("trace done")


if __name__ == "__main__":
    main()
