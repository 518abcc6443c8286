"""v11 optimization sweep (TPU): no-L2 cull + U=8 kernel + epilogue gather
variants. Decides the deployed configuration from measurements."""
import json
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


def timeit(fn, *args, k1=2, k2=8):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(k1):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t1 = time.time()
    for _ in range(k2):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


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
    from habitat_tpu.ops.raycast_pallas import (
        group_tri_mat_pad16,
        raycast_pallas_exactsel_t,
    )
    from habitat_tpu.utils.geometry import camera_rays

    res = {}
    loaded = load_scene("/tmp/scan_apartment.gltf")
    lod = build_lod_scene(loaded, cells=(0.08, 0.25, 0.6), bands=(1.2, 3.0, 8.0))
    lod.scene_id = loaded.scene_id
    pack = pack_scenes([lod])
    C_big = pack.tri_mat.shape[3] // pack.chunk_bounds.shape[1]

    N, H, W = 256, 128, 128
    R = H * W
    nt = R // 1024
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
    gm32 = jax.jit(lambda tm: group_tri_mat_pad16(tm, 32))(pack.tri_mat)
    d_cam = camera_rays(jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), H, W).reshape(-1, 3)
    dcb = blk(jnp.broadcast_to(d_cam, (N, R, 3)))[0]
    d_aug = jnp.concatenate([dcb, jnp.ones((R, 1), jnp.float32)], -1)
    d_t = jnp.pad(d_aug.reshape(nt, 1024, 4).transpose(0, 2, 1), ((0, 0), (0, 4), (0, 0)))
    Bt = jnp.pad(ray_feature_matrix(posj, yawj, pitchj).transpose(0, 2, 1), ((0, 0), (0, 6), (0, 0)))

    f_l0 = jax.jit(lambda cb, ob, db: select_chunks(cb, ob, db, 1024, 320, with_cnt=True))
    ids0, cnt0 = f_l0(cb, ob, db)
    ab = jax.jit(lambda v0, e1, e2, va: chunklet_aabbs(v0, e1, e2, va, c=32))(
        pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid)

    # --- select variants -------------------------------------------------
    def f_sel_l1(ids0, cnt0, ab):
        return select_chunklets_exact(
            pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab,
            sids, posj, yawj, pitchj, planes_l, ids0, cnt0,
            parent_c=C_big, c=32, skip_exact=True,
        )
    f_sel_l1 = jax.jit(f_sel_l1)
    ids1, cnt1 = f_sel_l1(ids0, cnt0, ab)
    res["sel_l1_ms"] = round(timeit(f_sel_l1, ids0, cnt0, ab) * 1e3, 1)
    res["l1_cnt_mean"] = round(float(jnp.mean(cnt1)), 1)
    res["l1_cnt_max"] = int(jnp.max(cnt1))
    print(json.dumps(res), flush=True)

    # --- kernel variants on the L1 list ----------------------------------
    for U, nslot in ((4, 4), (8, 3)):
        f_k = jax.jit(
            lambda gm, ids, cnt, d_t, Bt, U=U, nslot=nslot:
            raycast_pallas_exactsel_t(
                gm, sids, ids, cnt, d_t, Bt, ray_tile=1024, tri_chunk=32,
                unroll=U, nslot=nslot,
            )
        )
        t1, i1 = f_k(gm32, ids1, cnt1, d_t, Bt)
        res[f"kernel_l1_u{U}_ms"] = round(
            timeit(f_k, gm32, ids1, cnt1, d_t, Bt) * 1e3, 1
        )
        print(json.dumps(res), flush=True)

    # --- epilogue variants -----------------------------------------------
    idx = i1
    t = t1
    # A: two row gathers (deployed)
    def ep_a(idx, attr, v0t):
        hit = idx >= 0
        safe = jnp.maximum(idx, 0)
        nrm = attr[sids[:, None], safe, 0:3]
        v0g = v0t[sids[:, None], safe]
        nd = jnp.sum(nrm * db, axis=-1)
        num = jnp.sum(nrm * (v0g - ob), axis=-1)
        ok = hit & (jnp.abs(nd) > 1e-6)
        return jnp.where(ok, num / jnp.where(ok, nd, 1.0), 1e6)
    ep_a = jax.jit(ep_a)
    _ = ep_a(idx, pack.tri_attr, pack.tri_v0)
    res["ep_two_gather_ms"] = round(
        timeit(ep_a, idx, pack.tri_attr, pack.tri_v0) * 1e3, 1
    )
    # B: one packed 8-col gather
    packed_tab = jnp.concatenate(
        [pack.tri_attr[..., 0:3], pack.tri_v0,
         jnp.zeros(pack.tri_v0.shape[:2] + (2,), jnp.float32)], axis=-1
    )  # (S, T, 8)
    def ep_b(idx, tab):
        hit = idx >= 0
        safe = jnp.maximum(idx, 0)
        g = tab[sids[:, None], safe]  # (N, R, 8)
        nrm, v0g = g[..., 0:3], g[..., 3:6]
        nd = jnp.sum(nrm * db, axis=-1)
        num = jnp.sum(nrm * (v0g - ob), axis=-1)
        ok = hit & (jnp.abs(nd) > 1e-6)
        return jnp.where(ok, num / jnp.where(ok, nd, 1.0), 1e6)
    ep_b = jax.jit(ep_b)
    _ = ep_b(idx, packed_tab)
    res["ep_packed_gather_ms"] = round(timeit(ep_b, idx, packed_tab) * 1e3, 1)
    # C: flat take
    flat_tab = packed_tab.reshape(-1, 8)
    def ep_c(idx, tab):
        hit = idx >= 0
        T = pack.tri_v0.shape[1]
        safe = sids[:, None] * T + jnp.maximum(idx, 0)
        g = jnp.take(tab, safe, axis=0)  # (N, R, 8)
        nrm, v0g = g[..., 0:3], g[..., 3:6]
        nd = jnp.sum(nrm * db, axis=-1)
        num = jnp.sum(nrm * (v0g - ob), axis=-1)
        ok = hit & (jnp.abs(nd) > 1e-6)
        return jnp.where(ok, num / jnp.where(ok, nd, 1.0), 1e6)
    ep_c = jax.jit(ep_c)
    _ = ep_c(idx, flat_tab)
    res["ep_flat_take_ms"] = round(timeit(ep_c, idx, flat_tab) * 1e3, 1)
    print("FINAL:", json.dumps(res))


if __name__ == "__main__":
    main()
