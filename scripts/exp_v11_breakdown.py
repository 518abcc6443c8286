"""v11 render breakdown at the deployed shape (128x128, N=256):
cull phases vs kernel vs epilogue, plus survivor-count stats."""
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


def slope(fn, *args, k1=2, k2=8):
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
    # per-call slope between the k1- and k2-iteration runs
    return None, ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main():
    from habitat_tpu.sims.procedural import generate_scan_apartment, build_lod_scene
    from habitat_tpu.sims.loaders import save_scene_gltf, load_scene
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

    N = int(os.environ.get("N", "256"))
    SKIP_EXACT = os.environ.get("SKIP_EXACT", "0") == "1"
    H, W = 128, 128
    res["n"] = N
    res["skip_exact"] = SKIP_EXACT
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

    # phase A: L0
    f_l0 = jax.jit(lambda cb, ob, db: select_chunks(cb, ob, db, 1024, 320, with_cnt=True))
    ids0, cnt0 = f_l0(cb, ob, db)
    _, tA = slope(f_l0, cb, ob, db)
    res["l0_ms"] = round(tA * 1e3, 1)
    res["l0_cnt_mean"] = round(float(jnp.mean(cnt0)), 1)
    res["l0_cnt_max"] = int(jnp.max(cnt0))

    # phase B: AABB table (could be pack-time; measure anyway)
    f_ab = jax.jit(lambda v0, e1, e2, va: chunklet_aabbs(v0, e1, e2, va, c=32))
    ab = f_ab(pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid)
    _, tB = slope(f_ab, pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid)
    res["aabb_ms"] = round(tB * 1e3, 1)

    # phase C: L1+L2 select
    def f_sel(v0, e1, e2, va, ab, ids0, cnt0):
        return select_chunklets_exact(
            v0, e1, e2, va, ab, sids, posj, yawj, pitchj, planes_l,
            ids0, cnt0, parent_c=C_big, c=32, skip_exact=SKIP_EXACT,
        )
    f_sel = jax.jit(f_sel)
    ids, cnt = f_sel(pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab, ids0, cnt0)
    _, tC = slope(f_sel, pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid, ab, ids0, cnt0)
    res["select_ms"] = round(tC * 1e3, 1)
    res["cnt_mean"] = round(float(jnp.mean(cnt)), 1)
    res["cnt_p90"] = int(jnp.percentile(cnt, 90))
    res["cnt_max"] = int(jnp.max(cnt))
    print(json.dumps(res), flush=True)

    # phase D: kernel — v12 sub-tile ET group sweep
    t = idx = None
    for grp in (1, 4, 8):
        f_k = jax.jit(
            lambda gm, ids, cnt, d_t, Bt, grp=grp: raycast_pallas_exactsel_t(
                gm, sids, ids, cnt, d_t, Bt,
                ray_tile=1024, tri_chunk=32, groups=grp,
            )
        )
        tg, ig = f_k(gm32, ids, cnt, d_t, Bt)
        if t is None:
            t, idx = tg, ig
        else:
            same = float(jnp.mean((ig == idx).astype(jnp.float32)))
            res[f"g{grp}_idx_match"] = round(same, 5)
        _, tD = slope(f_k, gm32, ids, cnt, d_t, Bt)
        res[f"kernel_g{grp}_ms"] = round(tD * 1e3, 1)
        print(json.dumps(res), flush=True)
    res["kernel_ms"] = res["kernel_g4_ms"]

    # phase E: attr epilogue (true gather + plane-exact)
    def f_ep(idx, t, attr, v0t):
        hit = idx >= 0
        safe = jnp.maximum(idx, 0)
        nrm = attr[sids[:, None], safe, 0:3]
        v0g = v0t[sids[:, None], safe]
        nd = jnp.sum(nrm * db, axis=-1)
        num = jnp.sum(nrm * (v0g - ob), axis=-1)
        ok = hit & (jnp.abs(nd) > 1e-6)
        return jnp.where(ok, num / jnp.where(ok, nd, 1.0), 1e6)
    f_ep = jax.jit(f_ep)
    _ = f_ep(idx, t, pack.tri_attr, pack.tri_v0)
    _, tE = slope(f_ep, idx, t, pack.tri_attr, pack.tri_v0)
    res["epilogue_ms"] = round(tE * 1e3, 1)

    # grouped-matrix cost (currently recomputed inside render jit)
    f_gm = jax.jit(lambda tm: group_tri_mat_pad16(tm, 32))
    _, tF = slope(f_gm, pack.tri_mat)
    res["group_ms"] = round(tF * 1e3, 1)

    res["sum_ms"] = round((tA + tC + tD + tE + tF) * 1e3, 1)
    print("FINAL:", json.dumps(res))


if __name__ == "__main__":
    main()
