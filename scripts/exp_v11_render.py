"""v11 exact-cull packed-stream renderer: TPU validation + timing.

1. Culling exactness at 64x64 vs the band-valid all-chunks oracle (both
   plane-exact; bench.py protocol) — must be hitmatch ~1.0 / t-agree@5mm
   >=0.99 (VERDICT r4 done-criterion).
2. Render speed at 128x128, N=256 (slope-timed, true device sync):
   v11 (default) vs v10 (backend="stream").
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


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    from habitat_tpu.sims.procedural import generate_scan_apartment, build_lod_scene
    from habitat_tpu.sims.loaders import save_scene_gltf, load_scene
    from habitat_tpu.sims.scene import pack_scenes
    from habitat_tpu.ops.raycast import (
        render_batch,
        ray_feature_matrix,
        select_chunks,
        select_chunklets_exact,
        chunklet_aabbs,
        tile_plane_normals_cam,
        _lod_band_ok,
    )
    from habitat_tpu.ops.raycast_pallas import (
        group_tri_mat_pad16,
        raycast_pallas_stream_t,
        raycast_pallas_exactsel_t,
    )
    from habitat_tpu.utils.geometry import camera_rays

    res = {}
    if not os.path.exists("/tmp/scan_apartment.gltf"):
        scene = generate_scan_apartment(0, tess=0.04, n_clutter=40)
        save_scene_gltf(scene, "/tmp/scan_apartment.gltf")
    loaded = load_scene("/tmp/scan_apartment.gltf")
    lod = build_lod_scene(loaded, cells=(0.08, 0.25, 0.6), bands=(1.2, 3.0, 8.0))
    lod.scene_id = loaded.scene_id
    pack = pack_scenes([lod])
    res["tris"] = int(lod.num_triangles)
    C_big = pack.tri_mat.shape[3] // pack.chunk_bounds.shape[1]

    # ---- exactness at 64x64, n_val envs -------------------------------
    rng = np.random.default_rng(0)
    n_val = 2
    H = W = 64
    pos = np.stack([loaded.sample_navigable_point(rng) for _ in range(n_val)])
    pos[:, 1] = loaded.floor_y + 1.2
    posj = jnp.asarray(pos, jnp.float32)
    yawj = jnp.asarray(rng.uniform(0, 2 * np.pi, n_val), jnp.float32)
    pitchj = jnp.zeros((n_val,), jnp.float32)
    svids = jnp.zeros((n_val,), jnp.int32)
    d4 = jax.vmap(
        lambda y: camera_rays(y, jnp.float32(0.0), jnp.deg2rad(90.0), H, W)
    )(yawj).reshape(n_val, -1, 3)
    o4 = jnp.broadcast_to(posj[:, None, :], d4.shape)

    def blk(x, inv=False):
        tail = x.shape[2:]
        if inv:
            x = x.reshape((n_val, H // 32, W // 32, 32, 32) + tail)
        else:
            x = x.reshape((n_val, H // 32, 32, W // 32, 32) + tail)
        x = jnp.swapaxes(x, 2, 3)
        return x.reshape((n_val, H * W) + tail)

    gm = group_tri_mat_pad16(pack.tri_mat, C_big)
    d_cam = camera_rays(
        jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), H, W
    ).reshape(-1, 3)
    dcb = blk(jnp.broadcast_to(d_cam, (n_val, H * W, 3)))[0]
    d_aug = jnp.concatenate([dcb, jnp.ones((H * W, 1), jnp.float32)], -1)
    nt = (H * W) // 1024
    d_t = jnp.pad(
        d_aug.reshape(nt, 1024, 4).transpose(0, 2, 1), ((0, 0), (0, 4), (0, 0))
    )
    Bt = jnp.pad(
        ray_feature_matrix(posj, yawj, pitchj).transpose(0, 2, 1),
        ((0, 0), (0, 6), (0, 0)),
    )

    def plane_exact(t, idx, attr, v0t):
        t, idx = blk(t, inv=True), blk(idx, inv=True)
        hit = idx >= 0
        safe = jnp.maximum(idx, 0)
        nrm = attr[svids[:, None], safe, 0:3]
        v0g = v0t[svids[:, None], safe]
        nd = jnp.sum(nrm * d4, axis=-1)
        num = jnp.sum(nrm * (v0g - o4), axis=-1)
        ok = hit & (jnp.abs(nd) > 1e-6)
        return jnp.where(ok, num / jnp.where(ok, nd, 1.0), 1e6), idx

    # band-valid all-chunks oracle through the v10 stream kernel
    NC = pack.chunk_bounds.shape[1]
    ob, db = blk(o4), blk(d4)
    cb = pack.chunk_bounds[svids]
    o_t = ob.reshape(n_val, nt, 1024, 3)[:, :, 0]
    dist_c = jnp.linalg.norm(cb[:, None, :, :3] - o_t[:, :, None, :], axis=-1)
    valid_c = (cb[..., 3] > 0)[:, None, :] & _lod_band_ok(cb, dist_c)
    score_c = jnp.where(
        valid_c, jnp.maximum(dist_c - cb[..., 3][:, None], 0.0), 1e9
    )
    neg_c, idx_c = jax.lax.top_k(-score_c, NC)
    cnt_all = jnp.sum(neg_c > -1e8, axis=-1).astype(jnp.int32)
    dmin_c = jnp.clip(jnp.floor(-neg_c * 1e2), 0, 8191).astype(jnp.int32)
    pos_c = jnp.arange(NC, dtype=jnp.int32)
    in_c = pos_c[None, None, :] < cnt_all[..., None]
    ids_all = (
        (jnp.where(in_c, dmin_c, 0) << 18) | jnp.where(in_c, idx_c, 0)
    ).astype(jnp.int32)

    def run_oracle(gm, ids_all, cnt_all, d_t, Bt, attr, v0t):
        t, idx = raycast_pallas_stream_t(
            gm, svids, ids_all, cnt_all, d_t, Bt, ray_tile=1024, tri_chunk=C_big
        )
        return plane_exact(t, idx, attr, v0t)

    t_full, i_full = jax.jit(run_oracle)(
        gm, ids_all, cnt_all, d_t, Bt, pack.tri_attr, pack.tri_v0
    )
    t_full = np.asarray(t_full)
    hit_full = np.asarray(i_full) >= 0
    print("oracle done", flush=True)

    # v11 path (plane-exact epilogue — the deployed semantics)
    gm32 = pack.tri_mat_g32
    planes_l = jnp.asarray(tile_plane_normals_cam(np.deg2rad(90.0), H, W, 32, 32))

    def run_v11(pk, gm32, cb, ob, db, d_t, Bt):
        ids0, cnt0 = select_chunks(cb, ob, db, 1024, 320, with_cnt=True)
        ids, cnt = select_chunklets_exact(
            pk.tri_v0, pk.tri_e1, pk.tri_e2, pk.tri_valid,
            pk.chunklet_ab32, svids, posj, yawj, pitchj, planes_l,
            ids0, cnt0, parent_c=C_big, c=32,
        )
        t, idx = raycast_pallas_exactsel_t(
            gm32, svids, ids, cnt, d_t, Bt, ray_tile=1024, tri_chunk=32
        )
        return plane_exact(t, idx, pk.tri_attr, pk.tri_v0), (cnt,)

    (tV, iV), (cntV,) = jax.jit(run_v11)(pack, gm32, cb, ob, db, d_t, Bt)
    tV = np.asarray(tV)
    hitV = np.asarray(iV) >= 0
    both = hit_full & hitV
    err = np.abs(t_full[both] - tV[both])
    res["v11_hitmatch"] = round(float((hit_full == hitV).mean()), 5)
    res["v11_t_agree_5mm"] = round(float((err < 5e-3).mean()), 5)
    res["v11_t_p99_mm"] = round(float(np.percentile(err, 99)) * 1e3, 3)
    res["v11_cnt_mean"] = round(float(jnp.mean(cntV)), 1)
    res["v11_cnt_max"] = int(jnp.max(cntV))
    print("exactness:", json.dumps(res), flush=True)

    # ---- render speed at 128x128, N=256 -------------------------------
    N = 256
    posN = np.stack([loaded.sample_navigable_point(rng) for _ in range(N)])
    posN[:, 1] = loaded.floor_y + 1.2
    posNj = jnp.asarray(posN, jnp.float32)
    yawN = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
    pitchN = jnp.zeros((N,), jnp.float32)
    sidsN = jnp.zeros((N,), jnp.int32)

    for label, be in (("v11", "auto"), ("v10", "stream")):
        rend = jax.jit(
            lambda pk, p, y, be=be: render_batch(
                pk, sidsN, p, y, pitchN, height=128, width=128, backend=be
            )
        )
        out = rend(pack, posNj, yawN)
        sync(out["depth"])
        for iters in (4, 12):
            t0 = time.time()
            for _ in range(iters):
                out = rend(pack, posNj, yawN)
            sync(out["depth"])
            dt = time.time() - t0
            if iters == 4:
                t4 = dt
        # slope: (t12 - t4) / 8 removes dispatch overhead
        ms = (dt - t4) / 8 * 1e3
        res[f"render_ms_{label}"] = round(ms, 1)
        res[f"render_fps_{label}"] = round(N / (ms / 1e3), 0)
        print(json.dumps(res), flush=True)

    print("FINAL:", json.dumps(res))


if __name__ == "__main__":
    main()
