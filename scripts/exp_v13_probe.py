"""v13 probe: where do the 302.8 ms go, and does per-packet (16x16) help?

Round-4 finding that motivates this: the v12 render time matches the
zero-ET VMEM-bandwidth prediction almost exactly
(256 envs x 16 tiles x ~370 chunklets x (128 x 1024 x 8 B) / ~5 TB/s
~= 303 ms), i.e. sub-tile ET at groups=4 strips is cutting ~nothing at
the deployed shape. Hypothesis: smaller COHERENT packets (16x16 px)
with their OWN survivor lists shrink both the candidate set per packet
(narrower frustum) and the ET horizon (tighter depth range per packet).

RESULT (N=64, 860k-tri scan bench, v5e) — 16x16 packets are a MEASURED
NEGATIVE, family closed: candidates/packet only drop 168 -> 128 (the
survivor set is near-clutter-bound, not angle-bound — clutter by the
camera intersects EVERY packet's frustum), so 4x more packets x 0.76x
candidates x gs=256 per-iter cost nets 63.8 ms vs 45.5 ms (1.4x SLOWER),
while selection cost doubles (L0 2.3->8.4 ms, L1 10.0->15.6 ms).
Exactness equivalence vs the 32x32 path: hitmatch 1.0, t-agree 0.9994.
Groups: g1 45.5 / g4 57.5 / g8 77.2 ms — v12's sub-tile strips lose at
every granularity once ET is known to be candidate-bound (see
exp_v13_et_ceiling.py). Epilogue (attr16 gather + plane-exact t) is
28.3 ms at N=64 — 38%% of render — the v14 target.

Phases measured (slope-timed, true device sync):
  A. L0 select_chunks            (32x32 tiles, deployed)
  B. L1 select_chunklets_exact   (32x32, uncapped skip_exact)
  C. exactsel kernel             groups in {1, 4, 8}
  D. epilogue (packed attr gather + plane-exact t)
  E. 16x16 variant: L0(k=192) + L1 + kernel(rt=256, groups in {1, 2})
     + hit/idx equivalence vs the deployed 32x32 result.
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


def slope(fn, *args, k1=2, k2=6):
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
    return out, ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main():
    from habitat_tpu.sims.procedural import generate_scan_apartment, build_lod_scene
    from habitat_tpu.sims.loaders import save_scene_gltf, load_scene
    from habitat_tpu.sims.scene import pack_scenes
    from habitat_tpu.ops.raycast import (
        ray_feature_matrix,
        select_chunks,
        select_chunklets_exact,
        tile_plane_normals_cam,
    )
    from habitat_tpu.ops.raycast_pallas import raycast_pallas_exactsel_t
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
    res["C_big"] = C_big

    N = int(os.environ.get("N", "256"))
    H, W = 128, 128
    R = H * W
    rng = np.random.default_rng(1)
    pos = np.stack([loaded.sample_navigable_point(rng) for _ in range(N)])
    pos[:, 1] = loaded.floor_y + 1.2
    posj = jnp.asarray(pos, jnp.float32)
    yawj = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
    pitchj = jnp.zeros((N,), jnp.float32)
    sids = jnp.zeros((N,), jnp.int32)

    d_cam = camera_rays(
        jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), H, W
    ).reshape(-1, 3)

    from habitat_tpu.utils.geometry import view_rotation_matrix

    R3 = view_rotation_matrix(yawj, pitchj)  # (N,3,3)
    dirs_world = jnp.einsum("nij,rj->nri", R3, d_cam)
    dirs_world = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(posj[:, None, :], (N, R, 3))

    def blocks(x, tb):
        tail = x.shape[2:]
        x = x.reshape((N, H // tb, tb, W // tb, tb) + tail)
        x = jnp.swapaxes(x, 2, 3)
        return x.reshape((N, R) + tail)

    gm32 = pack.tri_mat_g32
    ab = pack.chunklet_ab32
    B_l = ray_feature_matrix(posj, yawj, pitchj)
    Bt_l = jnp.pad(B_l.transpose(0, 2, 1), ((0, 0), (0, 6), (0, 0)))

    def setup_tile(tb, k0):
        ocb = blocks(origins, tb)
        dcb_w = blocks(dirs_world, tb)
        rt = tb * tb
        nt = R // rt
        d_cam_b = blocks(
            jnp.broadcast_to(d_cam[None], (N, R, 3)), tb
        )[0]  # (R,3) cam frame in tb-block order
        d_aug = jnp.concatenate([d_cam_b, jnp.ones((R, 1), jnp.float32)], -1)
        d_t = jnp.pad(
            d_aug.reshape(nt, rt, 4).transpose(0, 2, 1), ((0, 0), (0, 4), (0, 0))
        )
        planes = jnp.asarray(
            tile_plane_normals_cam(np.deg2rad(90.0), H, W, tb, tb)
        )
        f_sel0 = jax.jit(
            lambda cb, o, d: select_chunks(cb, o, d, rt, k0, with_cnt=True)
        )
        cb = pack.chunk_bounds[sids]
        (ids0, cnt0), dt0 = slope(f_sel0, cb, ocb, dcb_w)
        f_sel1 = jax.jit(
            lambda i0, c0: select_chunklets_exact(
                pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid,
                ab, sids, posj, yawj, pitchj, planes, i0, c0,
                parent_c=C_big, c=32, skip_exact=True,
            )
        )
        (ids, cnt), dt1 = slope(f_sel1, ids0, cnt0)
        return dict(
            rt=rt, nt=nt, d_t=d_t, ids=ids, cnt=cnt,
            dt_l0=dt0, dt_l1=dt1,
            cnt0_mean=float(jnp.mean(cnt0)), cnt_mean=float(jnp.mean(cnt)),
            cnt_max=int(jnp.max(cnt)), kf=int(ids.shape[-1]),
        )

    # ---- deployed 32x32 ---------------------------------------------------
    def scalars(s):
        return {
            k: v
            for k, v in s.items()
            if k.startswith(("dt", "cnt_m", "cnt0", "kf"))
        }

    s32 = setup_tile(32, 320)
    res["t32"] = scalars(s32)

    def run_kernel(s, groups):
        f = jax.jit(
            lambda ids, cnt, d_t, Bt: raycast_pallas_exactsel_t(
                gm32, sids, ids, cnt, d_t, Bt,
                ray_tile=s["rt"], tri_chunk=32, groups=groups,
            )
        )
        (t, idx), dt = slope(f, s["ids"], s["cnt"], s["d_t"], Bt_l)
        return (t, idx), dt

    outs32 = {}
    for g in (1, 4, 8):
        (t, idx), dt = run_kernel(s32, g)
        outs32[g] = (np.asarray(t), np.asarray(idx))
        res["t32"][f"kernel_ms_g{g}"] = round(dt * 1e3, 2)
        print(json.dumps(res))

    # ---- epilogue (deployed shape) ----------------------------------------
    t4, i4 = run_kernel(s32, 4)[0]

    def epi(t, idx):
        hit = idx >= 0
        safe_idx = jnp.maximum(idx, 0)
        a16 = pack.tri_attr16[sids[:, None], safe_idx]
        attrs = a16[..., 0:8] * hit[..., None].astype(jnp.float32)
        v0g = a16[..., 8:11]
        db = blocks(dirs_world, 32)
        ob = blocks(origins, 32)
        nd = jnp.sum(attrs[..., 0:3] * db, axis=-1)
        num = jnp.sum(attrs[..., 0:3] * (v0g - ob), axis=-1)
        ok = hit & (jnp.abs(nd) > 1e-6)
        return jnp.where(ok, num / jnp.where(ok, nd, 1.0), t), attrs

    _, dte = slope(jax.jit(epi), t4, i4)
    res["t32"]["epilogue_ms"] = round(dte * 1e3, 2)
    print(json.dumps(res))

    # ---- 16x16 packet variant ---------------------------------------------
    s16 = setup_tile(16, 192)
    res["t16"] = scalars(s16)
    for g in (1, 2):
        (t, idx), dt = run_kernel(s16, g)
        res["t16"][f"kernel_ms_g{g}"] = round(dt * 1e3, 2)
        # equivalence vs the deployed groups=4 32x32 result
        tt = np.asarray(t).reshape(N, H // 16, W // 16, 16, 16)
        tt = np.swapaxes(tt, 2, 3).reshape(N, R)
        ii = np.asarray(idx).reshape(N, H // 16, W // 16, 16, 16)
        ii = np.swapaxes(ii, 2, 3).reshape(N, R)
        t32v = outs32[4][0].reshape(N, H // 32, W // 32, 32, 32)
        t32v = np.swapaxes(t32v, 2, 3).reshape(N, R)
        i32v = outs32[4][1].reshape(N, H // 32, W // 32, 32, 32)
        i32v = np.swapaxes(i32v, 2, 3).reshape(N, R)
        hm = float(np.mean((ii >= 0) == (i32v >= 0)))
        both = (ii >= 0) & (i32v >= 0)
        tagree = float(np.mean(np.abs(tt - t32v)[both] < 5e-3)) if both.any() else 1.0
        res["t16"][f"g{g}_hitmatch_vs32"] = round(hm, 5)
        res["t16"][f"g{g}_t_agree_vs32"] = round(tagree, 5)
        print(json.dumps(res))

    print("FINAL:", json.dumps(res))


if __name__ == "__main__":
    main()
