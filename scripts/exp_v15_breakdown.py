"""v15 deployed-path phase breakdown + exact-survivor granularity ceiling.

Two questions (round-5, after v15 landed at 83.9 chunklets/tile):
1. Where does the N=256 128x128 scan render time go now?
   Phases: L0 select_chunks | v15 select_chunklets_exact(verts16) |
   exactsel kernel | v14 epilogue. Slope-timed with true device sync.
2. How much headroom is left in CANDIDATE GRANULARITY? The v15 cut is
   per-triangle (different tris separate against different planes), so
   count — host-side from the exact 3-vertex test — per tile:
     tris passing | c=8 groups w/ >=1 pass | c=16 | c=32 (deployed)
   If tris_pass << 32 * c32_groups, a finer-granularity kernel stream
   is the remaining lever; if not, the candidate set is saturated and
   the conversation moves to per-iter cost.
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
    from habitat_tpu.ops.raycast import (
        _lod_band_ok,
        ray_feature_matrix,
        select_chunks,
        select_chunklets_exact,
        tile_plane_normals_cam,
    )
    from habitat_tpu.ops.raycast_pallas import raycast_pallas_exactsel_t
    from habitat_tpu.utils.geometry import camera_rays, view_rotation_matrix

    res = {}
    scene = generate_scan_apartment(0, tess=0.04, n_clutter=40)
    lod = build_lod_scene(scene, cells=(0.08, 0.25, 0.6), bands=(1.2, 3.0, 8.0))
    lod.scene_id = scene.scene_id
    pack = pack_scenes([lod])
    res["tris"] = int(lod.num_triangles)
    C_big = pack.tri_mat.shape[3] // pack.chunk_bounds.shape[1]

    N, H, W = 256, 128, 128
    R = H * W
    nt = R // 1024
    rng = np.random.default_rng(0)
    pos = np.stack([scene.sample_navigable_point(rng) for _ in range(N)])
    pos[:, 1] = scene.floor_y + 1.2
    posj = jnp.asarray(pos, jnp.float32)
    yawj = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
    pitchj = jnp.zeros((N,), jnp.float32)
    sids = jnp.zeros((N,), jnp.int32)

    d4 = jax.vmap(
        lambda y: camera_rays(y, jnp.float32(0.0), jnp.deg2rad(90.0), H, W)
    )(yawj).reshape(N, -1, 3)
    o4 = jnp.broadcast_to(posj[:, None, :], d4.shape)

    def to_blocks(x):
        tail = x.shape[2:]
        x = x.reshape((N, H // 32, 32, W // 32, 32) + tail)
        x = jnp.swapaxes(x, 2, 3)
        return x.reshape((N, R) + tail)

    ob, db = to_blocks(o4), to_blocks(d4)
    d_cam = camera_rays(
        jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), H, W
    ).reshape(-1, 3)
    dcb = jnp.swapaxes(
        d_cam.reshape(H // 32, 32, W // 32, 32, 3), 1, 2
    ).reshape(R, 3)
    d_aug = jnp.concatenate([dcb, jnp.ones((R, 1), jnp.float32)], -1)
    d_t = jnp.pad(
        d_aug.reshape(nt, 1024, 4).transpose(0, 2, 1), ((0, 0), (0, 4), (0, 0))
    )
    Bt = jnp.pad(
        ray_feature_matrix(posj, yawj, pitchj).transpose(0, 2, 1),
        ((0, 0), (0, 6), (0, 0)),
    )
    planes = jnp.asarray(tile_plane_normals_cam(np.deg2rad(90.0), H, W, 32, 32))

    # ---- phase timings ---------------------------------------------------
    def time_fn(f, *args, reps=5):
        out = jax.block_until_ready(f(*args))
        t0 = time.time()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps * 1e3, out

    l0 = jax.jit(
        lambda pk, o, d: select_chunks(
            pk.chunk_bounds[sids], o, d, 1024, 320, with_cnt=True
        )
    )
    ms_l0, (ids0, cnt0) = time_fn(l0, pack, ob, db)
    res["l0_ms"] = round(ms_l0, 1)
    res["cnt0_mean"] = round(float(jnp.mean(cnt0)), 1)

    sel = jax.jit(
        lambda pk, i0, c0, p, y, pi: select_chunklets_exact(
            pk.tri_v0, pk.tri_e1, pk.tri_e2, pk.tri_valid,
            pk.chunklet_ab32, sids, p, y, pi, planes, i0, c0,
            parent_c=C_big, c=32, skip_exact=True, verts16=pk.tri_verts16,
        )
    )
    ms_sel, (ids, cnt) = time_fn(sel, pack, ids0, cnt0, posj, yawj, pitchj)
    res["v15_select_ms"] = round(ms_sel, 1)
    res["cnt_mean"] = round(float(jnp.mean(cnt)), 1)
    res["cnt_max"] = int(jnp.max(cnt))
    res["kf"] = int(ids.shape[-1])

    kern = jax.jit(
        lambda pk, i, c: raycast_pallas_exactsel_t(
            pk.tri_mat_g32, sids, i, c, d_t, Bt, ray_tile=1024, tri_chunk=32
        )
    )
    ms_k, (t, idx) = time_fn(kern, pack, ids, cnt)
    res["kernel_ms"] = round(ms_k, 1)

    # v14 epilogue timing: reuse render_batch's epilogue via a micro-closure
    # is awkward; time the dominant piece (attr16 row gather + channel-major
    # math) directly at the same shapes.
    def epi(pk, t, idx):
        hit = idx >= 0
        safe = jnp.maximum(idx, 0)
        a16 = pk.tri_attr16[sids[:, None], safe]  # (N, R, 16)
        at = a16.transpose(0, 2, 1)  # channel-major
        nd = jnp.sum(at[:, 0:3] * dcb.T[None], axis=1)
        n_o = jnp.sum(at[:, 0:3] * posj[:, :, None], axis=1)
        t_pl = (at[:, 11] - n_o) / jnp.where(jnp.abs(nd) > 1e-9, nd, 1.0)
        t_pl = jnp.where(hit, t_pl, 10.0)
        z = t_pl * (-dcb.T[None, 2])
        shade = 0.35 + 0.65 * jnp.abs(nd)
        rgb = jnp.where(hit[:, None, :], at[:, 3:6] * shade[:, None], 0.7)
        sem = jnp.where(hit, jnp.round(at[:, 6]).astype(jnp.int32), 0)
        return z, rgb, sem

    ms_e, _ = time_fn(jax.jit(epi), pack, t, idx)
    res["epilogue_ms"] = round(ms_e, 1)
    print("PHASES:", json.dumps(res))

    # ---- granularity ceiling (host-side exact test, n_val envs) ----------
    n_val = 4
    ids_np = np.asarray(ids[:n_val])
    cnt_np = np.asarray(cnt[:n_val])
    v0 = np.asarray(pack.tri_v0[0])
    e1 = np.asarray(pack.tri_e1[0])
    e2 = np.asarray(pack.tri_e2[0])
    valid = np.asarray(pack.tri_valid[0])
    R3 = np.asarray(jax.vmap(view_rotation_matrix)(yawj[:n_val], pitchj[:n_val]))
    pl = np.asarray(planes)  # (nt, 4, 3)
    cam = pos[:n_val]
    stats = {"tri_pass": [], "c8": [], "c16": [], "c32": []}
    for n in range(n_val):
        nw = np.einsum("ij,kpj->kpi", R3[n], pl)  # (nt,4,3) world
        for ti in range(nt):
            k = cnt_np[n, ti]
            ch = ids_np[n, ti, :k] & ((1 << 18) - 1)
            ch = np.unique(ch)
            tri_idx = (ch[:, None] * 32 + np.arange(32)[None]).ravel()
            p0 = v0[tri_idx] - cam[n]
            g1, g2 = e1[tri_idx], e2[tri_idx]
            ok = valid[tri_idx].copy()
            out_any = np.zeros(len(tri_idx), bool)
            for p_i in range(4):
                nwp = nw[ti, p_i]
                d0 = p0 @ nwp
                de1 = g1 @ nwp
                de2 = g2 @ nwp
                eps = -1e-3
                out_any |= (d0 < eps) & (d0 + de1 < eps) & (d0 + de2 < eps)
            tpass = ok & ~out_any
            stats["tri_pass"].append(int(tpass.sum()))
            tp = tpass.reshape(len(ch), 32)
            stats["c32"].append(int((tp.any(1)).sum()))
            stats["c16"].append(int(tp.reshape(-1, 16).any(1).sum()))
            stats["c8"].append(int(tp.reshape(-1, 8).any(1).sum()))
    res2 = {
        k: round(float(np.mean(v)), 1) for k, v in stats.items()
    }
    res2["streamed_tris_c32"] = round(res2["c32"] * 32, 1)
    res2["streamed_tris_c16"] = round(res2["c16"] * 16, 1)
    res2["streamed_tris_c8"] = round(res2["c8"] * 8, 1)
    print("GRANULARITY:", json.dumps(res2))


if __name__ == "__main__":
    main()
