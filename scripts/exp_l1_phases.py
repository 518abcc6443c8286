"""L1 (AABB chunklet cull) sub-phase timing at scan shape (N=256):
what do the 130.9 ms go to — the parent-row AABB gather, the 4-plane
positive-vertex loop, or the two sorts? Plus the single-packed-sort
variant (the id-argsort is redundant: the final (dmin<<18|id) key already
id-orders equal-dmin ties)."""
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
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main():
    from habitat_tpu.sims.procedural import generate_scan_apartment, build_lod_scene
    from habitat_tpu.sims.loaders import save_scene_gltf, load_scene
    from habitat_tpu.sims.scene import pack_scenes
    from habitat_tpu.ops.raycast import (
        select_chunks,
        tile_plane_normals_cam,
    )
    from habitat_tpu.utils.geometry import camera_rays, view_rotation_matrix

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
    ab = pack.chunklet_ab32

    ids0, cnt0 = jax.jit(
        lambda cb, ob, db: select_chunks(cb, ob, db, 1024, 320, with_cnt=True)
    )(cb, ob, db)

    S, T, _ = pack.tri_v0.shape
    c = 32
    NCH = T // c
    NC0 = T // C_big
    expand = C_big // c
    K0 = ids0.shape[-1]
    Kc = K0 * expand

    # phase a: the parent-row AABB gather alone
    def f_gather(ab, ids0):
        return ab.reshape(S * NC0, expand, 6)[
            sids[:, None, None] * NC0 + ids0
        ].reshape(N, nt, Kc, 6)

    f_gather = jax.jit(f_gather)
    abg = f_gather(ab, ids0)
    res["gather_ms"] = round(slope(f_gather, ab, ids0) * 1e3, 1)
    print(json.dumps(res), flush=True)

    # phase b: plane loop given the gathered boxes
    R3 = view_rotation_matrix(yawj, pitchj)
    nw = jnp.einsum("nij,kpj->nkpi", R3, planes_l,
                    precision=jax.lax.Precision.HIGHEST)

    def f_planes(abg, nw):
        ctr = abg[..., 0:3] - posj[:, None, None, :]
        half = abg[..., 3:6]
        inside = None
        for pl_i in range(4):
            nw_p = nw[:, :, None, pl_i, :]
            d_p = jnp.sum((ctr + jnp.sign(nw_p) * half) * nw_p, axis=-1)
            ok_p = d_p > -1e-3
            inside = ok_p if inside is None else (inside & ok_p)
        return inside

    f_planes = jax.jit(f_planes)
    surv = f_planes(abg, nw)
    res["planes_ms"] = round(slope(f_planes, abg, nw) * 1e3, 1)
    res["surv_mean"] = round(float(jnp.mean(jnp.sum(surv, -1))), 1)
    print(json.dumps(res), flush=True)

    # phase c: the CURRENT two-sort compaction
    cand = (
        ids0[..., None] * expand
        + jnp.arange(expand, dtype=jnp.int32)[None, None, None, :]
    ).reshape(N, nt, Kc)
    pos0 = jnp.arange(K0, dtype=jnp.int32)
    cand_valid = jnp.broadcast_to(
        pos0[None, None, :, None] < cnt0[..., None, None], (N, nt, K0, expand)
    ).reshape(N, nt, Kc)

    def f_twosort(surv, abg):
        s = surv & cand_valid
        ka = 512
        key1 = jnp.where(s, cand, jnp.int32(1 << 30))
        ord1 = jnp.argsort(key1, axis=-1)[..., :ka]
        ids1 = jnp.take_along_axis(cand, ord1, axis=-1)
        ctr1 = jnp.take_along_axis(
            abg[..., 0:3] - posj[:, None, None, :], ord1[..., None], axis=2
        )
        half1 = jnp.take_along_axis(abg[..., 3:6], ord1[..., None], axis=2)
        dmin1 = jnp.maximum(
            jnp.linalg.norm(ctr1, axis=-1) - jnp.linalg.norm(half1, axis=-1),
            0.0,
        )
        dmin_cm = jnp.clip(jnp.floor(dmin1 * 1e2), 0, 8191).astype(jnp.int32)
        packed = (dmin_cm << 18) | ids1
        cnt1 = jnp.minimum(jnp.sum(s, axis=-1), ka).astype(jnp.int32)
        posk = jnp.arange(ka, dtype=jnp.int32)
        alive = posk[None, None, :] < cnt1[..., None]
        key2 = jnp.where(alive, packed, jnp.int32(0x7FFFFFFF))
        kf = 384
        packed2 = jnp.sort(key2, axis=-1)[..., :kf]
        return packed2, cnt1

    f_twosort = jax.jit(f_twosort)
    _ = f_twosort(surv, abg)
    res["twosort_ms"] = round(slope(f_twosort, surv, abg) * 1e3, 1)
    print(json.dumps(res), flush=True)

    # phase d: SINGLE packed sort (dmin for all Kc, one sort, slice kf)
    def f_onesort(surv, abg):
        s = surv & cand_valid
        ctr = abg[..., 0:3] - posj[:, None, None, :]
        half = abg[..., 3:6]
        dmin = jnp.maximum(
            jnp.linalg.norm(ctr, axis=-1) - jnp.linalg.norm(half, axis=-1),
            0.0,
        )
        dmin_cm = jnp.clip(jnp.floor(dmin * 1e2), 0, 8191).astype(jnp.int32)
        packed = jnp.where(s, (dmin_cm << 18) | cand, jnp.int32(0x7FFFFFFF))
        kf = 512
        packed2 = jax.lax.sort(packed, dimension=-1)[..., :kf]
        cnt2 = jnp.minimum(jnp.sum(s, axis=-1), kf).astype(jnp.int32)
        return packed2, cnt2

    f_onesort = jax.jit(f_onesort)
    p2, c2 = f_onesort(surv, abg)
    res["onesort_ms"] = round(slope(f_onesort, surv, abg) * 1e3, 1)
    print(json.dumps(res), flush=True)

    # phase e: parent-level AABB prefilter cost (planes over K0=320 parents)
    abp_tab = ab.reshape(S, NC0, expand, 6)
    lo = jnp.min(abp_tab[..., 0:3] - abp_tab[..., 3:6], axis=2)
    hi = jnp.max(abp_tab[..., 0:3] + abp_tab[..., 3:6], axis=2)
    abp = jnp.concatenate([(lo + hi) * 0.5, (hi - lo) * 0.5], axis=-1)

    def f_parent(ids0, nw):
        g = abp.reshape(S * NC0, 6)[sids[:, None, None] * NC0 + ids0]
        ctr = g[..., 0:3] - posj[:, None, None, :]
        half = g[..., 3:6]
        inside = None
        for pl_i in range(4):
            nw_p = nw[:, :, None, pl_i, :]
            d_p = jnp.sum((ctr + jnp.sign(nw_p) * half) * nw_p, axis=-1)
            ok_p = d_p > -1e-3
            inside = ok_p if inside is None else (inside & ok_p)
        return inside

    f_parent = jax.jit(f_parent)
    psurv = f_parent(ids0, nw)
    res["parent_ms"] = round(slope(f_parent, ids0, nw) * 1e3, 1)
    pos0v = pos0[None, None, :] < cnt0[..., None]
    res["parent_surv_mean"] = round(
        float(jnp.mean(jnp.sum(psurv & pos0v, -1))), 1
    )
    res["parent_surv_max"] = int(jnp.max(jnp.sum(psurv & pos0v, -1)))

    print("FINAL:", json.dumps(res))


if __name__ == "__main__":
    main()
