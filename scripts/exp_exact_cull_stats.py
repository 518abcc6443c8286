"""Level-2 exact culling measurement for the v11 renderer design.

Per (env, 32x32 tile): chunklet survivors at c=16 under
  A) sphere cone test + band + loose occlusion   (v10-equivalent, baseline)
  B) A + EXACT 4-plane vertex test (any tri of the chunklet survives)
  C) B at c=4 sub-block granularity (gather unit stays 16: count sub-blocks)
plus the exact TRI-level survivor count (the floor for this culling family).
Uses the REAL tile_plane_normals_cam planes + bin_tris_tiles vertex rule.
"""
import sys, os
sys.path.insert(0, ".")
import numpy as np
import jax
jax.config.update("jax_default_device", jax.devices("cpu")[0])
import jax.numpy as jnp

from habitat_tpu.sims.procedural import generate_scan_apartment, build_lod_scene
from habitat_tpu.sims.loaders import save_scene_gltf, load_scene
from habitat_tpu.sims.scene import pack_scenes
from habitat_tpu.utils.geometry import camera_rays, view_rotation_matrix
from habitat_tpu.ops.raycast import tile_plane_normals_cam, raycast_mxu_batch

loaded = load_scene("/tmp/scan_apartment.gltf")
lod = build_lod_scene(loaded, cells=(0.08, 0.25, 0.6), bands=(1.2, 3.0, 8.0))
lod.scene_id = loaded.scene_id
pack = pack_scenes([lod])
v0 = np.asarray(pack.tri_v0[0]); e1 = np.asarray(pack.tri_e1[0]); e2 = np.asarray(pack.tri_e2[0])
valid = np.asarray(pack.tri_valid[0])
cb = np.asarray(pack.chunk_bounds[0])
T = v0.shape[0]; NC = cb.shape[0]; parentC = T // NC
c = 16
n = T // c
verts3 = np.stack([v0, v0 + e1, v0 + e2], 1)  # (T, 3, 3)

# chunklet spheres (c=16)
verts = verts3.reshape(n, c * 3, 3)
vmask = np.repeat(valid.reshape(n, c), 3, axis=1)
any_valid = valid.reshape(n, c).any(1)
w = vmask[:, :, None].astype(np.float64)
center = ((verts * w).sum(1) / np.maximum(w.sum(1), 1)).astype(np.float32)
r = np.sqrt(np.where(vmask, ((verts.astype(np.float64) - center[:, None]) ** 2).sum(-1), 0).max(1)).astype(np.float32)
r = np.where(any_valid, r, 0.0)
rep = parentC // c
dmn = np.repeat(cb[:, 4], rep)[:n]; dmx = np.repeat(cb[:, 5], rep)[:n]

H = W = 128; TH = 32
NENV = 6
rng = np.random.default_rng(0)
pos = np.stack([loaded.sample_navigable_point(rng) for _ in range(NENV)])
pos[:, 1] = loaded.floor_y + 1.2
yaw = rng.uniform(0, 2 * np.pi, NENV).astype(np.float32)
hfov = np.deg2rad(90.0)
nty = H // TH; npk = nty * nty
planes = tile_plane_normals_cam(hfov, H, W, TH, TH)  # (npk,4,3)

# loose occlusion bound via coarse-proxy low-res prepass (matches deployed)
coarse = cb[:, 5] > 1e8
proxy_ids = np.nonzero(coarse & (cb[:, 3] > 0))[0]
tm = np.asarray(pack.tri_mat[0])
tm_c = tm.reshape(10, 4, NC, parentC)[:, :, proxy_ids].reshape(10, 4, -1)
LH = LW = 16
dl = np.asarray(jax.vmap(lambda y: camera_rays(y, jnp.float32(0), jnp.float32(hfov), LH, LW))(jnp.asarray(yaw)))
o_lr = np.broadcast_to(pos[:, None, :], (NENV, LH * LW, 3)).astype(np.float32)
t_lr, _ = jax.jit(raycast_mxu_batch)(
    jnp.asarray(np.broadcast_to(tm_c, (NENV,) + tm_c.shape)),
    jnp.asarray(o_lr), jnp.asarray(dl.reshape(NENV, -1, 3)))
t_lr = np.asarray(t_lr).reshape(NENV, LH, LW)
t_lr = np.where(t_lr > 1e5, 40.0, t_lr)
s = LH // nty
dmax_tile = (t_lr.reshape(NENV, nty, s, nty, s).max((2, 4)) * 1.2 + 1.0).reshape(NENV, npk)

eps = -1e-3
rowsA, rowsB, rowsC, rowsT = [], [], [], []
for nn in range(NENV):
    R3 = np.asarray(view_rotation_matrix(jnp.asarray(yaw[nn]), jnp.asarray(0.0)))
    nw_all = planes @ R3.T  # (npk, 4, 3) world
    rel = center - pos[nn]
    dist = np.linalg.norm(rel, axis=-1)
    band = ((dist + r) >= dmn) & ((dist - r) <= dmx) & (r > 0)
    relv = verts3 - pos[nn]  # (T,3,3)
    for p in range(npk):
        nw = nw_all[p]  # (4,3)
        inside = ((rel @ nw.T) > -r[:, None]).all(1)
        occ = (dist - r) <= dmax_tile[nn, p]
        sph = inside & band & occ  # (n,) chunklet sphere survivors
        rowsA.append(sph.sum())
        # exact per-tri: all 3 verts outside one plane -> culled
        cand = np.nonzero(np.repeat(sph, c) & valid)[0]
        d = np.einsum("tvc,pc->tvp", relv[cand], nw)  # (Tc,3,4)
        tri_out = (d < eps).all(axis=1).any(axis=1)  # (Tc,)
        tri_in = ~tri_out
        # per-tri occlusion: min vertex dist - (tri diameter slack) <= dmax
        tri_dmin = np.linalg.norm(relv[cand], axis=-1).min(1)
        tri_in &= tri_dmin <= dmax_tile[nn, p]
        rowsT.append(tri_in.sum())
        ch_ids = cand // c
        sub_ids = cand // 4
        rowsB.append(len(np.unique(ch_ids[tri_in])))
        rowsC.append(len(np.unique(sub_ids[tri_in])))
A, B, C, TT = map(np.asarray, (rowsA, rowsB, rowsC, rowsT))
print(f"sphere c=16 survivors/tile:  mean {A.mean():7.1f} p90 {np.percentile(A,90):6.0f} max {A.max()}")
print(f"exact  c=16 survivors/tile:  mean {B.mean():7.1f} p90 {np.percentile(B,90):6.0f} max {B.max()}  tris-tested/ray {B.mean()*16:.0f}")
print(f"exact  c=4  sub-blocks/tile: mean {C.mean():7.1f} p90 {np.percentile(C,90):6.0f} max {C.max()}  tris-tested/ray {C.mean()*4:.0f}")
print(f"exact  tri survivors/tile:   mean {TT.mean():7.1f} p90 {np.percentile(TT,90):6.0f} max {TT.max()}")

# ---- AABB positive-vertex test at c=32 (gather-free-ish level-1) ----------
c2 = 32
n2 = T // c2
verts2 = verts3.reshape(n2, c2 * 3, 3)
vmask2 = np.repeat(valid.reshape(n2, c2), 3, axis=1)
any2 = valid.reshape(n2, c2).any(1)
big = np.where(vmask2[:, :, None], verts2, np.nan)
lo = np.where(any2[:, None], np.nanmin(big, 1), 0.0)
hi = np.where(any2[:, None], np.nanmax(big, 1), -1.0)
ctr2 = (lo + hi) / 2; half2 = (hi - lo) / 2
r2 = np.linalg.norm(half2, axis=-1)
rep2 = parentC // c2
dmn2 = np.repeat(cb[:, 4], rep2)[:n2]; dmx2 = np.repeat(cb[:, 5], rep2)[:n2]
rowsD, rowsE = [], []
for nn in range(NENV):
    R3 = np.asarray(view_rotation_matrix(jnp.asarray(yaw[nn]), jnp.asarray(0.0)))
    nw_all = planes @ R3.T
    rel = ctr2 - pos[nn]
    dist = np.linalg.norm(rel, axis=-1)
    band = ((dist + r2) >= dmn2) & ((dist - r2) <= dmx2) & any2
    relv = verts3 - pos[nn]
    for p in range(npk):
        nw = nw_all[p]
        # positive vertex: AABB corner most inside each plane
        pv = rel[:, None, :] + np.sign(nw)[None, :, :] * half2[:, None, :]  # (n2,4,3)
        inside = (np.einsum("npc,pc->np", pv, nw) > eps).all(1)
        occ = (dist - r2) <= dmax_tile[nn, p]
        box = inside & band & occ
        rowsD.append(box.sum())
        # exact any-tri within the box survivors
        cand = np.nonzero(np.repeat(box, c2) & valid)[0]
        d = np.einsum("tvc,pc->tvp", relv[cand], nw)
        tri_in = ~((d < eps).all(axis=1).any(axis=1))
        tri_in &= np.linalg.norm(relv[cand], axis=-1).min(1) <= dmax_tile[nn, p]
        rowsE.append(len(np.unique((cand // c2)[tri_in])))
D, E = np.asarray(rowsD), np.asarray(rowsE)
print(f"AABB  c=32 survivors/tile:   mean {D.mean():7.1f} p90 {np.percentile(D,90):6.0f} max {D.max()}  tris-tested/ray {D.mean()*c2:.0f}")
print(f"exact c=32 survivors/tile:   mean {E.mean():7.1f} p90 {np.percentile(E,90):6.0f} max {E.max()}  tris-tested/ray {E.mean()*c2:.0f}")

# ---- 4x sub-AABB (c=8) any-pass per c=32 gather unit ----------------------
c3 = 8
n3 = T // c3
verts8 = verts3.reshape(n3, c3 * 3, 3)
vmask8 = np.repeat(valid.reshape(n3, c3), 3, axis=1)
any8 = valid.reshape(n3, c3).any(1)
big8 = np.where(vmask8[:, :, None], verts8, np.nan)
lo8 = np.where(any8[:, None], np.nanmin(big8, 1), 0.0)
hi8 = np.where(any8[:, None], np.nanmax(big8, 1), -1.0)
ctr8 = (lo8 + hi8) / 2; half8 = (hi8 - lo8) / 2
rowsF = []
for nn in range(NENV):
    R3 = np.asarray(view_rotation_matrix(jnp.asarray(yaw[nn]), jnp.asarray(0.0)))
    nw_all = planes @ R3.T
    rel8 = ctr8 - pos[nn]
    dist8 = np.linalg.norm(rel8, axis=-1) - np.linalg.norm(half8, axis=-1)
    # band still applies at the c=32 unit level (parent-of-parent in deploy)
    rel = ctr2 - pos[nn]
    dist = np.linalg.norm(rel, axis=-1)
    band32 = ((dist + r2) >= dmn2) & ((dist - r2) <= dmx2) & any2
    for p in range(npk):
        nw = nw_all[p]
        pv = rel8[:, None, :] + np.sign(nw)[None, :, :] * half8[:, None, :]
        in8 = (np.einsum("npc,pc->np", pv, nw) > eps).all(1) & any8
        occ8 = dist8 <= dmax_tile[nn, p]
        sub_ok = (in8 & occ8).reshape(n2, 4).any(1)
        rowsF.append((sub_ok & band32).sum())
F = np.asarray(rowsF)
print(f"subAABB(c=8)->c=32 units:    mean {F.mean():7.1f} p90 {np.percentile(F,90):6.0f} max {F.max()}  tris-tested/ray {F.mean()*c2:.0f}")

# ---- exact c=32 WITHOUT occlusion bound (ET-kernel design point) ----------
rowsG, rowsH = [], []
for nn in range(NENV):
    R3 = np.asarray(view_rotation_matrix(jnp.asarray(yaw[nn]), jnp.asarray(0.0)))
    nw_all = planes @ R3.T
    rel = ctr2 - pos[nn]
    dist = np.linalg.norm(rel, axis=-1)
    band = ((dist + r2) >= dmn2) & ((dist - r2) <= dmx2) & any2
    relv = verts3 - pos[nn]
    for p in range(npk):
        nw = nw_all[p]
        pv = rel[:, None, :] + np.sign(nw)[None, :, :] * half2[:, None, :]
        inside = (np.einsum("npc,pc->np", pv, nw) > eps).all(1)
        box = inside & band
        rowsG.append(box.sum())
        cand = np.nonzero(np.repeat(box, c2) & valid)[0]
        d = np.einsum("tvc,pc->tvp", relv[cand], nw)
        tri_in = ~((d < eps).all(axis=1).any(axis=1))
        rowsH.append(len(np.unique((cand // c2)[tri_in])))
G2, H2 = np.asarray(rowsG), np.asarray(rowsH)
print(f"AABB  c=32 NO-occ:           mean {G2.mean():7.1f} p90 {np.percentile(G2,90):6.0f} max {G2.max()}")
print(f"exact c=32 NO-occ:           mean {H2.mean():7.1f} p90 {np.percentile(H2,90):6.0f} max {H2.max()}  tris-tested/ray {H2.mean()*c2:.0f}")
# parent-level (C=256) cone+band NO-occ counts (L0 sizing)
relp = cb[:, :3] - pos[:, None, :]
