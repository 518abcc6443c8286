"""Size the two-level selection: per-(env, 32x32-tile) survivor counts of
C=32 sub-chunks under the exact 4-plane frustum test + occlusion depth
bound, on the scan-bench scene. Decides the kernel's K1 budget."""
import sys, os
sys.path.insert(0, ".")
import numpy as np
import jax; jax.config.update("jax_default_device", jax.devices("cpu")[0])
import jax.numpy as jnp

from habitat_tpu.sims.procedural import generate_scan_apartment, build_lod_scene
from habitat_tpu.sims.loaders import save_scene_gltf, load_scene
from habitat_tpu.sims.scene import pack_scenes
from habitat_tpu.utils.geometry import camera_rays, view_rotation_matrix

if not os.path.exists("/tmp/scan_apartment.gltf"):
    scene = generate_scan_apartment(0, tess=0.04, n_clutter=40)
    save_scene_gltf(scene, "/tmp/scan_apartment.gltf")
loaded = load_scene("/tmp/scan_apartment.gltf")
lod = build_lod_scene(loaded, cells=(0.08, 0.25, 0.6), bands=(1.2, 3.0, 8.0))
lod.scene_id = loaded.scene_id
pack = pack_scenes([lod])
v0 = np.asarray(pack.tri_v0[0]); e1 = np.asarray(pack.tri_e1[0]); e2 = np.asarray(pack.tri_e2[0])
valid = np.asarray(pack.tri_valid[0])
cb128 = np.asarray(pack.chunk_bounds[0])  # (NC,>=4)
T = v0.shape[0]; C = 32; NSC = T // C
print("tris:", T, "subchunks:", NSC, "chunks128:", T // 128)

# subchunk bounding spheres + LOD bands
verts = np.stack([v0, v0 + e1, v0 + e2], 1).reshape(NSC, C * 3, 3)
vmask = np.repeat(valid.reshape(NSC, C), 3, axis=1)
ctr = np.where(vmask[:, :, None], verts, np.nan).reshape(NSC, -1, 3)
center = np.nanmean(ctr, axis=1)
center = np.nan_to_num(center)
r = np.sqrt(np.nanmax(np.where(vmask, ((verts - center[:, None]) ** 2).sum(-1), 0), axis=1))
r = np.where(valid.reshape(NSC, C).any(1), r, 0.0)
# LOD bands ride the parent 128-chunk (cols 4:6)
has_band = cb128.shape[-1] >= 6
if has_band:
    dmin128 = cb128[:, 4]; dmax128 = cb128[:, 5]
    dminS = np.repeat(dmin128, 4)[:NSC]; dmaxS = np.repeat(dmax128, 4)[:NSC]

H = W = 128; TH = 32
rng = np.random.default_rng(0)
pos = np.stack([loaded.sample_navigable_point(rng) for _ in range(8)])
pos[:, 1] = loaded.floor_y + 1.2
yaw = rng.uniform(0, 2 * np.pi, 8)

d = np.asarray(camera_rays(jnp.float32(0), jnp.float32(0), jnp.deg2rad(90.0), H, W))  # (H,W,3)

# per-tile occlusion depth bound from a low-res raycast (1 ray / 8x8 px)
from habitat_tpu.ops.raycast import raycast_mxu_batch
dl = np.asarray(jax.vmap(lambda y: camera_rays(y, jnp.float32(0), jnp.deg2rad(90.0), H // 8, W // 8))(jnp.asarray(yaw)))  # (8,16,16,3)
o_lr = np.broadcast_to(pos[:, None, :], (8, 256, 3)).astype(np.float32)
t_lr, _ = jax.jit(lambda o, dd: raycast_mxu_batch(pack.tri_mat[jnp.zeros(8, jnp.int32)], o, dd))(jnp.asarray(o_lr), jnp.asarray(dl.reshape(8, 256, 3)))
t_lr = np.asarray(t_lr).reshape(8, 16, 16)
t_lr = np.where(t_lr > 1e5, 40.0, t_lr)
dmax_tile = np.zeros((8, 4, 4))
for by in range(4):
    for bx in range(4):
        dmax_tile[:, by, bx] = t_lr[:, by*4:(by+1)*4, bx*4:(bx+1)*4].reshape(8, -1).max(1) * 1.2 + 1.0

counts = []
counts_occ = []
for n in range(8):
    R3 = np.asarray(view_rotation_matrix(jnp.asarray(yaw[n]), jnp.asarray(0.0)))
    for by in range(H // TH):
        for bx in range(W // TH):
            blk = d[by*TH:(by+1)*TH, bx*TH:(bx+1)*TH].reshape(-1, 3)
            corners = blk[[0, TH-1, -TH, -1]]
            ctr_d = blk.mean(0)
            corners = corners + (corners - ctr_d) * 0.05
            ns = []
            for i in range(4):
                a, b = corners[i], corners[(i+1) % 4]
                nrm = np.cross(a, b)
                if np.dot(nrm, ctr_d) < 0: nrm = -nrm
                ns.append(nrm / np.linalg.norm(nrm))
            ns = np.asarray(ns) @ R3.T  # world inward normals
            rel = center - pos[n]
            dist = np.linalg.norm(rel, axis=-1)
            inside = ((rel @ ns.T) > -r[:, None]).all(axis=1) & (r > 0)
            if has_band:
                inside &= ((dist + r) >= dminS) & ((dist - r) <= dmaxS)
            counts.append(inside.sum())
            occ = inside & ((dist - r) <= dmax_tile[n, by, bx])
            counts_occ.append(occ.sum())
counts = np.asarray(counts); counts_occ = np.asarray(counts_occ)
print(f"plane+band survivors per tile: mean {counts.mean():.0f} p50 {np.percentile(counts,50):.0f} p90 {np.percentile(counts,90):.0f} max {counts.max()}")
print(f"+occlusion bound: mean {counts_occ.mean():.0f} p50 {np.percentile(counts_occ,50):.0f} p90 {np.percentile(counts_occ,90):.0f} max {counts_occ.max()}")
print(f"candidate TRIS per tile at C=32+occ: mean {counts_occ.mean()*32:.0f} (vs 4096 at K=32xC128)")
