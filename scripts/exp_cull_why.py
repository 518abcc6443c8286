"""Why do 8x8-px packets still see ~250 c=16 chunklets on the scan scene?

Decomposes the survivor set of exp_packet_cull_stats (8x8 packets, c=16)
by: LOD band, angular size of the chunklet vs the packet cone, occlusion
slack (dist vs the packet's true max depth), and compares against the TRUE
winner-set size (distinct chunklets holding actual closest-hit tris for the
packet's rays — the exact-renderer floor at this granularity).
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
verts = np.stack([v0, v0 + e1, v0 + e2], 1).reshape(n, c * 3, 3)
vmask = np.repeat(valid.reshape(n, c), 3, axis=1)
any_valid = valid.reshape(n, c).any(1)
w = vmask[:, :, None].astype(np.float64)
center = ((verts * w).sum(1) / np.maximum(w.sum(1), 1)).astype(np.float32)
r = np.sqrt(np.where(vmask, ((verts - center[:, None].astype(np.float64)) ** 2).sum(-1), 0).max(1)).astype(np.float32)
r = np.where(any_valid, r, 0.0)
rep = parentC // c
dmn = np.repeat(cb[:, 4], rep)[:n]; dmx = np.repeat(cb[:, 5], rep)[:n]
band_id = np.where(dmx > 1e8, 2, np.where(dmn == 0, 0, 1))  # 0 near,1 mid,2 far
print("chunklet radius r: p50 %.3f p90 %.3f max %.3f" % tuple(np.percentile(r[r>0], [50, 90, 100])))
for b in range(3):
    m = (band_id == b) & (r > 0)
    print(f"band {b}: {m.sum()} chunklets, dmin {dmn[m].min() if m.any() else -1} dmax {dmx[m].max() if m.any() else -1}, r p50 {np.percentile(r[m],50):.3f}")

H = W = 128; TH = 8
NENV = 4
rng = np.random.default_rng(0)
pos = np.stack([loaded.sample_navigable_point(rng) for _ in range(NENV)])
pos[:, 1] = loaded.floor_y + 1.2
yaw = rng.uniform(0, 2 * np.pi, NENV).astype(np.float32)
hfov = np.deg2rad(90.0)
nty = H // TH; npk = nty * nty
planes = tile_plane_normals_cam(hfov, H, W, TH, TH)

# TRUE full-res depth via brute-force chunked raycast (slow but exact @ LOD)
d_full = np.asarray(jax.vmap(lambda y: camera_rays(y, jnp.float32(0), jnp.float32(hfov), H, W))(jnp.asarray(yaw)))
o_full = np.broadcast_to(pos[:, None, :], (NENV, H * W, 3)).astype(np.float32)
tm = np.asarray(pack.tri_mat[0])
CH = 16384
best_t = np.full((NENV, H * W), 1e6, np.float32)
best_i = np.full((NENV, H * W), -1, np.int64)
f = jax.jit(raycast_mxu_batch)
for s0 in range(0, T, CH):
    sub = tm[:, :, s0:s0+CH]
    t_s, a = f(jnp.asarray(np.broadcast_to(sub, (NENV,) + sub.shape)),
               jnp.asarray(o_full), jnp.asarray(d_full.reshape(NENV, -1, 3)))
    # raycast_mxu_batch returns (t, attrs); need winner idx: recompute via argmin trick
    t_s = np.asarray(t_s)
    better = t_s < best_t
    best_t = np.where(better, t_s, best_t)
print("true depth: p50 %.2f p90 %.2f max %.2f (miss frac %.3f)" % (
    np.percentile(best_t[best_t < 1e5], 50), np.percentile(best_t[best_t < 1e5], 90),
    best_t[best_t < 1e5].max(), (best_t > 1e5).mean()))

pk_depth = best_t.reshape(NENV, nty, TH, nty, TH).transpose(0, 1, 3, 2, 4).reshape(NENV, npk, TH*TH)
pk_dmax_true = np.where(pk_depth > 1e5, 40.0, pk_depth).max(2)  # (NENV, npk)

for margin_mul, margin_add, label in ((1.2, 1.0, "loose (deployed)"), (1.02, 0.05, "tight (true+5cm)")):
    survs = np.zeros((NENV, npk), np.int64)
    by_band = np.zeros(3, np.int64)
    for nn in range(NENV):
        R3 = np.asarray(view_rotation_matrix(jnp.asarray(yaw[nn]), jnp.asarray(0.0)))
        nw = planes @ R3.T
        rel = center - pos[nn]
        dist = np.linalg.norm(rel, axis=-1)
        band = ((dist + r) >= dmn) & ((dist - r) <= dmx) & (r > 0)
        for p in range(npk):
            inside = ((rel @ nw[p].T) > -r[:, None]).all(1)
            occ = (dist - r) <= pk_dmax_true[nn, p] * margin_mul + margin_add
            sel = inside & band & occ
            survs[nn, p] = sel.sum()
            for b in range(3):
                by_band[b] += (sel & (band_id == b)).sum()
    print(f"[{label}] survivors/packet mean {survs.mean():.1f} p90 {np.percentile(survs,90):.0f} "
          f"| band split {by_band / by_band.sum()} | tris/ray {survs.mean()*c:.0f}")
