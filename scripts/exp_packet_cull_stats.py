"""Design-point measurement for the round-4 per-packet renderer.

For packet sizes (32x32, 16x16, 8x8 px) x chunklet granularities
(256, 64, 32, 16 tris), counts per-(env, packet) surviving chunklets on the
scan-bench scene under the exact 4-plane frustum test (sphere-conservative)
+ LOD band + per-packet occlusion depth bound. Reports candidate TRIS per
ray and total tested (ray, tri) pairs per frame — the quantity the v10
stream kernel's VPU epilogue is bound by (~1.4-1.7us per 256-tri chunk-step
at Rt=1024; VERDICT r3 Missing #1 asks for the structural fix).
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

if not os.path.exists("/tmp/scan_apartment.gltf"):
    scene = generate_scan_apartment(0, tess=0.04, n_clutter=40)
    save_scene_gltf(scene, "/tmp/scan_apartment.gltf")
loaded = load_scene("/tmp/scan_apartment.gltf")
lod = build_lod_scene(loaded, cells=(0.08, 0.25, 0.6), bands=(1.2, 3.0, 8.0))
lod.scene_id = loaded.scene_id
pack = pack_scenes([lod])
v0 = np.asarray(pack.tri_v0[0]); e1 = np.asarray(pack.tri_e1[0]); e2 = np.asarray(pack.tri_e2[0])
valid = np.asarray(pack.tri_valid[0])
cb = np.asarray(pack.chunk_bounds[0])  # (NC, >=4) at pack granularity
T = v0.shape[0]; NC = cb.shape[0]; parentC = T // NC
print(f"tris {T} pack-chunks {NC} (C={parentC})", flush=True)

has_band = cb.shape[-1] >= 6

def chunklet_spheres(c):
    n = T // c
    verts = np.stack([v0, v0 + e1, v0 + e2], 1).reshape(n, c * 3, 3)
    vmask = np.repeat(valid.reshape(n, c), 3, axis=1)
    any_valid = valid.reshape(n, c).any(1)
    w = vmask[:, :, None].astype(np.float64)
    center = (verts * w).sum(1) / np.maximum(w.sum(1), 1)
    d2 = ((verts - center[:, None]) ** 2).sum(-1)
    r = np.sqrt(np.where(vmask, d2, 0).max(1))
    r = np.where(any_valid, r, 0.0)
    if has_band:
        rep = parentC // c
        dmin = np.repeat(cb[:, 4], rep)[:n]
        dmax = np.repeat(cb[:, 5], rep)[:n]
    else:
        dmin = np.zeros(n); dmax = np.full(n, 1e9)
    return center.astype(np.float32), r.astype(np.float32), dmin, dmax

H = W = 128
NENV = 8
rng = np.random.default_rng(0)
pos = np.stack([loaded.sample_navigable_point(rng) for _ in range(NENV)])
pos[:, 1] = loaded.floor_y + 1.2
yaw = rng.uniform(0, 2 * np.pi, NENV).astype(np.float32)
hfov = np.deg2rad(90.0)

# ---- occlusion prepass: 32x32 low-res rays against the coarse-LOD proxy ---
coarse = cb[:, 5] > 1e8 if has_band else np.ones(NC, bool)
cdist = np.ones(NC) * 1e9  # pick ALL coarse chunks as proxy (stats script)
proxy_ids = np.nonzero(coarse & (cb[:, 3] > 0))[0]
print(f"proxy chunks {len(proxy_ids)} ({len(proxy_ids)*parentC} tris)", flush=True)
tm = np.asarray(pack.tri_mat[0])  # (10, 4, T)
tm_c = tm.reshape(10, 4, NC, parentC)[:, :, proxy_ids].reshape(10, 4, -1)
LH = LW = 32
dl = np.asarray(jax.vmap(lambda y: camera_rays(y, jnp.float32(0), jnp.float32(hfov), LH, LW))(jnp.asarray(yaw)))
o_lr = np.broadcast_to(pos[:, None, :], (NENV, LH * LW, 3)).astype(np.float32)
t_lr, _ = jax.jit(raycast_mxu_batch)(
    jnp.asarray(np.broadcast_to(tm_c, (NENV,) + tm_c.shape)),
    jnp.asarray(o_lr), jnp.asarray(dl.reshape(NENV, -1, 3)))
t_lr = np.asarray(t_lr).reshape(NENV, LH, LW)
t_lr = np.where(t_lr > 1e5, 40.0, t_lr)

d_full = np.asarray(camera_rays(jnp.float32(0), jnp.float32(0), jnp.float32(hfov), H, W))  # (H,W,3) cam frame

rows = []
for TH in (32, 16, 8):
    nty = H // TH; npk = nty * nty
    planes = tile_plane_normals_cam(hfov, H, W, TH, TH)  # (npk, 4, 3) cam frame
    # per-packet occlusion bound from the low-res prepass (4x4-px ray grid)
    s = LH // nty  # prepass rays per packet side
    dmax_pk = t_lr.reshape(NENV, nty, s, nty, s).max((2, 4)) * 1.2 + 1.0  # (NENV, nty, nty)
    dmax_pk = dmax_pk.reshape(NENV, npk)
    for c in (256, 64, 32, 16):
        center, r, dmn, dmx = chunklet_spheres(c)
        survs = np.zeros((NENV, npk), np.int64)
        for n in range(NENV):
            R3 = np.asarray(view_rotation_matrix(jnp.asarray(yaw[n]), jnp.asarray(0.0)))
            nw = planes @ R3.T  # (npk, 4, 3) world inward normals
            rel = center - pos[n]  # (M, 3)
            dist = np.linalg.norm(rel, axis=-1)
            band = ((dist + r) >= dmn) & ((dist - r) <= dmx) & (r > 0)
            for p in range(npk):
                inside = ((rel @ nw[p].T) > -r[:, None]).all(1)
                occ = (dist - r) <= dmax_pk[n, p]
                survs[n, p] = int((inside & band & occ).sum())
        tris_ray = survs * c / 1.0  # tris tested per ray of this packet
        pairs = (survs * c * TH * TH).sum() / NENV  # tested pairs per env frame
        rows.append((TH, c, survs.mean(), np.percentile(survs, 90), survs.max(),
                     tris_ray.mean(), pairs))
        print(f"packet {TH}x{TH} c={c:4d}: chunklets/packet mean {survs.mean():8.1f} "
              f"p90 {np.percentile(survs,90):8.0f} max {survs.max():6d} | "
              f"tris/ray {tris_ray.mean():9.0f} | pairs/frame {pairs/1e6:9.1f}M", flush=True)

print("\nbaseline v10: ~145 chunks x 256 tris = 37k tris/ray, "
      f"pairs/frame {145*256*1024*16/1e6:.0f}M")
