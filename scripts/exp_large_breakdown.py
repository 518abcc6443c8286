"""Large-scene render breakdown on TPU: selection prepass vs stream kernel
vs epilogue, plus survivor-count stats. Round-3 experiment for the >=5k sps
scan-scene target."""
import sys, os, time, json
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

from habitat_tpu.sims.procedural import generate_scan_apartment, build_lod_scene
from habitat_tpu.sims.loaders import save_scene_gltf, load_scene
from habitat_tpu.sims.scene import pack_scenes
from habitat_tpu.ops.raycast import (
    ray_feature_matrix, select_chunks_occluded, render_batch)
from habitat_tpu.ops.raycast_pallas import group_tri_mat_pad16, raycast_pallas_stream_t
from habitat_tpu.utils.geometry import camera_rays
from scripts._timing import chain_time

if not os.path.exists("/tmp/scan_apartment.gltf"):
    scene = generate_scan_apartment(0, tess=0.04, n_clutter=40)
    save_scene_gltf(scene, "/tmp/scan_apartment.gltf")
loaded = load_scene("/tmp/scan_apartment.gltf")
lod_scene = build_lod_scene(loaded, cells=(0.08, 0.25, 0.6), bands=(1.2, 3.0, 8.0))
lod_scene.scene_id = loaded.scene_id
pack = pack_scenes([lod_scene])
print("chunks:", pack.tri_mat.shape[3] // 128)

rng = np.random.default_rng(0)
N, H, W = 256, 128, 128
pos = np.stack([loaded.sample_navigable_point(rng) for _ in range(N)])
pos[:, 1] = loaded.floor_y + 1.2
sids = jnp.zeros((N,), jnp.int32)
posj = jnp.asarray(pos, jnp.float32)
yaw = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
pitch = jnp.zeros((N,), jnp.float32)
R = H * W
K = 32

def _blk(x, inv=False):
    tail = x.shape[2:]
    if inv: x = x.reshape((N, H//32, W//32, 32, 32) + tail)
    else:   x = x.reshape((N, H//32, 32, W//32, 32) + tail)
    x = jnp.swapaxes(x, 2, 3)
    return x.reshape((N, R) + tail)

dirs = jax.jit(lambda y: jax.vmap(lambda yy: camera_rays(yy, jnp.float32(0), jnp.deg2rad(90.0), H, W))(y).reshape(N, -1, 3))(yaw)
orig = jnp.broadcast_to(posj[:, None, :], (N, R, 3))
ob, db = jax.jit(lambda o, d: (_blk(o), _blk(d)))(orig, dirs)
gm = jax.jit(group_tri_mat_pad16)(pack.tri_mat)

d_cam = np.asarray(camera_rays(jnp.float32(0), jnp.float32(0), jnp.deg2rad(90.0), H, W)).reshape(-1, 3)
dcb = np.asarray(jax.jit(lambda x: _blk(x))(jnp.broadcast_to(jnp.asarray(d_cam), (N, R, 3))))[0]
d_aug = np.concatenate([dcb, np.ones((R, 1), np.float32)], -1)
nt = R // 1024
d_t = jnp.asarray(np.pad(d_aug.reshape(nt, 1024, 4).transpose(0, 2, 1), ((0,0),(0,4),(0,0))))

def select_only(p):
    o = jnp.broadcast_to(p[:, None, :], (N, R, 3))
    ids, cnt, dmin = select_chunks_occluded(
        pack.tri_mat, pack.chunk_bounds[sids], sids, _blk(o), db, 1024, K, with_cnt=True)
    return p + 1e-9 * cnt[:, :1].astype(jnp.float32)

ids0, cnt0, dmin0 = jax.jit(lambda: select_chunks_occluded(
    pack.tri_mat, pack.chunk_bounds[sids], sids, ob, db, 1024, K, with_cnt=True))()
c = np.asarray(cnt0)
print(f"survivor chunks per tile: mean {c.mean():.1f} p50 {np.percentile(c,50):.0f} p90 {np.percentile(c,90):.0f} max {c.max()} (K={K})")

B0 = ray_feature_matrix(posj, yaw, pitch)
Bt0 = jnp.pad(B0.transpose(0, 2, 1), ((0, 0), (0, 6), (0, 0)))

def kernel_only(g, p):
    t, idx = raycast_pallas_stream_t(g, sids, ids0, cnt0, dmin0, d_t, Bt0, ray_tile=1024, tri_chunk=128)
    return p + 1e-9 * t[:, :1]

def full_render(p):
    out = render_batch(pack, sids, p, yaw, pitch, height=H, width=W, cull_k=K)
    return p + 1e-9 * out["depth"][:, 0, 0]

per = chain_time(select_only, posj, k1=2, k2=8)
print(f"select: {per*1e3:.1f} ms/step")
per = chain_time(lambda p: kernel_only(gm, p), posj, k1=2, k2=8)
print(f"kernel: {per*1e3:.1f} ms/step")
per = chain_time(full_render, posj, k1=2, k2=8)
print(f"full render_batch: {per*1e3:.1f} ms/step ({N/per:.0f} fps)")
