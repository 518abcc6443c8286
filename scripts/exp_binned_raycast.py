"""Tile-culled vs brute raycast on TPU: selection exactness, plane-t
fidelity, slope timing. Round-3 experiment backing the v8 tile-culled
renderer (select_chunks_frustum + raycast_pallas_tilecull_t)."""
import sys; sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.ops import raycast as rc
from habitat_tpu.ops.raycast_pallas import (
    group_tri_mat, raycast_pallas_fused_t, raycast_pallas_fused_sel_t)
from habitat_tpu.utils.geometry import camera_rays
from scripts._timing import chain_time

N, H, W = 256, 128, 128
hfov = np.deg2rad(90.0)
scenes, episodes, fields = make_procedural_pointnav(num_scenes=4, episodes_per_scene=16, seed=0)
env = make_nav_env(scenes, episodes, num_envs=N, precomputed_fields=fields,
                   max_episode_steps=500,
                   sensor_specs=(("HabitatSimDepthSensor", {"height": H, "width": W}),))
pack = env.pack
rng = np.random.RandomState(0)
starts = np.array([e.start_position for e in episodes])
pos = starts[rng.randint(0, len(starts), N)] + rng.uniform(-0.3, 0.3, (N, 3)) * [1, 0, 1]
pos[:, 1] += 1.25
yaw = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
sids = rng.randint(0, pack.tri_v0.shape[0], N).astype(np.int32)
pos_j = jnp.asarray(pos, jnp.float32); yaw_j = jnp.asarray(yaw)
pitch_j = jnp.zeros(N, jnp.float32); sids_j = jnp.asarray(sids)

d_cam = np.asarray(camera_rays(jnp.float32(0), jnp.float32(0), jnp.float32(hfov), H, W)).reshape(-1, 3)
R = H * W; ray_tile = 2048; nt = R // ray_tile
d_aug = np.concatenate([d_cam, np.ones((R, 1), np.float32)], -1)
d_t = jnp.asarray(np.pad(d_aug.reshape(nt, ray_tile, 4).transpose(0, 2, 1), ((0,0),(0,4),(0,0))))
planes = jnp.asarray(rc.tile_plane_normals_cam(hfov, H, W, ray_tile // W, W))
gm32 = jax.jit(lambda m: group_tri_mat(m, tri_chunk=32))(pack.tri_mat)
gm128 = jax.jit(group_tri_mat)(pack.tri_mat)

def brute(pos, yaw, pitch, sids):
    B = rc.ray_feature_matrix(pos, yaw, pitch)
    Bt = jnp.pad(B.transpose(0, 2, 1), ((0, 0), (0, 6), (0, 0)))
    return raycast_pallas_fused_t(gm128, sids, d_t, Bt, ray_tile=ray_tile)

def culled(pos, yaw, pitch, sids):
    B = rc.ray_feature_matrix(pos, yaw, pitch)
    Bt = jnp.pad(B.transpose(0, 2, 1), ((0, 0), (0, 6), (0, 0)))
    ids, cnt = rc.select_chunks_frustum(pack.tri_v0, pack.tri_e1, pack.tri_e2,
                                        pack.tri_valid, sids, pos, yaw, pitch,
                                        planes, tri_chunk=32)
    t, idx = raycast_pallas_fused_sel_t(gm32, sids, ids, cnt, d_t, Bt,
                                        ray_tile=ray_tile, tri_chunk=32)
    return t, idx, t, cnt

tb, ib = jax.jit(brute)(pos_j, yaw_j, pitch_j, sids_j)
tn, inn, aout, cnt = jax.jit(culled)(pos_j, yaw_j, pitch_j, sids_j)
tb, ib, tn, inn = map(np.asarray, (tb, ib, tn, inn))
cnt = np.asarray(cnt)
print("chunk cnt mean/max (of %d):" % (pack.tri_v0.shape[1] // 32), cnt.mean(), cnt.max())
print("idx match (selection):", (ib == inn).mean())
both = (ib == inn) & (ib >= 0)
dt = np.abs(tb - tn)[both]
print(f"|t_plane - t_G| on agreeing hits: p50 {np.percentile(dt,50)*1e3:.3f}mm p99 {np.percentile(dt,99)*1e3:.3f}mm max {dt.max()*1e3:.1f}mm")
np.savez("/tmp/tpu_rays.npz", tb=tb, ib=ib, tn=tn, inn=inn, pos=pos, yaw=yaw, sids=sids)

def step_brute(p):
    t, idx = brute(p, yaw_j, pitch_j, sids_j)
    return p + 1e-9 * t[:, :1]

def step_culled(p):
    t, idx, a, c = culled(p, yaw_j, pitch_j, sids_j)
    return p + 1e-9 * t[:, :1]

for nm, st in (("brute", step_brute), ("tilecull", step_culled)):
    per = chain_time(st, pos_j, k1=4, k2=20)
    print(f"{nm}: {per*1e3:.3f} ms/step ({N*R/per/1e9:.2f} Grays/s)")
