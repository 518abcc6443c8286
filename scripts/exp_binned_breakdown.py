"""Component breakdown of the binned raycast path: bin, pack, kernel."""
import sys; sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.ops import raycast as rc
from habitat_tpu.ops.raycast_pallas import raycast_pallas_binned_t
from habitat_tpu.utils.geometry import camera_rays
from scripts._timing import chain_time

N, H, W = 256, 128, 128
hfov = np.deg2rad(90.0)
scenes, episodes, fields = make_procedural_pointnav(num_scenes=4, episodes_per_scene=16, seed=0)
env = make_nav_env(scenes, episodes, num_envs=N, precomputed_fields=fields,
                   max_episode_steps=500,
                   sensor_specs=(("HabitatSimDepthSensor", {"height": H, "width": W}),))
pack = env.pack
print("T =", pack.tri_v0.shape[1], "S =", pack.tri_v0.shape[0])
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

B0 = rc.ray_feature_matrix(pos_j, yaw_j, pitch_j)
Bt0 = jnp.pad(B0.transpose(0, 2, 1), ((0, 0), (0, 6), (0, 0)))

def bin_only(p):
    order, cnt = rc.bin_tris_tiles(pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid,
                                   sids_j, p, yaw_j, pitch_j, planes)
    return p + 1e-9 * cnt[:, :1].astype(jnp.float32)

order0, cnt0 = jax.jit(lambda p: rc.bin_tris_tiles(
    pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid,
    sids_j, p, yaw_j, pitch_j, planes))(pos_j)

def pack_only(p):
    # perturb order's dtype path minimally to carry dependency
    mq, aq = rc.pack_tiles(pack.tri_mat, pack.tri_attr, pack.tri_v0, sids_j, order0)
    return p + 1e-9 * mq[:, 0, 0, :3]

mq0, aq0 = jax.jit(lambda: rc.pack_tiles(pack.tri_mat, pack.tri_attr, pack.tri_v0, sids_j, order0))()

def kernel_only(p):
    t, aout = raycast_pallas_binned_t(mq0, aq0, cnt0, d_t, Bt0, ray_tile=ray_tile)
    return p + 1e-9 * t[:, :3]

for nm, st in (("bin", bin_only), ("pack", pack_only), ("kernel", kernel_only)):
    per = chain_time(st, pos_j, k1=4, k2=20)
    print(f"{nm}: {per*1e3:.3f} ms/step")
