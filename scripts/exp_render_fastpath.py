"""End-to-end render_batch fast path on TPU: depth fidelity vs CPU f32
oracle + slope timing, at headline (64x64) and probe (128x128) shapes."""
import sys; sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.ops import raycast as rc
from habitat_tpu.utils.geometry import camera_rays
from scripts._timing import chain_time

N = 256
scenes, episodes, fields = make_procedural_pointnav(num_scenes=4, episodes_per_scene=16, seed=0)
env = make_nav_env(scenes, episodes, num_envs=N, precomputed_fields=fields,
                   max_episode_steps=500,
                   sensor_specs=(("HabitatSimDepthSensor", {"height": 64, "width": 64}),))
pack = env.pack
rng = np.random.RandomState(0)
starts = np.array([e.start_position for e in episodes])
pos = starts[rng.randint(0, len(starts), N)] + rng.uniform(-0.3, 0.3, (N, 3)) * [1, 0, 1]
pos[:, 1] += 1.25
yaw = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
sids = rng.randint(0, pack.tri_v0.shape[0], N).astype(np.int32)
pos_j = jnp.asarray(pos, jnp.float32); yaw_j = jnp.asarray(yaw)
pitch_j = jnp.zeros(N, jnp.float32); sids_j = jnp.asarray(sids)

for H in (64, 128):
    W = H
    def rend(p):
        return rc.render_batch(pack, sids_j, p, yaw_j, pitch_j, height=H, width=W,
                               max_depth=10.0, normalize_depth=False)
    out = jax.jit(rend)(pos_j)
    depth = np.asarray(out["depth"])[..., 0]

    # CPU f32 oracle on a subset of envs
    M = 8
    v0 = np.asarray(pack.tri_v0); e1 = np.asarray(pack.tri_e1); e2 = np.asarray(pack.tri_e2)
    valid = np.asarray(pack.tri_valid)
    agree = []
    for n in range(M):
        d = np.asarray(camera_rays(jnp.asarray(yaw[n]), jnp.float32(0),
                                   jnp.deg2rad(90.0), H, W)).reshape(-1, 3)
        s = sids[n]
        to, io_ = rc.raycast_rays(jnp.asarray(v0[s]), jnp.asarray(e1[s]), jnp.asarray(e2[s]),
                                  jnp.asarray(valid[s]),
                                  jnp.broadcast_to(jnp.asarray(pos[n], jnp.float32), (H*W, 3)), jnp.asarray(d, jnp.float32))
        to = np.asarray(to)
        dcam = np.asarray(camera_rays(jnp.float32(0), jnp.float32(0), jnp.deg2rad(90.0), H, W)).reshape(-1, 3)
        z_ref = np.where(to < 1e5, to * (-dcam[:, 2]), 10.0)
        z_ref = np.clip(z_ref, 0.0, 10.0)
        agree.append(np.abs(depth[n].reshape(-1) - z_ref) < 5e-3)
    agree = np.concatenate(agree)
    print(f"H={H}: depth agreement @5mm vs CPU f32 oracle: {agree.mean():.5f}")

    def step(p):
        o = rend(p)
        return p + 1e-9 * o["depth"][:, 0, 0]
    per = chain_time(step, pos_j, k1=4, k2=20)
    print(f"H={H}: render {per*1e3:.3f} ms/step ({N*H*W/per/1e9:.2f} Grays/s)")
