import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.sims.scene import pack_scenes
from habitat_tpu.ops.raycast import render_batch
from habitat_tpu.ops.raycast_pallas import raycast_pallas_batch
from habitat_tpu.utils.geometry import camera_rays

scenes, eps, fields = make_procedural_pointnav(num_scenes=4, episodes_per_scene=1, seed=0)
pack = pack_scenes(scenes)
N, H, W = 256, 128, 128
key = jax.random.PRNGKey(0)
pos = jnp.tile(jnp.array([[4.0, 1.25, 4.0]]), (N, 1))
yaw = jax.random.uniform(key, (N,), minval=-3.14, maxval=3.14)
pitch = jnp.zeros((N,))
sids = jnp.zeros((N,), jnp.int32)

def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time(); iters = 20
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time()-t0)/iters
    print(f"{name}: {dt*1e3:.2f} ms -> {N/dt:,.0f} env-fps", flush=True)
    return dt

bench("render full", lambda p,y,pt: render_batch(pack, sids, p, y, pt, height=H, width=W), pos, yaw, pitch)

def raygen(p, y, pt):
    dirs = jax.vmap(lambda yy, pp: camera_rays(yy, pp, jnp.deg2rad(90.0), H, W))(y, pt).reshape(N, -1, 3)
    origins = jnp.broadcast_to(p[:, None, :], dirs.shape)
    return origins, dirs
bench("raygen only", raygen, pos, yaw, pitch)

def rc(p, y, pt):
    o, d = raygen(p, y, pt)
    return raycast_pallas_batch(pack.tri_mat, pack.tri_attr, sids, o, d)
bench("raygen+kernel", rc, pos, yaw, pitch)

for rt in (1024, 4096, 8192, 16384):
    try:
        def rck(p, y, pt, rt=rt):
            o, d = raygen(p, y, pt)
            return raycast_pallas_batch(pack.tri_mat, pack.tri_attr, sids, o, d, ray_tile=rt)
        bench(f"raygen+kernel rt={rt}", rck, pos, yaw, pitch)
    except Exception as e:
        print(f"rt={rt} failed: {type(e).__name__} {str(e)[:150]}", flush=True)
