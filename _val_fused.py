import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.sims.scene import pack_scenes
from habitat_tpu.ops.raycast import render_batch

scenes, eps, fields = make_procedural_pointnav(num_scenes=4, episodes_per_scene=1, seed=0)
pack = pack_scenes(scenes)
N, H, W = 256, 128, 128
pos = jnp.concatenate([jax.random.uniform(jax.random.PRNGKey(0), (N,1), minval=2., maxval=6.),
                       jnp.full((N,1),1.25),
                       jax.random.uniform(jax.random.PRNGKey(1), (N,1), minval=2., maxval=6.)], -1)
yaw = jax.random.uniform(jax.random.PRNGKey(2), (N,), minval=-3.14, maxval=3.14)
pitch = jax.random.uniform(jax.random.PRNGKey(3), (N,), minval=-0.4, maxval=0.4)
sids = jnp.arange(N, dtype=jnp.int32) % 4

fast = jax.jit(lambda p,y,pt: render_batch(pack, sids, p, y, pt, height=H, width=W))
ref  = jax.jit(lambda p,y,pt: render_batch(pack, sids, p, y, pt, height=H, width=W, backend="xla"))
a = fast(pos, yaw, pitch); jax.block_until_ready(a["depth"])
b = ref(pos, yaw, pitch); jax.block_until_ready(b["depth"])
for k in ("depth","rgb","semantic"):
    x, y_ = np.asarray(a[k], np.float32), np.asarray(b[k], np.float32)
    match = (np.abs(x-y_) <= (2.0 if k=="rgb" else 1e-3)).mean()
    print(k, "fast-vs-xla match", f"{match:.6f}")

def bench(name, f, *args):
    t0=time.time(); iters=20
    for _ in range(iters): out=f(*args)
    jax.block_until_ready(out["depth"])
    dt=(time.time()-t0)/iters
    print(f"{name}: {dt*1e3:.2f} ms -> {N/dt:,.0f} env-fps", flush=True)
bench("render fast path", fast, pos, yaw, pitch)
