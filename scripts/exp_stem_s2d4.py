"""Isolate the stem: plain 7x7/2 conv vs space-to-depth-4 packed form,
fwd + wgrad (no dgrad: first layer), B=4096 minibatch shape, bf16."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from _timing import chain_time
from habitat_tpu.models.resnet import StemConv
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
B = 4096
x = jnp.asarray(np.random.RandomState(0).randn(B, 128, 128, 4), jnp.bfloat16)

def run(name, apply_fn, w0):
    def loss(w):
        y = apply_fn(w)
        return jnp.sum(y.astype(jnp.float32) * 1e-6)
    g = jax.grad(loss)
    def step(w):
        return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, w, g(w))
    dt = chain_time(jax.jit(step), w0, k1=2, k2=8)
    print(f"{name}: {dt*1e3:.2f} ms fwd+wgrad  ({210e9*B/4096/dt/1e12:.1f} TF/s model-math)")

w = jnp.asarray(np.random.RandomState(1).randn(7, 7, 4, 32), jnp.float32) * 0.05
run("plain", lambda W: lax.conv_general_dilated(x, W.astype(jnp.bfloat16), (2, 2), [(2, 3), (2, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC")), w)

m = StemConv(32, dtype=jnp.bfloat16)
run("s2d4 ", lambda W: m.apply({"params": {"kernel": W}}, x), w)
