"""Isolated fwd+bwd cost of maxpool variants at the bench minibatch shape
(4096, 64, 64, 32) bf16: XLA select-and-scatter vs Pallas kernel vs gather."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts._timing import chain_time

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

import habitat_tpu.ops.pool as pool

x0 = jax.random.normal(jax.random.PRNGKey(0), (4096, 64, 64, 32), jnp.float32)
x0 = x0.astype(jnp.bfloat16)


def make_step(fn):
    def step(x):
        y, vjp = jax.vjp(fn, x)
        (gx,) = vjp(y)
        return gx

    return step


variants = {
    "xla_sas": pool._xla_maxpool,
    "pallas": lambda v: pool.max_pool_3x3s2(v, False),
}

for name, fn in variants.items():
    dt = chain_time(make_step(fn), x0, k1=4, k2=16)
    print(f"{name}: {dt*1e3:.2f} ms fwd+bwd")

# gather fallback: force _supported False
pool_supported = pool._supported
pool._supported = lambda v: False
dt = chain_time(make_step(lambda v: pool.max_pool_3x3s2(v, False)), x0, k1=4, k2=16)
print(f"gather: {dt*1e3:.2f} ms fwd+bwd")
pool._supported = pool_supported
