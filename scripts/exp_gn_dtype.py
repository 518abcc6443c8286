"""Does f32 GroupNorm between bf16 convs cost real time? Compare encoder
fwd+bwd at update scale (4096 frames) with GN computed in f32 vs bf16."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


class Block(nn.Module):
    planes: int
    stride: int = 1
    gn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    use_bias=False, dtype=jnp.bfloat16)(x)
        y = nn.GroupNorm(num_groups=16, dtype=self.gn_dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), use_bias=False, dtype=jnp.bfloat16)(y)
        y = nn.GroupNorm(num_groups=16, dtype=self.gn_dtype)(y)
        if x.shape[-1] != self.planes or self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=jnp.bfloat16)(x)
            x = nn.GroupNorm(num_groups=16, dtype=self.gn_dtype)(x)
        return nn.relu(x + y)


class Enc(nn.Module):
    gn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.bfloat16)
        x = nn.Conv(32, (7, 7), (2, 2), use_bias=False, dtype=jnp.bfloat16)(x)
        x = nn.GroupNorm(num_groups=16, dtype=self.gn_dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        for planes, stride in ((32, 1), (32, 1), (64, 2), (64, 1),
                               (128, 2), (128, 1), (256, 2), (256, 1)):
            x = Block(planes, stride, self.gn_dtype)(x)
        return x.astype(jnp.float32)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4096, 128, 128, 4), jnp.float32)
    res = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        enc = Enc(gn_dtype=dt)
        p = enc.init(key, x[:2])

        def loss(p_, x_):
            return jnp.sum(enc.apply(p_, x_) ** 2)

        f = jax.jit(lambda p_, x_: jnp.sum(enc.apply(p_, x_)))
        res[f"fwd_{name}_ms"] = round(timeit(f, p, x) * 1e3, 2)
        g = jax.jit(lambda p_, x_: jax.tree.map(jnp.sum, jax.grad(loss)(p_, x_)))
        res[f"fwdbwd_{name}_ms"] = round(timeit(g, p, x, iters=5) * 1e3, 2)
        out = jax.jit(enc.apply)(p, x[:64])
        res[f"out_finite_{name}"] = bool(jnp.isfinite(out).all())

    # FLOP check via XLA cost analysis (CPU lowering)
    try:
        enc = Enc()
        p = enc.init(key, x[:2])
        c = jax.jit(enc.apply).lower(p, x[:256]).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        res["flops_fwd_256"] = float(c.get("flops", -1))
    except Exception as e:  # noqa
        res["cost_err"] = str(e)[:80]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
