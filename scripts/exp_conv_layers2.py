"""Trustworthy (chain_time) per-layer cost of the resnet18 update path.

exp_conv_layers.py used block_until_ready timing, which on this image's
tunneled TPU is unreliable for plain XLA ops. This one chains each layer's
fwd+bwd via a data dependency (scripts/_timing.chain_time) at minibatch
scale (B=4096 = 128 envs x 32 steps) in bf16, and multiplies by the number
of conv instances and minibatch passes (ppo_epoch=2 x num_mini_batch=2 = 4)
to report each stage's share of the measured ~242 ms conv + 43 ms pool +
GN budget of the train step.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from scripts._timing import chain_time

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

# (name, H, W, Cin, Cout, k, stride, count-per-net-pass)
SHAPES = [
    ("conv1 7x7/2", 128, 128, 4, 32, 7, 2, 1),
    ("layer1 3x3", 32, 32, 32, 32, 3, 1, 4),
    ("layer2a 3x3/2", 32, 32, 32, 64, 3, 2, 1),
    ("layer2 3x3", 16, 16, 64, 64, 3, 1, 3),
    ("layer2ds 1x1/2", 32, 32, 32, 64, 1, 2, 1),
    ("layer3a 3x3/2", 16, 16, 64, 128, 3, 2, 1),
    ("layer3 3x3", 8, 8, 128, 128, 3, 1, 3),
    ("layer3ds 1x1/2", 16, 16, 64, 128, 1, 2, 1),
    ("layer4a 3x3/2", 8, 8, 128, 256, 3, 2, 1),
    ("layer4 3x3", 4, 4, 256, 256, 3, 1, 3),
    ("layer4ds 1x1/2", 8, 8, 128, 256, 1, 2, 1),
]

PASSES = 4  # ppo_epoch x num_mini_batch minibatch sweeps per update


def main():
    B = 4096
    rng = np.random.default_rng(0)
    total = 0.0
    print(f"{'layer':16s} {'f+b ms':>8s} {'TF/s':>6s} {'upd ms':>8s} {'GB/s':>6s}")
    for name, H, W, Cin, Cout, k, s, count in SHAPES:
        x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, k, Cin, Cout)).astype(np.float32)
                        * 0.05, jnp.bfloat16)
        pad = "SAME" if k > 1 else "VALID"

        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (s, s), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )

        def step(x, w=w, conv=conv):
            def loss(x, w):
                return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)
            gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
            return x + gx * jnp.bfloat16(1e-12) + jnp.sum(gw).astype(x.dtype) * jnp.bfloat16(1e-12)

        per = chain_time(step, x, k1=2, k2=8)
        Ho, Wo = H // s, W // s
        gf = 2 * Ho * Wo * Cout * k * k * Cin / 1e9 * B  # fwd GFLOP for batch
        # bytes: fwd reads x writes y; dx reads dy writes dx; dw reads x,dy
        gb = (3 * H * W * Cin + 3 * Ho * Wo * Cout) * 2 * B / 1e9
        upd = per * count * PASSES * 1e3
        total += upd
        print(f"{name:16s} {per*1e3:8.2f} {3*gf/per/1e3:6.1f} {upd:8.1f} "
              f"{gb/per:6.0f}")

    print(f"\nconv total per update: {total:.0f} ms")

    # maxpool 3x3/2 after conv1 (64x64x32 -> 32x32x32) f+b
    x = jnp.asarray(rng.normal(size=(B, 64, 64, 32)).astype(np.float32), jnp.bfloat16)

    def pool_step(x):
        def loss(x):
            y = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                                  "SAME")
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return x + jax.grad(loss)(x) * jnp.bfloat16(1e-9)

    per = chain_time(pool_step, x, k1=2, k2=8)
    print(f"maxpool f+b: {per*1e3:.2f} ms -> {per*PASSES*1e3:.1f} ms/update")

    # GN bf16 vs f32 at the fat shape, f+b
    import flax.linen as nn
    for dt in (jnp.float32, jnp.bfloat16):
        gn = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=dt)
        x = jnp.asarray(rng.normal(size=(B, 32, 32, 32)).astype(np.float32), jnp.bfloat16)
        p = gn.init(jax.random.PRNGKey(0), x)

        def gn_step(x, p=p, gn=gn):
            def loss(x):
                return jnp.sum(gn.apply(p, x).astype(jnp.float32) ** 2)
            return x + jax.grad(loss)(x).astype(x.dtype) * jnp.bfloat16(1e-9)

        per = chain_time(gn_step, x, k1=2, k2=8)
        print(f"GN 32x32x32 {dt.__name__}: f+b {per*1e3:.2f} ms")


if __name__ == "__main__":
    main()
