"""Per-layer conv cost on the chip: where do the update's 400ms live?

Times each resnet18(base_planes=32) conv shape in isolation (XLA
lax.conv, NHWC bf16) at the update's effective batch (minibatch 128 envs x
32 steps = 4096 frames), fwd and fwd+bwd, plus GroupNorm at the early
shapes. Prints a table with achieved TFLOP/s per layer so the pallas-conv
effort can target the right stages.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


# (name, H, W, Cin, Cout, k, stride, count) — resnet18 base_planes=32 at
# 128x128 input, counts include both convs of both blocks per stage + the
# downsample 1x1s
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


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    B = 4096
    rng = np.random.default_rng(0)
    total_fwd = total_fb = total_flops = 0.0
    print(f"{'layer':16s} {'GF/fr':>6s} {'fwd ms':>8s} {'TF/s':>6s} "
          f"{'f+b ms':>8s} {'TF/s':>6s}")
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

        fwd = jax.jit(conv)

        def loss(w, x):
            return jnp.sum(conv(x, w).astype(jnp.float32))

        fb = jax.jit(lambda w, x: jax.grad(loss)(w, x))
        Ho, Wo = H // s, W // s
        gf = 2 * Ho * Wo * Cout * k * k * Cin / 1e9  # per frame fwd
        dt_f = timeit(fwd, x, w)
        dt_fb = timeit(fb, w, x)
        tf_f = gf * B / dt_f / 1e3
        tf_fb = 3 * gf * B / dt_fb / 1e3
        print(f"{name:16s} {gf:6.3f} {dt_f*1e3*count:8.2f} {tf_f:6.1f} "
              f"{dt_fb*1e3*count:8.2f} {tf_fb:6.1f}")
        total_fwd += dt_f * count
        total_fb += dt_fb * count
        total_flops += gf * B * count

    print(f"\nconv totals: fwd {total_fwd*1e3:.1f} ms  fwd+bwd "
          f"{total_fb*1e3:.1f} ms  ({total_flops:.0f} GF fwd)")

    # GroupNorm cost at the two fattest activation shapes
    import flax.linen as nn

    for name, H, W, C in [("GN 64x64x32", 64, 64, 32), ("GN 32x32x32", 32, 32, 32)]:
        gn = nn.GroupNorm(num_groups=16, epsilon=1e-5)
        x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32),
                        jnp.bfloat16)
        p = gn.init(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda p, x: gn.apply(p, x))
        def l(p, x):
            return jnp.sum(gn.apply(p, x).astype(jnp.float32))
        g = jax.jit(lambda p, x: jax.grad(l)(p, x))
        print(f"{name}: fwd {timeit(f, p, x)*1e3:.2f} ms  "
              f"fwd+bwd {timeit(g, p, x)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
