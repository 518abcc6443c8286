"""s2d conv expressed as shifted MATMULS instead of lax.conv.

exp_s2d_conv showed the space-to-depth 2x2 form only buys 1.21x through
XLA's conv emitter. But a 2x2 VALID conv is exactly 4 shifted (M,4C)@(4C,4C)
matmuls — and XLA's *matmul* emitter is a different (usually far better)
code path than its conv emitter at thin shapes. Tests fwd and fwd+bwd
(autodiff through the slices/dots) for layer1 (C=32 @32x32) and layer2
(C=64 @16x16) shapes at update scale B=4096, bf16.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from scripts.exp_s2d_conv import s2d_shift, d2s, pack_kernel, conv_ref
from scripts._timing import chain_time

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")


def conv_s2d_mm(xs, Kp):
    """(B, Hc+1, Wc+1, 4C) x (2,2,4C,4C) -> (B, Hc, Wc, 4C) via 4 dots."""
    B, H1, W1, C4 = xs.shape
    Hc, Wc = H1 - 1, W1 - 1
    out = None
    for a in range(2):
        for b in range(2):
            v = lax.slice(xs, (0, a, b, 0), (B, a + Hc, b + Wc, C4))
            y = jax.lax.dot_general(
                v.reshape(-1, C4), Kp[a, b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = y if out is None else out + y
    return out.astype(xs.dtype).reshape(B, Hc, Wc, C4)


def main():
    rng = np.random.default_rng(0)

    # numerics at small B
    B, H, W, C = 64, 32, 32, 32
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    K = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.1)
    Kp = pack_kernel(K)
    y_ref = jax.jit(conv_ref)(x, K)
    y_mm = jax.jit(lambda x, Kp: d2s(conv_s2d_mm(s2d_shift(x), Kp)))(x, Kp)
    print("rel err:", float(jnp.abs(y_ref - y_mm).max() / jnp.abs(y_ref).max()))

    B = 4096
    for name, H, W, C in [("layer1", 32, 32, 32), ("layer2", 16, 16, 64)]:
        x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32), jnp.bfloat16)
        K = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        Kp = pack_kernel(K.astype(jnp.float32)).astype(jnp.bfloat16)
        xs = jax.jit(s2d_shift)(x)
        gf_ref = 2 * B * H * W * 9 * C * C / 1e9
        gf_mm = gf_ref * 16 / 9

        def fb_ref(x, K=K):
            def loss(x, K):
                return jnp.sum(conv_ref(x, K).astype(jnp.float32) ** 2)
            gx, gk = jax.grad(loss, argnums=(0, 1))(x, K)
            return x + gx * jnp.bfloat16(1e-12) + jnp.sum(gk).astype(x.dtype) * jnp.bfloat16(1e-12)

        def fb_mm(xs, Kp=Kp):
            def loss(xs, Kp):
                return jnp.sum(conv_s2d_mm(xs, Kp).astype(jnp.float32) ** 2)
            gx, gk = jax.grad(loss, argnums=(0, 1))(xs, Kp)
            return xs + gx * jnp.bfloat16(1e-12) + jnp.sum(gk).astype(xs.dtype) * jnp.bfloat16(1e-12)

        for nm, fn, arg, gf in [
            (f"{name} f+b ref", fb_ref, x, 3 * gf_ref),
            (f"{name} f+b mm ", fb_mm, xs, 3 * gf_mm),
        ]:
            per = chain_time(fn, arg, k1=2, k2=8)
            print(f"{nm}: {per*1e3:7.2f} ms  {gf/per/1e3:6.1f} TF/s "
                  f"(ref-equiv {3*gf_ref/per/1e3:.1f})")


if __name__ == "__main__":
    main()
