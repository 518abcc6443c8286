"""conv1 (7x7/2, 4->32ch) as a dual space-to-depth conv.

The stem conv is the single hottest op of the update (80.5 ms of ~630,
31 TF/s — exp_conv_layers2): N=32 output lanes leave 3/4 of the MXU
columns idle. Packing BOTH sides by 2x2 space-to-depth turns it into a
5x5/2 conv with 16 input and 128 output channels — full lanes, 2.04x
structural-zero FLOP inflation (a win iff MFU gains > 2.04x; layer2's
K>=128 convs measure 100-200 TF/s, so plausibly yes).

Derivation: flax SAME for k=7,s=2,H=128 pads (2,3); output fine row
o = 2a+pa covers padded fine rows 4a+2pa..4a+2pa+6. With the input padded
(2,4) and s2d'd (cell J = padded fine {2J,2J+1}), outputs {2a,2a+1} read
cells 2a..2a+4 -> kernel 5, stride 2, VALID; out channel' = (2pa_h+pa_w)*32
+ co; in channel' = (2p_h+p_w)*4 + c; tap (P,p) from v=2pa+dh via P=v//2,
p=v%2 (bijective in dh for fixed pa -> no collisions).
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

CIN, COUT = 4, 32


def s2d(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def d2s(y):
    B, Hc, Wc, C4 = y.shape
    C = C4 // 4
    y = y.reshape(B, Hc, Wc, 2, 2, C)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hc * 2, Wc * 2, C)


def pack_conv1_kernel(K):
    """(7,7,4,32) -> (5,5,16,128)."""
    Kp = np.zeros((5, 5, 4 * CIN, 4 * COUT), np.float32)
    K = np.asarray(K, np.float32)
    for pa_h in range(2):
        for pa_w in range(2):
            for dh in range(7):
                for dw in range(7):
                    vh, vw = 2 * pa_h + dh, 2 * pa_w + dw
                    Kp[
                        vh // 2,
                        vw // 2,
                        (2 * (vh % 2) + (vw % 2)) * CIN : (2 * (vh % 2) + (vw % 2) + 1) * CIN,
                        (2 * pa_h + pa_w) * COUT : (2 * pa_h + pa_w + 1) * COUT,
                    ] = K[dh, dw]
    return jnp.asarray(Kp)


def conv1_ref(x, K):
    return lax.conv_general_dilated(
        x, K, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16 if x.dtype == jnp.bfloat16 else None,
    )


def conv1_s2d(x, Kp):
    xp = jnp.pad(x, ((0, 0), (2, 4), (2, 4), (0, 0)))
    xs = s2d(xp)  # (B, 67, 67, 16)
    y = lax.conv_general_dilated(
        xs, Kp, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16 if x.dtype == jnp.bfloat16 else None,
    )  # (B, 32, 32, 128)
    return d2s(y)  # (B, 64, 64, 32)


def main():
    rng = np.random.default_rng(0)

    # numerics
    x = jnp.asarray(rng.normal(size=(8, 128, 128, 4)).astype(np.float32))
    K = jnp.asarray(rng.normal(size=(7, 7, CIN, COUT)).astype(np.float32) * 0.1)
    Kp = pack_conv1_kernel(K)
    y_ref = jax.jit(conv1_ref)(x, K)
    y_new = jax.jit(conv1_s2d)(x, Kp)
    print("rel err:", float(jnp.abs(y_ref - y_new).max() / jnp.abs(y_ref).max()))

    # timing at update scale
    B = 4096
    x = jnp.asarray(rng.normal(size=(B, 128, 128, 4)).astype(np.float32), jnp.bfloat16)
    Kb = K.astype(jnp.bfloat16)
    Kpb = Kp.astype(jnp.bfloat16)
    gf = 2 * B * 64 * 64 * 49 * CIN * COUT / 1e9

    def fb(conv, w):
        def step(x):
            def loss(x, w):
                return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)
            gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
            return x + gx * jnp.bfloat16(1e-12) + jnp.sum(gw).astype(x.dtype) * jnp.bfloat16(1e-12)
        return step

    for name, conv, w in [("ref", conv1_ref, Kb), ("s2d", conv1_s2d, Kpb)]:
        per = chain_time(fb(conv, w), x, k1=2, k2=8)
        print(f"conv1 f+b {name}: {per*1e3:7.2f} ms  ref-equiv {3*gf/per/1e3:.1f} TF/s")


if __name__ == "__main__":
    main()
