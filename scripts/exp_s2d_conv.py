"""Space-to-depth reformulation of thin-channel 3x3 convs.

The resnet18 update profile is conv-bound (bwd 177 + fwd 65 ms of a 633 ms
train step) and the early layers are thin: layer1 runs 3x3 convs with
C=32 at 32x32 spatial, so the MXU sees 32 of 128 output lanes (25% column
utilization). Classic fix: a stride-1 3x3 conv on (H, W, C) is EXACTLY a
2x2 conv on the 2x2 space-to-depth tensor (H/2, W/2, 4C) with a sparse
(2,2,4C,4C) kernel built from the (3,3,C,C) kernel — each output parity
(a,b) reads a 3x3 fine window that fits in a 2x2 coarse window. 4C=128
fills the lanes; the structural zeros inflate FLOPs by 16/9. Net win iff
MFU gain > 1.78x.

This script checks numerics and times fwd and fwd+bwd of both forms at
update scale (B=4096, 32x32x32 — the layer1 shape).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from scripts._timing import chain_time

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")


def s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel c' = (2a+b)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def s2d_shift(x):
    """Pad by 1 on every side, then s2d: (B,H,W,C) -> (B,H/2+1,W/2+1,4C).
    Cell I holds fine rows {2I-1, 2I} of the original tensor, so the 3x3
    window of EVERY output parity lies in coarse cells {I, I+1} and the
    packed conv is a VALID 2x2."""
    B, H, W, C = x.shape
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s2d(x)


def d2s(y):
    B, Hc, Wc, C4 = y.shape
    C = C4 // 4
    y = y.reshape(B, Hc, Wc, 2, 2, C)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hc * 2, Wc * 2, C)


def pack_kernel(K):
    """(3,3,Cin,Cout) -> (2,2,4Cin,4Cout) sparse kernel for the s2d form.

    y[2H+a, 2W+b] = sum_{dh,dw} x[2H+a+dh-1, 2W+b+dw-1] K[dh,dw]
    In the shifted-s2d input, fine row 2H+f (f = a+dh-1 in {-1..2}) lives in
    coarse cell H + (f+1)//2 with parity (f+1)%2 — i.e. tap u = a+dh in
    {0..3} -> coarse tap u//2 in {0,1}, parity u%2. A VALID 2x2 conv.
    """
    C_in, C_out = K.shape[2], K.shape[3]
    Kp = jnp.zeros((2, 2, 4 * C_in, 4 * C_out), K.dtype)
    for a in range(2):
        for b in range(2):
            for dh in range(3):
                for dw in range(3):
                    u, v = a + dh, b + dw
                    Ph, ph = u // 2, u % 2
                    Pw, pw = v // 2, v % 2
                    Kp = Kp.at[
                        Ph,
                        Pw,
                        (2 * ph + pw) * C_in : (2 * ph + pw + 1) * C_in,
                        (2 * a + b) * C_out : (2 * a + b + 1) * C_out,
                    ].set(K[dh, dw])
    return Kp


def conv_ref(x, K):
    return lax.conv_general_dilated(
        x, K, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=None,
    )


def conv_s2d(xs, Kp):
    # shifted-s2d input: VALID 2x2
    return lax.conv_general_dilated(
        xs, Kp, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=None,
    )


def main():
    rng = np.random.default_rng(0)
    B, H, W, C = 512, 32, 32, 32
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    K = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.1)

    # numerics
    y_ref = jax.jit(conv_ref)(x, K)
    Kp = pack_kernel(K)
    y_s2d = jax.jit(lambda x, Kp: d2s(conv_s2d(s2d_shift(x), Kp)))(x, Kp)
    err = jnp.abs(y_ref - y_s2d).max() / jnp.abs(y_ref).max()
    print("rel err:", float(err))

    # timing at update scale, bf16 like the real model
    B = 4096
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    Kb = K.astype(jnp.bfloat16)
    Kpb = Kp.astype(jnp.bfloat16)
    xs = jax.jit(s2d_shift)(x)

    gflop_ref = 2 * B * H * W * 9 * C * C / 1e9
    gflop_s2d = 2 * B * (H // 2) * (W // 2) * 4 * (4 * C) * (4 * C) / 1e9

    def fwd_ref(x):
        y = conv_ref(x, Kb)
        return (y * 1e-6).astype(jnp.bfloat16)

    def fwd_s2d(xs):
        y = conv_s2d(xs, Kpb)
        # VALID 2x2 shrinks (Hc+1 -> Hc); pad back so the chain carry matches
        y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return xs + (y * 1e-6).astype(jnp.bfloat16)

    def fb_ref(x):
        def loss(x, K):
            return jnp.sum(conv_ref(x, K).astype(jnp.float32) ** 2)
        gx, gk = jax.grad(loss, argnums=(0, 1))(x, Kb)
        return x + gx * 1e-12 + jnp.sum(gk).astype(x.dtype) * 1e-12

    def fb_s2d(xs):
        def loss(xs, Kp):
            return jnp.sum(conv_s2d(xs, Kp).astype(jnp.float32) ** 2)
        gx, gk = jax.grad(loss, argnums=(0, 1))(xs, Kpb)
        return xs + gx * 1e-12 + jnp.sum(gk).astype(xs.dtype) * 1e-12

    for name, fn, arg, gf in [
        ("fwd  ref", fwd_ref, x, gflop_ref),
        ("fwd  s2d", fwd_s2d, xs, gflop_s2d),
        ("f+b  ref", fb_ref, x, 3 * gflop_ref),
        ("f+b  s2d", fb_s2d, xs, 3 * gflop_s2d),
    ]:
        per = chain_time(fn, arg, k1=2, k2=8)
        print(f"{name}: {per*1e3:7.2f} ms  {gf/per/1e3:7.1f} TF/s  "
              f"(ref-equiv {3*gflop_ref/per/1e3 if 'b' in name.split()[0] else gflop_ref/per/1e3:.1f} TF/s)")


if __name__ == "__main__":
    main()
