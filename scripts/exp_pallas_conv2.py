"""Pallas s2d-conv round 2: kill the epilogue relayout + align row shifts.

v1 (exp_pallas_conv) lost to XLA (3.43 vs 2.23 ms): the in-kernel
concatenate+reshape+slice epilogue is a full f32 relayout pass, and all four
operand shifts {0,1,17,18} are sublane-unaligned (bf16 tile = 16 rows).
Variants here:
  flat    — flat (rows, C4) in/out, no concat (junk rows written, sliced by
            the XLA consumer); shifts still unaligned.
  pad32   — row stride padded 17->32: row-tap offsets {0,32} aligned, only
            the two w-taps {1,33} pay a shift.
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
from scripts.exp_pallas_conv import (
    s2d_shift, d2s, pack_kernel, pack_kernel_map, conv_ref,
)

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")


def _fwd_flat(x_ref, w_ref, y_ref, *, stride, n_rows):
    xf = x_ref[0]  # (rows, C4)
    C4 = xf.shape[1]
    M = n_rows - stride - 1
    acc = None
    for a in range(2):
        for b in range(2):
            off = a * stride + b
            part = jax.lax.dot_general(
                xf[off : off + M], w_ref[2 * a + b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    y_ref[0, 0:M] = acc.astype(y_ref.dtype)
    y_ref[0, M:] = jnp.zeros((stride + 1, C4), y_ref.dtype)


def s2d_conv_flat(xs_flat, W4, S, bt=8):
    """xs_flat (B, S*S, C4) -> y_flat (B, S*S, C4) (junk rows at h/w = S-1)."""
    B, SS, C4 = xs_flat.shape
    xs_r = xs_flat.reshape(B // bt, bt * SS, C4)
    y = pl.pallas_call(
        functools.partial(_fwd_flat, stride=S, n_rows=bt * SS),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((1, bt * SS, C4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C4, C4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt * SS, C4), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B // bt, bt * SS, C4), xs_flat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * SS * 4 * C4 * C4,
            bytes_accessed=B * SS * C4 * 2 * 2,
            transcendentals=0,
        ),
    )(xs_r, W4)
    return y.reshape(B, SS, C4)


def main():
    rng = np.random.default_rng(0)
    C = 32
    C4 = 4 * C
    idx_map = pack_kernel_map(C)
    B = 4096
    S = 17

    x = jnp.asarray(rng.normal(size=(16, 32, 32, C)).astype(np.float32))
    K = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.1)
    Kp = pack_kernel(K, idx_map)
    W4 = Kp.reshape(4, C4, C4)
    xs = s2d_shift(x)

    # numerics: flat variant
    y_ref = jax.jit(conv_ref)(x, K)
    def run_flat(xs, W4):
        y = s2d_conv_flat(xs.reshape(16, S * S, C4), W4, S)
        return d2s(y.reshape(16, S, S, C4)[:, : S - 1, : S - 1])
    y_new = jax.jit(run_flat)(xs, W4)
    print("flat rel err:", float(jnp.abs(y_ref - y_new).max() / jnp.abs(y_ref).max()))

    # numerics: pad32 variant
    xs32 = jnp.pad(xs, ((0, 0), (0, 0), (0, 32 - S), (0, 0)))
    def run_p32(xs32, W4):
        y = s2d_conv_flat(xs32.reshape(16, S * 32, C4), W4, 32)
        y = y.reshape(16, S, 32, C4)[:, : S - 1, : S - 1]
        return d2s(y)
    y_p32 = jax.jit(run_p32)(xs32, W4)
    print("p32  rel err:", float(jnp.abs(y_ref - y_p32).max() / jnp.abs(y_ref).max()))

    # timing bf16
    Kpb = pack_kernel(K.astype(jnp.bfloat16), idx_map)
    W4b = Kpb.reshape(4, C4, C4)
    xb = jnp.asarray(rng.normal(size=(B, 32, 32, C)).astype(np.float32), jnp.bfloat16)
    xsb = jax.jit(s2d_shift)(xb)
    xs_flat = jnp.reshape(xsb, (B, S * S, C4))
    xs32b = jax.jit(lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, 32 - S), (0, 0))).reshape(B, S * 32, C4))(xsb)
    gf = 2 * B * 32 * 32 * 9 * C * C / 1e9

    def step_ref(x):
        return x + conv_ref(x, K.astype(jnp.bfloat16)) * jnp.bfloat16(1e-6)

    def step_flat(xf):
        y = s2d_conv_flat(xf, W4b, S, bt=8)
        return xf + y * jnp.bfloat16(1e-6)

    def step_p32(xf):
        y = s2d_conv_flat(xf, W4b, 32, bt=8)
        return xf + y * jnp.bfloat16(1e-6)

    for name, fn, arg in [
        ("ref ", step_ref, xb),
        ("flat", step_flat, xs_flat),
        ("p32 ", step_p32, xs32b),
    ]:
        per = chain_time(fn, arg, k1=2, k2=10)
        print(f"fwd {name}: {per*1e3:6.2f} ms  ref-equiv {gf/per/1e3:6.1f} TF/s")


if __name__ == "__main__":
    main()
