"""Maxpool 3x3/2 backward as a GATHER instead of select-and-scatter.

XLA lowers maxpool's VJP to select-and-scatter (~32 ms/update in the r2
trace). The earlier custom-VJP attempt emitted strided scatter-adds and lost
(36 vs 12 ms). This formulation has NO scatter: dilate dy and y to input
resolution (zeros between), then for each input pixel SUM over the <=9
covering windows where x equals that window's max:

    gx[p] = sum_{off} dy_up[p - off] * (x[p] == y_up[p - off])

which is 9 shifted elementwise multiply-compare-adds — one fused output
sweep, fully vectorized. Ties: XLA credits the FIRST max in scan order,
this credits EVERY position equal to the max. Gradients differ only on
exact float ties within a window (measure-zero for continuous activations).
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


def maxpool(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
    )


@jax.custom_vjp
def maxpool_g(x):
    return maxpool(x)


def _fwd(x):
    y = maxpool(x)
    return y, (x, y)


def _bwd(res, dy):
    x, y = res
    B, H, W, C = x.shape
    Ho, Wo = y.shape[1], y.shape[2]
    # XLA SAME (window 3, stride 2, even H) pads HIGH only: output o covers
    # inputs [2o, 2o+2]. Place (y, dy) at input position 2o, then input p is
    # covered by the windows at p-off for off in {0,1,2}.
    def dilate(a):
        z = jnp.zeros((B, Ho, 2, Wo, 2, C), a.dtype)
        z = z.at[:, :, 0, :, 0, :].set(a)
        return z.reshape(B, 2 * Ho, 2 * Wo, C)[:, :H, :W]

    # one padded tensor + 9 static slices (fuses into a single output sweep;
    # rolls+masks materialized 9 full copies and OOM'd at B=4096)
    yp = jnp.pad(dilate(y), ((0, 0), (2, 0), (2, 0), (0, 0)),
                 constant_values=-jnp.inf)
    dp = jnp.pad(dilate(dy), ((0, 0), (2, 0), (2, 0), (0, 0)))
    gx = jnp.zeros_like(x)
    zero = jnp.zeros((), dy.dtype)
    for dh in (0, 1, 2):
        for dw in (0, 1, 2):
            ys = lax.slice(yp, (0, 2 - dh, 2 - dw, 0), (B, 2 - dh + H, 2 - dw + W, C))
            ds = lax.slice(dp, (0, 2 - dh, 2 - dw, 0), (B, 2 - dh + H, 2 - dw + W, C))
            gx = gx + jnp.where(x == ys, ds, zero)
    return (gx,)


maxpool_g.defvjp(_fwd, _bwd)


def main():
    rng = np.random.default_rng(0)
    B = 4096
    x = jnp.asarray(rng.normal(size=(B, 64, 64, 32)).astype(np.float32), jnp.bfloat16)

    # numerics vs XLA select-and-scatter — use FRESH f32 data (bf16-rounded
    # values collide within windows, and on an exact tie this formulation
    # credits every max while XLA credits the first: expected diffs on ties)
    xs = jnp.asarray(rng.normal(size=(8, 64, 64, 32)).astype(np.float32))
    g_ref = jax.jit(jax.grad(lambda x: jnp.sum(maxpool(x) ** 2)))(xs)
    g_new = jax.jit(jax.grad(lambda x: jnp.sum(maxpool_g(x) ** 2)))(xs)
    print("max abs diff:", float(jnp.abs(g_ref - g_new).max()))

    def step_ref(x):
        def loss(x):
            return jnp.sum(maxpool(x).astype(jnp.float32) ** 2)
        return x + jax.grad(loss)(x) * jnp.bfloat16(1e-9)

    def step_new(x):
        def loss(x):
            return jnp.sum(maxpool_g(x).astype(jnp.float32) ** 2)
        return x + jax.grad(loss)(x) * jnp.bfloat16(1e-9)

    for name, fn in [("s&s ref", step_ref), ("gather  ", step_new)]:
        per = chain_time(fn, x, k1=2, k2=8)
        print(f"{name}: f+b {per*1e3:.2f} ms")


if __name__ == "__main__":
    main()
