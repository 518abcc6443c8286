"""Packed-stem experiment (VERDICT r2 #1, the conv1 floor).

The stem conv (7x7/s2, Cin=4) runs at ~31 TF/s because XLA's TPU emitter
degenerates on Cin=4 (80.5 ms/update of the 580 ms headline). StemConv
re-expresses it exactly as a 3x3 conv on a space-to-depth-4 packing
(Cin=64, Cout=128) that the emitter runs fast — but the round-2 XLA
pack/unpack transposes cost more than the win. This experiment measures
the missing pieces for a PIPELINE-level fix:

  (a) the one-time obs PACK at render time (8192 frames/update, fwd-only,
      no bwd: obs are leaves) — XLA reshape+transpose cost at rollout shape
  (b) packed 3x3 conv fwd+bwd vs the current conv1 fwd+bwd
  (c) PACKED maxpool (max over 9 lane-sliced shifted views of the packed
      conv output, producing the pooled (B,32,32,f) directly — no
      depth-to-space round trip) vs nn.max_pool on the unpacked output

If (a) ~ bandwidth and (b)+(c) beat conv1+pool, the training pipeline
stores rollout obs PACKED and the encoder consumes them directly.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def slope(fn, args, iters=8):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / iters * 1e3


def pack_s2d4(x):
    """(B,H,W,C) -> (B,H/4,W/4,16C); feature = (py*4+px)*C + ci."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 4, 4, W // 4, 4, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, W // 4, 16 * C)


def packed_pool(y, f):
    """3x3/s2 maxpool of the depth-to-space of packed y, computed directly.

    y: (B, Hp, Wp, 4f) packed as (qy*2+qx)*f + co over the virtual
    (2Hp, 2Wp, f) map. Virtual row 2a+q -> (a, q). Pool output (i, j) =
    max over virtual rows {2i-1, 2i, 2i+1} x cols {2j-1, 2j, 2j+1}:
    rows (i-1,q1),(i,q0),(i,q1); same for cols — 9 shifted lane-sliced
    views, all 128-aligned when f is a multiple of 32."""
    B, Hp, Wp, F4 = y.shape
    q00 = y[..., 0 * f : 1 * f]  # (qy=0, qx=0)
    q01 = y[..., 1 * f : 2 * f]
    q10 = y[..., 2 * f : 3 * f]
    q11 = y[..., 3 * f : 4 * f]
    neg = jnp.finfo(y.dtype).min

    def sh(t, dr, dc):
        # shift rows/cols by (dr, dc) in PACKED cells with -inf padding
        return jnp.pad(
            t,
            ((0, 0), (max(dr, 0), max(-dr, 0)), (max(dc, 0), max(-dc, 0)), (0, 0)),
            constant_values=neg,
        )[:, max(-dr, 0) : Hp + max(-dr, 0), max(-dc, 0) : Wp + max(-dc, 0), :]

    # virtual rows for output i: (i-1, q=1), (i, q=0), (i, q=1)
    # virtual cols for output j: (j-1, q=1), (j, q=0), (j, q=1)
    rows = {  # tag -> (cell row shift, which qy)
        "rm": (1, 1),  # row i-1, qy=1  (shift down by 1 cell)
        "r0": (0, 0),
        "rp": (0, 1),
    }
    cols = {
        "cm": (1, 1),
        "c0": (0, 0),
        "cp": (0, 1),
    }
    qsel = {(0, 0): q00, (0, 1): q01, (1, 0): q10, (1, 1): q11}
    out = None
    for (dr, qy) in rows.values():
        for (dc, qx) in cols.values():
            v = sh(qsel[(qy, qx)], dr, dc)
            out = v if out is None else jnp.maximum(out, v)
    return out


def main():
    B = 4096  # half the 8192 fwd frames; scale results x2
    H = W = 128
    Cin = 4
    f = 32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, Cin), jnp.bfloat16)
    res = {}

    # (a) pack cost, fwd only
    jp = jax.jit(pack_s2d4)
    res["pack_ms"] = slope(jp, (x,))
    xp = jp(x)

    # reference conv1 (+pool) fwd+bwd
    w7 = jax.random.normal(key, (7, 7, Cin, f), jnp.float32)

    def conv1(w, x):
        y = jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (2, 2), [(2, 3), (2, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        return jnp.sum(y.astype(jnp.float32))

    g1 = jax.jit(jax.grad(conv1, argnums=0))
    res["conv1_pool_fwdbwd_ms"] = slope(g1, (w7, x))

    # packed conv (+packed pool) fwd+bwd — same arithmetic as conv1
    from habitat_tpu.models.resnet import StemConv

    plan_k, plan_v = StemConv._pack_plan()

    def packed(w, xp):
        wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        iy = plan_k.reshape(3, 4, 2, 1, 1, 1)
        ix = plan_k.reshape(1, 1, 1, 3, 4, 2)
        mask = plan_v.reshape(3, 4, 2, 1, 1, 1) & plan_v.reshape(1, 1, 1, 3, 4, 2)
        ws = wp[iy, ix] * mask[..., None, None]
        ws = ws.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(3, 3, 16 * Cin, 4 * f)
        y = jax.lax.conv_general_dilated(
            xp, ws.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B,32,32,4f) packed; qy*2+qx blocks of f... note StemConv uses
        # (qy*2+qx)*f + co ordering == packed_pool expectation
        y = packed_pool(y, f)
        return jnp.sum(y.astype(jnp.float32))

    g2 = jax.jit(jax.grad(packed, argnums=0))
    res["packed_conv_pool_fwdbwd_ms"] = slope(g2, (w7, xp))

    # equivalence check (fwd values)
    def conv1_fwd(w, x):
        y = jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (2, 2), [(2, 3), (2, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

    def packed_fwd(w, xp):
        wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        iy = plan_k.reshape(3, 4, 2, 1, 1, 1)
        ix = plan_k.reshape(1, 1, 1, 3, 4, 2)
        mask = plan_v.reshape(3, 4, 2, 1, 1, 1) & plan_v.reshape(1, 1, 1, 3, 4, 2)
        ws = wp[iy, ix] * mask[..., None, None]
        ws = ws.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(3, 3, 16 * Cin, 4 * f)
        y = jax.lax.conv_general_dilated(
            xp, ws.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return packed_pool(y, f)

    a = jax.jit(conv1_fwd)(w7, x[:64])
    b = jax.jit(packed_fwd)(w7, jp(x[:64]))
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    res["equiv_max_err"] = err

    import json
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v) for k, v in res.items()}))


if __name__ == "__main__":
    main()
