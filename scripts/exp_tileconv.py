"""2x2-output-tile pallas conv experiment (the update's thin-channel rock).

3x3/1 convs at C=32 run at ~52 TF/s (26% peak) in XLA because N=C_out=32
uses a quarter of the MXU's columns. Reformulation: produce a 2x2 tile of
outputs per matmul row — N = 4*C = 128 full columns, K = the union input
patch (4x4xC = 512 via a space-to-depth'd input, contiguous slices only).
Useful-FLOP fraction = 4*288*32/(512*128) = 56%, so the ceiling is
0.56*peak*util; at ~80% MXU util that's ~2x the XLA path.

Measures fwd numerics vs lax.conv + slope timing at the bench minibatch.

VERDICT (measured): DEAD END on current Mosaic. The 2x2-tile patch matmul
cannot be built as one K=16C dot (concatenating window slices with unequal
sublane offsets is rejected; pltpu.roll on the odd-sized sublane dim too),
and the fallback — four K=4C=128 dots on direct offset-window loads — runs
3.5x SLOWER than XLA's conv (7.76 vs 2.19 ms at layer1 shape): Mosaic
lowers offset-window loads + flattening reshapes into relayout copies that
swamp the MXU win. XLA's lax.conv (35-80 TF/s at these shapes) stands as
the conv path; the update's conv time is an XLA-emitter property, not
recoverable at the pallas level with this toolchain.
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


def weight_tile_matrix(w: np.ndarray) -> np.ndarray:
    """(3,3,C,O) -> (16C, 4O) block weight matrix W'.

    Patch layout: K index = (dy*2+dx)*C + c at s2d cell (a,b) -> flat
    k = ((a*2+b)*4 + dy*2+dx)*C + c for the 2x2 s2d cells (a,b in 0..1)?
    No — patch is the 2x2 block of s2d cells starting at (i, j):
    k = (a*2 + b)*4C + (dy*2+dx)*C + c, a,b in {0,1} cells, dy,dx parity.
    Output n = (al*2+be)*O + o for output position (2i+al, 2j+be).
    out(2i+al, 2j+be, o) = sum_{u,v,c} w[u,v,c,o] x_pad[2i+al+u, 2j+be+v, c]
    with x_pad having SAME pad 1 on each side folded in (so row index
    2i+al+u-1+1 = 2i+al+u in padded coords). Padded row r lives at s2d cell
    p = r//2 (relative cell a = p - i) parity dy = r%2."""
    k3, _, C, O = w.shape
    Wp = np.zeros((16 * C, 4 * O), w.dtype)
    for al in range(2):
        for be in range(2):
            for u in range(3):
                r = al + u  # padded row offset within the 4-row window
                a, dy = divmod(r, 2)
                for v in range(3):
                    s = be + v
                    b, dx = divmod(s, 2)
                    kbase = ((a * 2 + b) * 4 + (dy * 2 + dx)) * C
                    nbase = (al * 2 + be) * O
                    Wp[kbase : kbase + C, nbase : nbase + O] += w[u, v]
    return Wp


def s2d_pad(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/2+1,W/2+1,4C): SAME-pad 1 (lo) then pad hi to even,
    then space-to-depth by 2. Channel = (dy*2+dx)*C + c."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # H+2
    xp = jnp.pad(xp, ((0, 0), (0, (H + 2) % 2), (0, (W + 2) % 2), (0, 0)))
    Hp = xp.shape[1]
    xp = xp.reshape(B, Hp // 2, 2, Hp // 2, 2, C)
    xp = xp.transpose(0, 1, 3, 2, 4, 5)
    return xp.reshape(B, Hp // 2, Hp // 2, 4 * C)


def _tile_conv_kernel(x_ref, w_ref, o_ref, *, Ho2: int, C4: int):
    """x_ref (IB, S, S, 4C) s2d input; w_ref (16C, 4O); o_ref (IB, Ho2, Ho2, 4O).
    Patch rows: 2x2 s2d cells -> concat 4 shifted slices along channels."""
    IB = x_ref.shape[0]
    M = IB * Ho2 * Ho2
    # Mosaic rejects concatenating window slices (mismatched sublane-offset
    # layouts), so the K=16C patch matmul becomes FOUR K=4C dots accumulated
    # in f32 — each operand is a direct VMEM window load reshaped flat, and
    # each K=4C=128 exactly fills the MXU's contraction rows
    out = jnp.zeros((M, w_ref.shape[1]), jnp.float32)
    for a in range(2):
        for b in range(2):
            P = x_ref[:, a : a + Ho2, b : b + Ho2, :].reshape(M, C4)
            Wab = w_ref[pl.ds((a * 2 + b) * C4, C4), :]
            out = out + jax.lax.dot_general(
                P.astype(jnp.bfloat16),
                Wab.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[...] = out.reshape(IB, Ho2, Ho2, -1).astype(o_ref.dtype)


def conv3x3_tiled(x: jnp.ndarray, w_mat: jnp.ndarray, ib: int = 8) -> jnp.ndarray:
    """(B,H,W,C) x (16C,4O) -> (B,H,W,O) for 3x3/1 SAME conv."""
    B, H, W, C = x.shape
    O4 = w_mat.shape[1]
    O = O4 // 4
    xs = s2d_pad(x)  # (B, H/2+1, H/2+1, 4C)
    S = xs.shape[1]
    Ho2 = H // 2
    out = pl.pallas_call(
        functools.partial(_tile_conv_kernel, Ho2=Ho2, C4=4 * C),
        grid=(B // ib,),
        in_specs=[
            pl.BlockSpec((ib, S, S, 4 * C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * C, O4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ib, Ho2, Ho2, O4), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Ho2, Ho2, O4), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Ho2 * Ho2 * 16 * C * O4,
            bytes_accessed=B * S * S * 4 * C * 2 + B * Ho2 * Ho2 * O4 * 2,
            transcendentals=0,
        ),
    )(xs.astype(jnp.bfloat16), w_mat)
    # un-s2d the output: (B,Ho2,Ho2,(al*2+be)*O+o) -> (B,H,W,O)
    out = out.reshape(B, Ho2, Ho2, 2, 2, O)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, O)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    rng = np.random.default_rng(0)
    B, H, C, O = 4096, 32, 32, 32
    x = jnp.asarray(rng.normal(size=(B, H, H, C)), jnp.bfloat16)
    wn = (rng.normal(size=(3, 3, C, O)) * 0.1).astype(np.float32)
    w = jnp.asarray(wn, jnp.bfloat16)
    wm = jnp.asarray(weight_tile_matrix(wn), jnp.bfloat16)

    def conv_ref(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    # numerics on a small slice
    a = np.asarray(jax.jit(conv_ref)(x[:8]).astype(jnp.float32))
    b = np.asarray(jax.jit(lambda xx: conv3x3_tiled(xx, wm))(x[:8]).astype(jnp.float32))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"rel max err vs lax.conv: {err:.4g}", flush=True)

    def st_ref(x):
        return x + conv_ref(x) * jnp.bfloat16(1e-8)
    def st_tile(x):
        return x + conv3x3_tiled(x, wm) * jnp.bfloat16(1e-8)
    t_ref = chain_time(st_ref, x, k1=2, k2=10)
    t_til = chain_time(st_tile, x, k1=2, k2=10)
    gf = 2 * H * H * O * 9 * C * B / 1e9
    print(f"XLA   : {t_ref*1e3:6.2f} ms  {gf/t_ref/1e3:5.1f} TF/s-useful", flush=True)
    print(f"tiled : {t_til*1e3:6.2f} ms  {gf/t_til/1e3:5.1f} TF/s-useful", flush=True)

    # layer2 shape (16x16x64)
    B2, H2, C2, O2 = 4096, 16, 64, 64
    x2 = jnp.asarray(rng.normal(size=(B2, H2, H2, C2)), jnp.bfloat16)
    wn2 = (rng.normal(size=(3, 3, C2, O2)) * 0.1).astype(np.float32)
    w2 = jnp.asarray(wn2, jnp.bfloat16)
    wm2 = jnp.asarray(weight_tile_matrix(wn2), jnp.bfloat16)
    def ref2(x):
        return lax.conv_general_dilated(x, w2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
    a = np.asarray(jax.jit(ref2)(x2[:8]).astype(jnp.float32))
    b = np.asarray(jax.jit(lambda xx: conv3x3_tiled(xx, wm2, ib=16))(x2[:8]).astype(jnp.float32))
    print("layer2 rel err:", np.abs(a - b).max() / np.abs(a).max(), flush=True)
    t_ref2 = chain_time(lambda x: x + ref2(x) * jnp.bfloat16(1e-8), x2, k1=2, k2=10)
    t_til2 = chain_time(lambda x: x + conv3x3_tiled(x, wm2, ib=16) * jnp.bfloat16(1e-8), x2, k1=2, k2=10)
    gf2 = 2 * H2 * H2 * O2 * 9 * C2 * B2 / 1e9
    print(f"layer2 XLA  : {t_ref2*1e3:6.2f} ms {gf2/t_ref2/1e3:5.1f} TF/s", flush=True)
    print(f"layer2 tiled: {t_til2*1e3:6.2f} ms {gf2/t_til2/1e3:5.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
