"""Batch-in-lanes Pallas conv1 with in-VMEM im2col (VERDICT r3/r4 weak #1's
last named lever).

MEASURED NEGATIVE (round 4, v5e, scripts/exp_conv_stem_kernel.py):
fwd 47.96 ms vs XLA's 3.51 ms at B=2048 (13.7x SLOWER), numerics exact
(max err 1e-6 on a 4.3-scale output). The in-VMEM im2col assembly is the
wall: 196 taps x 2 output rows = 392 VMEM->VMEM copies per grid step, each
a (Wo, Btile) value whose source rows sit 4 axes from minor (2 KB stride)
— Mosaic emits sublane-strided loads far below VMEM bandwidth, the same
relayout wall that closed the round-2/3 packed-stem family. The floor
analysis that closes the WHOLE family: im2col traffic for Cin=4 is
~6.3 MB/step VMEM r+w (3.2 GB total at B=2048) + 630 MB HBM window
re-reads, so even a perfect-bandwidth assembly yields ~2.5-3 ms — XLA's
3.51 ms (31 TF/s) is already within ~1.3x of that floor. The MXU is not
idle because the emitter is bad; conv1 at Cin=4 is an assembly/bandwidth
problem, and there is no >1.3x to win on the forward. The degenerate XLA
wgrad (~7 TF/s) cannot be rescued by this kernel either: its im2col is
the same assembly. Kept (with exact-equivalence tests) as the recorded
close-out of the conv-stem lever; the model stays on XLA's conv.

The headline model's stem (7x7/s2, Cin=4 RGBD -> Cout=32) runs at 31 TF/s
under XLA's conv emitter (round-3 per-layer slopes): with Cin=4 the
contraction is 196 taps but XLA's emitter shapes leave the MXU mostly idle
and the weight-gradient degenerates (~7 TF/s). This kernel re-expresses the
stem as ONE well-shaped matmul per (batch-tile, output-row-pair):

    y[co, (oy2, ox, b)] = sum_k wT[co, k] * im2col[k, (oy2, ox, b)]

with BATCH IN LANES (b minor), contraction K = 7*7*4 = 196 taps (K >= 128:
the MXU is fed), M = Cout = 32 sublanes, N = 2*64*Btile lanes. The im2col
tensor never touches HBM: each grid step DMAs a 9-row input window and
assembles the 196 tap slabs VMEM->VMEM (every slice is static per tap —
the K order is (ky, ci, r, m) so stride-2 W taps fall on even/odd planes
of a (W/2, 2) reshape, no sublane-unaligned slicing — the failure mode of
the round-2 packed-stem Pallas attempts).

Caller contract: x is pre-transposed/padded to (H+5, Wp, C, B) bf16 with
SAME padding rows/cols baked in (lo=2, hi=3 for k=7,s=2) and Wp = W + 6
(134 for W=128). The kernel emits yT (Cout, Ho, Wo, B). The boundary
transposes are part of the honest benchmark: XLA's emitter works in the
network's native NHWC, so any win here must survive them.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KH = KW = 7
STRIDE = 2
PAD_LO, PAD_HI = 2, 3
OY_PER_STEP = 2


def _kernel(
    x_hbm,  # (Hp, Wp, C, B) bf16 in HBM/ANY — pre-padded input, B minor
    w_ref,  # (32, Kp) bf16 VMEM — taps in (ky, ci, r, m) order
    y_ref,  # (1, 32, OY_PER_STEP, Wo, Btile) f32 out block
    xwin,  # VMEM scratch (2, WIN, Wp, C, Btile) bf16 — DMA ring
    col,  # VMEM scratch (Kp, OY_PER_STEP * Wo * Btile?) — see reshape note
    sem,  # DMA semaphores (2,)
    *,
    wo: int,
    wp: int,
    cin: int,
    btile: int,
    kp: int,
    n_oy_steps: int,
):
    """Grid (B/btile, Ho/OY_PER_STEP). col's logical layout is
    (Kp, OY_PER_STEP, Wo, Btile) flattened over the last three dims."""
    b = pl.program_id(0)
    oy = pl.program_id(1)
    WIN = STRIDE * OY_PER_STEP + KH - STRIDE  # 9 input rows for 2 out rows

    def win_dma(slot, step):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * STRIDE * OY_PER_STEP, WIN), :, :, :,
                     pl.ds(b * btile, btile)],
            xwin.at[slot],
            sem.at[slot],
        )

    @pl.when(oy == 0)
    def _():
        win_dma(0, 0).start()

    slot = lax.rem(oy, 2)

    @pl.when(oy + 1 < n_oy_steps)
    def _():
        win_dma(lax.rem(oy + 1, 2), oy + 1).start()

    win_dma(slot, oy).wait()

    # assemble im2col: K order (ky, ci, r, m) — tap (ky, kx=2m+r, ci) reads
    # x[ky + 2*oyl, 2*ox + 2m + r, ci, :] = xwin[ky + 2*oyl, m + ox, r, ci]
    # (the caller pre-split W parity, so every slice below is a direct ref
    # slice — no whole-window value materialization)
    k = 0
    for ky in range(KH):
        for ci in range(cin):
            for r in range(2):
                for m in range(4):
                    if 2 * m + r >= KW:
                        continue
                    for oyl in range(OY_PER_STEP):
                        col[k, oyl] = xwin[slot, ky + STRIDE * oyl,
                                           m : m + wo, r, ci, :]
                    k += 1
    # zero the K padding rows: the weight columns there are zero, but
    # 0 * uninitialized-scratch is NaN-unsafe
    for kz in range(k, kp):
        col[kz] = jnp.zeros((OY_PER_STEP, wo, btile), jnp.bfloat16)

    y = jax.lax.dot_general(
        w_ref[:],
        col[:].reshape(kp, OY_PER_STEP * wo * btile),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (32, OY*Wo*Btile)
    y_ref[0] = y.reshape(32, OY_PER_STEP, wo, btile)


def _pack_weights(w: jnp.ndarray, cin: int, kp: int) -> jnp.ndarray:
    """(7,7,Cin,32) -> (32, Kp) bf16 in the kernel's (ky, ci, r, m) order;
    padding columns zero."""
    cols = []
    for ky in range(KH):
        for ci in range(cin):
            for r in range(2):
                for m in range(4):
                    if 2 * m + r >= KW:
                        continue
                    cols.append(w[ky, 2 * m + r, ci, :])  # (32,)
    wt = jnp.stack(cols, axis=0)  # (K, 32)
    K = wt.shape[0]
    wt = jnp.pad(wt, ((0, kp - K), (0, 0)))
    return wt.T.astype(jnp.bfloat16)  # (32, Kp)


def conv_stem_fwd_t(
    x_t: jnp.ndarray,  # (Hp, Wp/2, 2, Cin, B) bf16 parity-split pre-padded
    w: jnp.ndarray,  # (7, 7, Cin, 32)
    btile: int = 128,
) -> jnp.ndarray:
    """Batch-in-lanes stem conv forward: returns yT (32, Ho, Wo, B) f32."""
    hp, w2, _two, cin, B = x_t.shape
    wp = w2 * 2
    assert B % btile == 0
    ho = (hp - KH) // STRIDE + 1
    wo = (wp - 6) // 2  # wp = W + 6 (one extra pad col for W/2 evenness)
    assert ho % OY_PER_STEP == 0
    K = KH * KW * cin
    kp = -(-K // 16) * 16  # bf16 sublane tile
    wt = _pack_weights(w, cin, kp)
    n_oy = ho // OY_PER_STEP
    WIN = STRIDE * OY_PER_STEP + KH - STRIDE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B // btile, n_oy),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((32, kp), lambda b, oy: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 32, OY_PER_STEP, wo, btile),
            lambda b, oy: (b, 0, oy, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, w2, 2, cin, btile), jnp.bfloat16),
            pltpu.VMEM((kp, OY_PER_STEP, wo, btile), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y = pl.pallas_call(
        functools.partial(
            _kernel, wo=wo, wp=wp, cin=cin, btile=btile, kp=kp,
            n_oy_steps=n_oy,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B // btile, 32, ho, wo, btile), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * ho * wo * 32 * K,
            bytes_accessed=B * hp * wp * cin * 2 + B * ho * wo * 32 * 4,
            transcendentals=0,
        ),
    )(x_t, wt)
    # (B/btile, 32, Ho, Wo, btile) -> (32, Ho, Wo, B)
    return y.transpose(1, 2, 3, 0, 4).reshape(32, ho, wo, B)


def conv_stem_reference(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """XLA reference: NHWC 7x7/s2 SAME conv (flax padding lo=2, hi=3)."""
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        (STRIDE, STRIDE),
        padding=[(PAD_LO, PAD_HI), (PAD_LO, PAD_HI)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def pack_input(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> padded, transposed, W-PARITY-SPLIT
    (H+5, (W+6)/2, 2, C, B) bf16 — the boundary cost every honest benchmark
    of this kernel must include. The parity split means every stride-2 tap
    inside the kernel is a direct ref slice (no in-kernel value reshape,
    which materialized the whole window and blew the VMEM stack)."""
    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (PAD_LO, PAD_HI), (PAD_LO, PAD_HI + 1), (0, 0)),
    )  # W padded one extra so Wp is even for the (W/2, 2) split
    xt = xp.transpose(1, 2, 3, 0)  # (Hp, Wp, C, B)
    hp, wp, c, b = xt.shape
    return xt.reshape(hp, wp // 2, 2, c, b)


def _wgrad_kernel(
    x_hbm,  # (Hp, Wp, C, B) bf16 HBM — pre-padded input
    dy_ref,  # (1, 32, 1, OY_PER_STEP, Wo, Btile) bf16 — this step's dY
    dw_ref,  # (Kp, 32) f32 out — revisited by EVERY grid step (accumulator)
    xwin,  # VMEM scratch (WIN, Wp, C, Btile) bf16
    col,  # VMEM scratch (Kp, OY_PER_STEP, Wo, Btile) bf16
    sem,
    *,
    wo: int,
    wp: int,
    cin: int,
    btile: int,
    kp: int,
):
    """dW[k, co] = sum over (oy, ox, b) of im2col[k, .] * dY[co, .]: the
    contraction XLA's emitter degenerates on (~7 TF/s, round-2 trace)
    becomes one DEEP matmul (contraction = OY*Wo*Btile lanes) per grid
    step, accumulated into the revisited (Kp, 32) output block."""
    b = pl.program_id(0)
    oy = pl.program_id(1)
    WIN = STRIDE * OY_PER_STEP + KH - STRIDE

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(oy * STRIDE * OY_PER_STEP, WIN), :, :, :,
                 pl.ds(b * btile, btile)],
        xwin,
        sem,
    )
    dma.start()
    dma.wait()
    k = 0
    for ky in range(KH):
        for ci in range(cin):
            for r in range(2):
                for m in range(4):
                    if 2 * m + r >= KW:
                        continue
                    for oyl in range(OY_PER_STEP):
                        col[k, oyl] = xwin[ky + STRIDE * oyl,
                                           m : m + wo, r, ci, :]
                    k += 1
    for kz in range(k, kp):
        col[kz] = jnp.zeros((OY_PER_STEP, wo, btile), jnp.bfloat16)

    n_lanes = OY_PER_STEP * wo * btile
    dw = jax.lax.dot_general(
        col[...].reshape(kp, n_lanes),
        dy_ref[0, :, 0].reshape(32, n_lanes),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Kp, 32)

    @pl.when((b == 0) & (oy == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw)

    dw_ref[...] += dw


def conv_stem_wgrad_t(
    x_t: jnp.ndarray,  # (Hp, Wp/2, 2, C, B) bf16 parity-split pre-padded
    dy_t: jnp.ndarray,  # (32, Ho, Wo, B) — fwd's output layout
    btile: int = 128,
) -> jnp.ndarray:
    """Returns dW (7, 7, Cin, 32) f32."""
    hp, w2, _two, cin, B = x_t.shape
    wp = w2 * 2
    ho = (hp - KH) // STRIDE + 1
    wo = (wp - 6) // 2
    K = KH * KW * cin
    kp = -(-K // 16) * 16
    n_oy = ho // OY_PER_STEP
    WIN = STRIDE * OY_PER_STEP + KH - STRIDE
    dyb = (
        dy_t.reshape(32, n_oy, OY_PER_STEP, wo, B // btile, btile)
        .transpose(4, 0, 1, 2, 3, 5)
        .astype(jnp.bfloat16)
    )  # (B/btile, 32, n_oy, OY, Wo, btile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B // btile, n_oy),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, 32, 1, OY_PER_STEP, wo, btile),
                lambda b, oy: (b, 0, oy, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((kp, 32), lambda b, oy: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((WIN, w2, 2, cin, btile), jnp.bfloat16),
            pltpu.VMEM((kp, OY_PER_STEP, wo, btile), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dwp = pl.pallas_call(
        functools.partial(
            _wgrad_kernel, wo=wo, wp=wp, cin=cin, btile=btile, kp=kp
        ),
        grid_spec=grid_spec,
        # the (Kp, OY*Wo*Btile) im2col value + its reshape copy put the
        # kernel stack at ~107M; v5e VMEM is 128M — scope to 120M
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((kp, 32), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * ho * wo * 32 * K,
            bytes_accessed=B * hp * wp * cin * 2 + B * ho * wo * 32 * 2,
            transcendentals=0,
        ),
    )(x_t, dyb)
    # unpack the (ky, ci, r, m) K order back to (7, 7, Cin, 32)
    rows = []
    k = 0
    idx = np.zeros((KH, KW, cin), np.int32)
    for ky in range(KH):
        for ci in range(cin):
            for r in range(2):
                for m in range(4):
                    if 2 * m + r >= KW:
                        continue
                    idx[ky, 2 * m + r, ci] = k
                    k += 1
    return dwp[jnp.asarray(idx)]  # (7, 7, Cin, 32)


@jax.custom_vjp
def conv_stem(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Drop-in stem conv, NHWC boundary: (B,H,W,C) BF16 x (7,7,C,32) ->
    (B,Ho,Wo,32) f32. x must be bfloat16 (the model casts activations to
    bf16 before the stem anyway; dx comes back bf16). Forward + weight-gradient run the batch-in-lanes Pallas
    kernels (the two pieces XLA's emitter degenerates on: fwd 31 TF/s,
    wgrad ~7 TF/s at headline shape); the data-gradient stays on XLA's
    transposed conv, which it emits well. The NHWC<->B-minor boundary
    transposes are inside this op — any end-to-end win already paid them."""
    return _fwd_impl(x, w)


def _fwd_impl(x, w):
    yt = conv_stem_fwd_t(pack_input(x), w)
    return yt.transpose(3, 1, 2, 0)  # (B, Ho, Wo, 32)


def _fwd_rule(x, w):
    x_t = pack_input(x)
    yt = conv_stem_fwd_t(x_t, w)
    return yt.transpose(3, 1, 2, 0), (x_t, w)


def _bwd_rule(res, dy):
    x_t, w = res
    dy_t = dy.transpose(3, 1, 2, 0)  # (32, Ho, Wo, B)
    dw = conv_stem_wgrad_t(x_t, dy_t).astype(w.dtype)
    # data gradient: XLA transposed conv (the emitter handles this well)
    dx = lax.conv_general_dilated(
        dy.astype(jnp.bfloat16),
        jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).astype(jnp.bfloat16),
        window_strides=(1, 1),
        padding=[(KH - 1 - PAD_LO, KH - 1 - PAD_HI),
                 (KW - 1 - PAD_LO, KW - 1 - PAD_HI)],
        lhs_dilation=(STRIDE, STRIDE),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return dx.astype(jnp.bfloat16), dw


conv_stem.defvjp(_fwd_rule, _bwd_rule)
