"""In-VMEM one-hot attribute-extraction kernel — MEASURED NEGATIVE (round 5).

Hypothesis: the small-scene render's XLA transposed one-hot dot
materializes oh (N, T, R) f32 through HBM (~2.1 GB/frame at the headline
shape) and re-reads it under Precision.HIGHEST, so building each (T, Rt)
one-hot in VMEM inside a Pallas kernel should save 4-5 ms/frame.

Measurement (N=256, R=16K, T=128, 4 procedural scenes, slope-timed 32x
renders, flagship paused): XLA form 221.8 ms / kernel form 236.4 ms —
the kernel is 7% SLOWER. A single-frame device trace shows why the
hypothesis was wrong: the raycast kernel itself is 4.8 of the 6.9 ms
frame (its VPU ray-tri hit-test floor), the attr extraction fusions only
~2 ms — XLA keeps the one-hot well-fused already, and the extra kernel
launch + idx reshape cost more than they save. Family closed; kernel kept
here with its bit-exactness test (tests/test_exactsel_kernel.py).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot_attrs_kernel_t(
    sids_ref,  # scalar-prefetch (N,)
    idx_ref,  # (1, 1, Rt) VMEM i32 — winner tri ids, -1 = miss
    tab_ref,  # (1, A16, T) VMEM — per-scene transposed attribute table
    out_ref,  # (1, A16, Rt) f32
    *,
    tri_cols: int,
):
    """One-hot attribute extraction with the one-hot built IN VMEM.

    The XLA form materializes oh (N, T, R) f32 through HBM and reads it
    back under Precision.HIGHEST — ~2.1 GB/frame at the headline shape
    (N=256, T=128, R=16K), measured 4-5 ms of the 6.7 ms small-scene
    render (scripts/exp_headline_breakdown.py, round 5). Here each
    (env, tile) program compares iota(T) against its idx row and feeds the
    (T, Rt) one-hot straight into the MXU from VMEM; the one-hot never
    exists in HBM. HIGHEST precision keeps the f32 copy exact (a one-hot
    dot SELECTS one f32 per output lane — exact iff the operand is not
    pre-truncated, which default bf16 passes would do). idx == -1 rows
    match no iota value, so misses come out all-zero — identical to the
    XLA form's `* hit` mask."""
    T = tab_ref.shape[2]
    Rt = idx_ref.shape[2]
    idx = idx_ref[0, 0]  # (Rt,) i32
    acc = None
    for c0 in range(0, T, tri_cols):
        iot = jax.lax.broadcasted_iota(
            jnp.int32, (tri_cols, Rt), 0
        ) + c0
        oh = (iot == idx[None, :]).astype(jnp.float32)  # (C, Rt)
        part = jax.lax.dot_general(
            tab_ref[0, :, c0 : c0 + tri_cols],
            oh,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (A16, Rt)
        acc = part if acc is None else acc + part
    out_ref[0] = acc


def onehot_attrs_t(
    table_t: jnp.ndarray,  # (S, A, T) f32 — transposed per-scene attr table
    sids: jnp.ndarray,  # (N,) int32
    idx: jnp.ndarray,  # (N, R) int32 winner tri ids (-1 miss)
    ray_tile: int = 2048,
    tri_cols: int = 128,
) -> jnp.ndarray:
    """(S,A,T),(N,),(N,R) -> (N,A,R) channel-major attrs; zeros on miss.

    Pallas replacement for the XLA transposed one-hot dot (see
    _onehot_attrs_kernel_t). A is padded to a multiple of 8 sublanes; T to
    a multiple of tri_cols lanes. Exact f32 selection."""
    S, A, T = table_t.shape
    N = sids.shape[0]
    R = idx.shape[1]
    apad = (-A) % 8
    tpad = (-T) % tri_cols
    if apad or tpad:
        table_t = jnp.pad(table_t, ((0, 0), (0, apad), (0, tpad)))
    A16, Tp = table_t.shape[1], table_t.shape[2]
    assert R % ray_tile == 0, (R, ray_tile)
    n_tiles = R // ray_tile
    # (N*nt, 1, Rt): a (1, 1, Rt) block must tile the trailing dims
    # exactly (Mosaic block-shape rule), so the tile dim is folded into
    # the leading index
    idx3 = idx.reshape(N * n_tiles, 1, ray_tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, ray_tile),
                lambda i, j, sids: (i * n_tiles + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, A16, Tp), lambda i, j, sids: (sids[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            # write tiles directly into the (N, A16, R) layout — no
            # post-kernel transpose
            pl.BlockSpec(
                (1, A16, ray_tile), lambda i, j, sids: (i, 0, j)
            ),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(_onehot_attrs_kernel_t, tri_cols=tri_cols),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, A16, R), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * Tp * A16,
            bytes_accessed=N * R * (4 + A16 * 4) + N * A16 * Tp * 4,
            transcendentals=0,
        ),
    )(sids.astype(jnp.int32), idx3, table_t)
    return out[:, :A]


