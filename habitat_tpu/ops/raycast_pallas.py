"""Fused Pallas TPU raycast kernels.

The XLA path (ops/raycast.py raycast_mxu_batch) round-trips the determinant
tensor G = F @ M through HBM; these kernels keep it in VMEM. Round-2 finding
(PROGRESS.md): at bench shapes the kernel is bound by VMEM BANDWIDTH on the
(ray_tile × 4·tri_chunk) intermediates, not MXU flops and not the VPU op
count — restructuring the epilogue or changing matmul input dtype alone
changed nothing (15.0 vs 15.8 vs 15.9 ms), while a G-only kernel ran 8.5 ms.
Consequently the v3 design minimizes bytes-through-VMEM:

- The winner is reduced per chunk as (t, lane) and folded across chunks as
  per-ray scalars; only (t f32, tri index i32) leave the core — 8 bytes/ray
  instead of 36 (t + 8 attribute channels). G itself must stay f32 (Mosaic
  requires a 32-bit matmul accumulator and rejects bf16 broadcast-compare
  relayouts); its write+read is the kernel's floor.
- Attribute shading moved OUT of the kernel: callers gather
  tri_attr[sid, idx] in XLA (a 4.2M-row HBM gather ≈ 0.3 ms), which also
  removes the per-chunk one-hot extraction matmul and its VMEM sweeps.

Grid: (N envs, R/ray_tile); the scene coefficient matrix is a block indexed
by the scalar-prefetched per-env scene id, so consecutive ray tiles of one
env reuse it without re-DMA. The culled variant's grid is (N, tiles, K) with
candidate chunk ids scalar-prefetched (occlusion-aware per-ray-tile culling,
see ops/raycast.select_chunks_occluded).
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

_EPS = 1e-7
_TMIN = 1e-3
_TMAX = 1e6

ATTR_CH = 8  # [nx, ny, nz, r, g, b, sem, valid] — gathered in XLA, not here


def _chunk_winner(F, M, C):
    """One tri-chunk: determinants -> (tmin (Rt,) f32, lane (Rt,) i32).

    Möller–Trumbore with the sign-free trick (multiply the barycentric
    inequalities through by detA); the hit test collapses to two min-chains
    that fuse into the G-consuming sweep. Mosaic demands a 32-bit matmul
    accumulator (bf16 G rejected) and its relayout pass rejects bf16
    broadcast-compares, so G and t stay f32; G's VMEM write+read is this
    kernel's floor (measured 8.5ms of 15 at the bench shape)."""
    G = jax.lax.dot_general(
        F,
        M.reshape(10, 4 * C),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Rt, 4C)
    detA = G[:, 0 * C : 1 * C]
    tnum = G[:, 1 * C : 2 * C]
    unum = G[:, 2 * C : 3 * C]
    vnum = G[:, 3 * C : 4 * C]
    aa = detA * detA
    p = unum * detA
    q = vnum * detA
    w = tnum * detA
    m1 = jnp.minimum(jnp.minimum(p, q), aa - p - q)  # barycentric (>= 0 ok)
    m2 = jnp.minimum(w - _TMIN * aa, aa - _EPS * _EPS)
    hit = (m1 >= 0.0) & (m2 > 0.0)
    t = jnp.where(hit, tnum / jnp.where(hit, detA, 1.0), _TMAX)
    tmin = jnp.min(t, axis=1)  # (Rt,)
    win = jnp.argmin(t, axis=1).astype(jnp.int32)  # ties -> lowest lane
    return tmin, win


def _kernel(
    sids_ref,  # scalar-prefetch (N,)
    f_ref,  # (1, 1, ray_tile, 10) VMEM — ray features of this tile
    m_ref,  # (1, 10, 4, T) VMEM — this env's scene matrix
    t_out,  # (1, 1, 8, ray_tile//8) f32
    i_out,  # (1, 1, 8, ray_tile//8) i32 — global tri index, -1 = miss
    *,
    tri_chunk: int,
):
    F = f_ref[0, 0]  # (Rt, 10)
    T = m_ref.shape[3]
    C = tri_chunk
    Rt = F.shape[0]

    def body(c, carry):
        best_t, best_i = carry  # (Rt,) f32 / i32
        tmin, win = _chunk_winner(F, m_ref[0, :, :, pl.ds(c * C, C)], C)
        better = tmin < best_t
        return (
            jnp.where(better, tmin, best_t),
            jnp.where(better, c * C + win, best_i),
        )

    init = (
        jnp.full((Rt,), _TMAX, jnp.float32),
        jnp.full((Rt,), -1, jnp.int32),
    )
    best_t, best_i = lax.fori_loop(0, T // C, body, init)
    miss = best_t >= _TMAX * 0.5
    shp = (t_out.shape[2], t_out.shape[3])
    t_out[0, 0] = jnp.where(miss, _TMAX, best_t).reshape(shp)
    i_out[0, 0] = jnp.where(miss, -1, best_i).reshape(shp)


def raycast_pallas_index(
    tri_mat: jnp.ndarray,  # (S, 10, 4, T) scene coefficient matrices
    sids: jnp.ndarray,  # (N,) int32
    features: jnp.ndarray,  # (N, R, 10) ray features
    ray_tile: int = 2048,
    tri_chunk: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest-hit core: returns (t (N,R) f32, idx (N,R) i32, -1 on miss).
    Shade/gather attributes in XLA (tri_attr[sid, idx])."""
    N, R, _ = features.shape
    S, _, _, T = tri_mat.shape
    tri_chunk = min(tri_chunk, T)
    assert T % tri_chunk == 0, (T, tri_chunk)
    ray_tile = min(ray_tile, R)
    assert R % ray_tile == 0, (R, ray_tile)
    n_tiles = R // ray_tile
    F = features.reshape(N, n_tiles, ray_tile, 10)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, ray_tile, 10),
                lambda i, j, sids: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 10, 4, T),
                lambda i, j, sids: (sids[i], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, ray_tile // 8), lambda i, j, sids: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 8, ray_tile // 8), lambda i, j, sids: (i, j, 0, 0)),
        ],
    )
    t, idx = pl.pallas_call(
        functools.partial(_kernel, tri_chunk=tri_chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n_tiles, 8, ray_tile // 8), jnp.float32),
            jax.ShapeDtypeStruct((N, n_tiles, 8, ray_tile // 8), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * T * 10 * 4,
            bytes_accessed=N * R * (40 + 8) + N * R * T * 10,
            transcendentals=0,
        ),
    )(sids.astype(jnp.int32), F, tri_mat)
    return t.reshape(N, R), idx.reshape(N, R)


def _gather_attrs(tri_attr, sids, idx):
    """(S,T,8),(N,),(N,R) -> (N,R,8); zeros (valid=0) on miss.

    XLA:TPU scalarizes row gathers (measured 29ms for 4.2M rows vs 9.2ms for
    the whole raycast kernel), so for small tables the lookup is a one-hot
    MATMUL instead. The dot runs TRANSPOSED — (N,8,T)@(N,T,R) with rays in
    lanes — which the emitter handles 12x faster than the row-major
    (N,R,T)@(N,T,8) form (0.27 vs 3.26 ms at bench shape); one (N,8,R) ->
    (N,R,8) relayout converts back. Beyond the table-size threshold the
    one-hot flops blow up and the true gather wins."""
    T = tri_attr.shape[1]
    safe = jnp.maximum(idx, 0)
    if T <= 4096:
        table_t = tri_attr[sids].transpose(0, 2, 1)  # (N,8,T)
        oh = (
            jnp.arange(T, dtype=idx.dtype)[None, :, None] == safe[:, None, :]
        ).astype(jnp.float32)  # (N,T,R)
        attrs = jax.lax.dot_general(
            table_t,
            oh,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).transpose(0, 2, 1)  # (N,R,8)
    else:
        attrs = tri_attr[sids[:, None], safe]
    return attrs * (idx >= 0).astype(jnp.float32)[..., None]


def raycast_pallas_batch(
    tri_mat: jnp.ndarray,  # (S, 10, 4, T)
    tri_attr: jnp.ndarray,  # (S, T, 8) attribute tables
    sids: jnp.ndarray,  # (N,) int32
    origins: jnp.ndarray = None,  # (N, R, 3)
    dirs: jnp.ndarray = None,  # (N, R, 3)
    ray_tile: int = 2048,
    tri_chunk: int = 128,
    features: jnp.ndarray = None,  # optional precomputed (N, R, 10)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest-hit + attributes for all envs (compat wrapper over the index
    kernel + XLA gather). Returns (t (N,R) f32, attrs (N,R,8) f32);
    attrs[...,7] == 0 marks a miss."""
    from habitat_tpu.ops.raycast import ray_features

    if features is None:
        features = ray_features(origins, dirs)
    t, idx = raycast_pallas_index(
        tri_mat, sids, features, ray_tile=ray_tile, tri_chunk=tri_chunk
    )
    return t, _gather_attrs(tri_attr, sids, idx)


def _kernel_t(
    sids_ref,  # scalar-prefetch (N,)
    f_ref,  # (1, 1, 16, ray_tile) VMEM — TRANSPOSED ray features (10 used)
    m_ref,  # (1, 10, 4, T) VMEM — this env's scene matrix
    t_out,  # (1, 1, 1, ray_tile) f32
    i_out,  # (1, 1, 1, ray_tile) i32
    *,
    tri_chunk: int,
):
    """v5: feature-transposed kernel. The v3 layout (ray features with minor
    dim 10) forced XLA to pad the lane dimension 10->128 — a 2.1 GB relayout
    copy (114 ms/update, copy.1995 in the r2 trace) just to feed the kernel.
    With rays minor, the features block is lane-exact; G comes out (4C, Rt)
    so the epilogue sweeps lanes and min/argmin reduce over sublanes.
    Measured alternatives at bench shape (scripts/_timing slope): this form
    5.9 ms; contracting dim 0 of BOTH operands to get a (Rt, 4C) G forces a
    Mosaic transpose of F and runs 17 ms; the v3 row-major-features kernel
    runs 4.0 ms but costs a 114 ms/update lane-padding relayout copy
    upstream."""
    F = f_ref[0, 0, 0:10, :]  # (10, Rt)
    T = m_ref.shape[3]
    C = tri_chunk
    Rt = F.shape[1]

    def chunk_winner(M):
        # (C', Rt) determinant rows: contract the 10-dim of both operands
        G = jax.lax.dot_general(
            M.reshape(10, 4 * C),
            F,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4C, Rt)
        detA = G[0 * C : 1 * C]
        tnum = G[1 * C : 2 * C]
        unum = G[2 * C : 3 * C]
        vnum = G[3 * C : 4 * C]
        aa = detA * detA
        p = unum * detA
        q = vnum * detA
        w = tnum * detA
        # round-5 VPU trim: single fused margin (see _exactsel_kernel_t —
        # >= keeps shared-edge acceptance; the m2-side boundary flips it
        # admits are measure-zero and detA != 0 there)
        m = jnp.minimum(
            jnp.minimum(jnp.minimum(p, q), aa - p - q),
            jnp.minimum(w - _TMIN * aa, aa - _EPS * _EPS),
        )
        hit = m >= 0.0
        t = jnp.where(hit, tnum / jnp.where(hit, detA, 1.0), _TMAX)
        tmin = jnp.min(t, axis=0)  # (Rt,)
        win = jnp.argmin(t, axis=0).astype(jnp.int32)
        return tmin, win

    def body(c, carry):
        best_t, best_i = carry
        tmin, win = chunk_winner(m_ref[0, :, :, pl.ds(c * C, C)])
        better = tmin < best_t
        return (
            jnp.where(better, tmin, best_t),
            jnp.where(better, c * C + win, best_i),
        )

    init = (
        jnp.full((Rt,), _TMAX, jnp.float32),
        jnp.full((Rt,), -1, jnp.int32),
    )
    best_t, best_i = lax.fori_loop(0, T // C, body, init)
    miss = best_t >= _TMAX * 0.5
    # outputs are (1, Rt) lane vectors — reshaping a lane vector into
    # (8, Rt/8) sublane tiles is a relayout Mosaic refuses to infer
    t_out[0, 0] = jnp.where(miss, _TMAX, best_t)[None, :]
    i_out[0, 0] = jnp.where(miss, -1, best_i)[None, :]


def raycast_pallas_index_t(
    tri_mat: jnp.ndarray,  # (S, 10, 4, T)
    sids: jnp.ndarray,  # (N,) int32
    features_t: jnp.ndarray,  # (N, n_tiles, 16, ray_tile) — rows 0:10 used
    ray_tile: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest-hit core on transposed features. features_t rows 10:16 are
    padding so the sublane dim is tile-exact (16 for f32)."""
    N, n_tiles, K16, Rt = features_t.shape
    assert K16 == 16 and Rt == ray_tile
    S, _, _, T = tri_mat.shape
    tri_chunk = min(128, T)
    assert T % tri_chunk == 0, (T, tri_chunk)
    R = n_tiles * ray_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 16, ray_tile),
                lambda i, j, sids: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 10, 4, T),
                lambda i, j, sids: (sids[i], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, ray_tile), lambda i, j, sids: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, ray_tile), lambda i, j, sids: (i, j, 0, 0)),
        ],
    )
    t, idx = pl.pallas_call(
        functools.partial(_kernel_t, tri_chunk=tri_chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * T * 10 * 4,
            bytes_accessed=N * R * (64 + 8) + N * R * T * 10,
            transcendentals=0,
        ),
    )(sids.astype(jnp.int32), features_t, tri_mat)
    return t.reshape(N, R), idx.reshape(N, R)


def _fused_kernel_t(
    sids_ref,  # scalar-prefetch (N,)
    b_ref,  # (1, 16, 4) SMEM — B[env]^T (feature rows x k), rows 10:16 pad
    d_ref,  # (1, 8, ray_tile) VMEM — camera-frame [d, 1] transposed (rows 0:4)
    m_ref,  # (1, 10, 4T) VMEM — CHUNK-GROUPED scene matrix (see group_tri_mat)
    t_out,  # (1, 1, 1, ray_tile) f32
    i_out,  # (1, 1, 1, ray_tile) i32 — global tri index, -1 = miss
    *,
    tri_chunk: int,
):
    """v7 fast-path kernel: ray features AND attribute extraction in-kernel.

    v5 shipped a (N, tiles, 16, Rt) feature tensor through HBM (einsum +
    64 MB round trip, raycast.py:563 = 20 ms/update in the r2 trace). Here F
    is built from SMEM scalars of the per-env (4,10) ray-feature matrix times
    the shared camera-dir tile — 40 scalar-vector FMAs, exact f32 like the
    HIGHEST-precision einsum. Attribute extraction deliberately STAYS in XLA:
    the in-kernel per-chunk (8,128)@(128,Rt) one-hot variant measured +21 ms/
    update of kernel time plus a 12.9 ms (N,nt,8,Rt)->(N,8,R) relayout — more
    than the 14.4 ms XLA extraction it replaced (r2 traces). C=32
    sub-chunking also measured slower (7.63 vs 6.63 ms/step): fori_loop
    overhead beats the 25% G-traffic saving, so C stays 128.

    m_ref must be the group_tri_mat() layout: chunk c occupies lane columns
    [c*4C, (c+1)*4C) as [detA(C)|tnum(C)|unum(C)|vnum(C)] so every dynamic
    lane slice is 128-aligned (Mosaic requirement)."""
    C = tri_chunk
    D = d_ref[0]  # (8, Rt)
    Rt = D.shape[1]
    rows = []
    for f in range(10):
        acc = b_ref[0, f, 0] * D[0:1, :]
        for k in range(1, 4):
            acc = acc + b_ref[0, f, k] * D[k : k + 1, :]
        rows.append(acc)
    F = jnp.concatenate(rows, axis=0)  # (10, Rt) f32

    T4 = m_ref.shape[2]

    def body(c, carry):
        best_t, best_i = carry
        G = jax.lax.dot_general(
            m_ref[0, :, pl.ds(c * 4 * C, 4 * C)],
            F,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4C, Rt)
        detA = G[0 * C : 1 * C]
        tnum = G[1 * C : 2 * C]
        unum = G[2 * C : 3 * C]
        vnum = G[3 * C : 4 * C]
        aa = detA * detA
        p = unum * detA
        q = vnum * detA
        w = tnum * detA
        # round-5 VPU trim: single fused margin (see _exactsel_kernel_t —
        # >= keeps shared-edge acceptance; the m2-side boundary flips it
        # admits are measure-zero and detA != 0 there)
        m = jnp.minimum(
            jnp.minimum(jnp.minimum(p, q), aa - p - q),
            jnp.minimum(w - _TMIN * aa, aa - _EPS * _EPS),
        )
        hit = m >= 0.0
        t = jnp.where(hit, tnum / jnp.where(hit, detA, 1.0), _TMAX)
        tmin = jnp.min(t, axis=0)  # (Rt,)
        win = jnp.argmin(t, axis=0).astype(jnp.int32)
        better = tmin < best_t
        return (
            jnp.where(better, tmin, best_t),
            jnp.where(better, c * C + win, best_i),
        )

    init = (
        jnp.full((Rt,), _TMAX, jnp.float32),
        jnp.full((Rt,), -1, jnp.int32),
    )
    best_t, best_i = lax.fori_loop(0, T4 // (4 * C), body, init)
    miss = best_t >= _TMAX * 0.5
    t_out[0, 0] = jnp.where(miss, _TMAX, best_t)[None, :]
    i_out[0, 0] = jnp.where(miss, -1, best_i)[None, :]


def group_tri_mat(tri_mat: jnp.ndarray, tri_chunk: int = 128) -> jnp.ndarray:
    """(S,10,4,T) -> (S,10,4T) with chunk c in lane cols [c*4C, (c+1)*4C)
    as [detA(C)|tnum(C)|unum(C)|vnum(C)] — the raycast_pallas_fused_t layout
    (128-aligned dynamic lane slices)."""
    S, _, _, T = tri_mat.shape
    C = tri_chunk
    return (
        tri_mat.reshape(S, 10, 4, T // C, C)
        .transpose(0, 1, 3, 2, 4)
        .reshape(S, 10, 4 * T)
    )


def group_tri_mat_pad16(tri_mat: jnp.ndarray, tri_chunk: int = 128) -> jnp.ndarray:
    """group_tri_mat padded to 16 sublane rows (rows 10:16 zero): manual
    chunk DMAs slice the sublane dim, and Mosaic requires slices there to
    be 8-aligned — 10 is not, 16 is."""
    g = group_tri_mat(tri_mat, tri_chunk)
    S, _, T4 = g.shape
    return jnp.concatenate([g, jnp.zeros((S, 6, T4), jnp.float32)], axis=1)


def raycast_pallas_fused_t(
    tri_mat_c: jnp.ndarray,  # (S, 10, 4T) from group_tri_mat
    sids: jnp.ndarray,  # (N,) int32
    d_t: jnp.ndarray,  # (n_tiles, 8, ray_tile) camera [d,1] transposed
    Bt: jnp.ndarray,  # (N, 16, 4) ray-feature matrices (B^T, rows 10:16 pad)
    ray_tile: int = 2048,
    tri_chunk: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fast-path closest-hit with in-kernel ray features. Returns
    (t (N,R) f32, idx (N,R) i32, -1 on miss); gather attributes in XLA
    (the transposed one-hot dot in _gather_attrs / render_batch)."""
    N = sids.shape[0]
    n_tiles, K8, Rt = d_t.shape
    assert K8 == 8 and Rt == ray_tile
    S, _, T4 = tri_mat_c.shape
    T = T4 // 4
    assert T % tri_chunk == 0, (T, tri_chunk)
    R = n_tiles * ray_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 16, 4), lambda i, j, sids: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, ray_tile), lambda i, j, sids: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 10, T4), lambda i, j, sids: (sids[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, ray_tile), lambda i, j, sids: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, ray_tile), lambda i, j, sids: (i, j, 0, 0)),
        ],
    )
    t, idx = pl.pallas_call(
        functools.partial(_fused_kernel_t, tri_chunk=tri_chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * T * 10 * 4,
            bytes_accessed=N * R * 44 + N * T * 160,
            transcendentals=0,
        ),
    )(sids.astype(jnp.int32), Bt.astype(jnp.float32), d_t, tri_mat_c)
    return t.reshape(N, R), idx.reshape(N, R)


def _fused_sel_kernel_t(
    sids_ref,  # scalar-prefetch (N,)
    chunks_ref,  # scalar-prefetch (N*nt*K,) FLAT survivor chunk ids
    cnt_ref,  # scalar-prefetch (N*nt,) FLAT survivor counts
    b_ref,  # (1, 16, 4) SMEM — B[env]^T (feature rows x k), rows 10:16 pad
    d_ref,  # (1, 8, ray_tile) VMEM — camera-frame [d, 1] transposed
    m_ref,  # (1, 10, 4T) VMEM — CHUNK-GROUPED scene matrix (group_tri_mat)
    t_out,  # (1, 1, 1, ray_tile) f32
    i_out,  # (1, 1, 1, ray_tile) i32 — global tri index, -1 = miss
    *,
    tri_chunk: int,
    n_tiles: int,
    max_chunks: int,
):
    """v8 small-scene kernel: the fused whole-scene-in-VMEM layout of
    _fused_kernel_t, but the chunk loop visits ONLY the per-screen-tile
    frustum-culling survivors (select_chunks_frustum): the fori_loop bound
    is the dynamic survivor count from SMEM and each iteration dynamic-
    slices the grouped scene matrix at the surviving chunk's 128-aligned
    lane offset. VPU hit-test work — the measured floor of the brute kernel
    — scales with survivors (~2.5/4 chunks on bench scenes, far lower on
    bigger packs) at zero per-chunk DMA or grid-step overhead. Selection
    semantics identical to _fused_kernel_t: ascending chunk order, strict <
    across chunks, argmin-first within (winner among tris closer than each
    other's G rounding may differ from the brute kernel — measured 0.03%
    of rays on shared-edge near-ties, zero hit/miss disagreements)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    C = tri_chunk
    D = d_ref[0]  # (8, Rt)
    Rt = D.shape[1]
    rows = []
    for f in range(10):
        acc = b_ref[0, f, 0] * D[0:1, :]
        for k in range(1, 4):
            acc = acc + b_ref[0, f, k] * D[k : k + 1, :]
        rows.append(acc)
    F = jnp.concatenate(rows, axis=0)  # (10, Rt) f32

    base = (i * n_tiles + j) * max_chunks
    nch = cnt_ref[i * n_tiles + j]

    def body(c, carry):
        best_t, best_i = carry
        cid = chunks_ref[base + c]
        G = jax.lax.dot_general(
            m_ref[0, :, pl.ds(cid * 4 * C, 4 * C)],
            F,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4C, Rt)
        detA = G[0 * C : 1 * C]
        tnum = G[1 * C : 2 * C]
        unum = G[2 * C : 3 * C]
        vnum = G[3 * C : 4 * C]
        aa = detA * detA
        p = unum * detA
        q = vnum * detA
        w = tnum * detA
        # round-5 VPU trim: single fused margin (see _exactsel_kernel_t —
        # >= keeps shared-edge acceptance; the m2-side boundary flips it
        # admits are measure-zero and detA != 0 there)
        m = jnp.minimum(
            jnp.minimum(jnp.minimum(p, q), aa - p - q),
            jnp.minimum(w - _TMIN * aa, aa - _EPS * _EPS),
        )
        hit = m >= 0.0
        t = jnp.where(hit, tnum / jnp.where(hit, detA, 1.0), _TMAX)
        tmin = jnp.min(t, axis=0)  # (Rt,)
        win = jnp.argmin(t, axis=0).astype(jnp.int32)
        better = tmin < best_t
        return (
            jnp.where(better, tmin, best_t),
            jnp.where(better, cid * C + win, best_i),
        )

    init = (
        jnp.full((Rt,), _TMAX, jnp.float32),
        jnp.full((Rt,), -1, jnp.int32),
    )
    best_t, best_i = lax.fori_loop(0, nch, body, init)
    miss = best_t >= _TMAX * 0.5
    t_out[0, 0] = jnp.where(miss, _TMAX, best_t)[None, :]
    i_out[0, 0] = jnp.where(miss, -1, best_i)[None, :]


def raycast_pallas_fused_sel_t(
    tri_mat_c: jnp.ndarray,  # (S, 10, 4T) group_tri_mat(tri_mat, C) layout
    sids: jnp.ndarray,  # (N,) int32
    chunk_ids: jnp.ndarray,  # (N, nt, K) i32 survivors first (tail anything)
    cnt: jnp.ndarray,  # (N, nt) i32 survivor counts
    d_t: jnp.ndarray,  # (n_tiles, 8, ray_tile) camera [d,1] transposed
    Bt: jnp.ndarray,  # (N, 16, 4) ray-feature matrices (B^T)
    ray_tile: int = 2048,
    tri_chunk: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frustum-selected fast-path closest hit. Same contract as
    raycast_pallas_fused_t — (t (N,R) f32, idx (N,R) i32, -1 miss) — but
    hit-test work scales with select_chunks_frustum's survivor counts."""
    N = sids.shape[0]
    n_tiles, K8, Rt = d_t.shape
    assert K8 == 8 and Rt == ray_tile
    S, _, T4 = tri_mat_c.shape
    C = tri_chunk
    assert (T4 // 4) % C == 0
    nt, K = chunk_ids.shape[1], chunk_ids.shape[2]
    assert nt == n_tiles and chunk_ids.shape[0] == N
    R = nt * ray_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N, nt),
        in_specs=[
            pl.BlockSpec((1, 16, 4), lambda i, j, s, ch, cn: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, ray_tile), lambda i, j, s, ch, cn: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 10, T4), lambda i, j, s, ch, cn: (s[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, ray_tile), lambda i, j, s, ch, cn: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, ray_tile), lambda i, j, s, ch, cn: (i, j, 0, 0)),
        ],
    )
    t, idx = pl.pallas_call(
        functools.partial(
            _fused_sel_kernel_t,
            tri_chunk=tri_chunk,
            n_tiles=nt,
            max_chunks=K,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * (K * C // 2) * 10 * 4,
            bytes_accessed=N * R * 44 + N * (T4 // 4) * 160,
            transcendentals=0,
        ),
    )(
        sids.astype(jnp.int32),
        chunk_ids.astype(jnp.int32).reshape(-1),
        cnt.astype(jnp.int32).reshape(-1),
        Bt.astype(jnp.float32),
        d_t,
        tri_mat_c,
    )
    return t.reshape(N, R), idx.reshape(N, R)


def _tilecull_kernel_t(
    sids_ref,  # scalar-prefetch (N,)
    chunks_ref,  # scalar-prefetch (N*nt*K,) FLAT — survivor chunk ids, the
    #              tail padded with the LAST survivor (consecutive-duplicate
    #              index_map values elide the DMA). Flat because SMEM pads
    #              each row of a multi-dim array (a (256,8,4) i32 array
    #              exceeded the 1MB SMEM budget; flat it is 32KB).
    cnt_ref,  # scalar-prefetch (N*nt,) FLAT i32 — survivor chunk count
    b_ref,  # (1, 16, 4) SMEM — B[env]^T ray-feature matrix (rows 10:16 pad)
    d_ref,  # (1, 8, ray_tile) VMEM — camera-frame [d, 1] transposed
    m_ref,  # (1, 10, 4C) VMEM — this step's chunk, group_tri_mat(C) layout
    a_ref,  # (1, 1, 16, C) VMEM — its attr16 columns
    #          rows [n(3), v0(3), gid, sem | rgb(3), valid, 4 pad]
    t_out,  # (1, 1, 1, ray_tile) f32 — revisited; PLANE-EXACT at the end
    attr_out,  # (1, 1, 16, ray_tile) f32 — winner attr16 rows; row 12
    #            becomes the lambert shade factor in the epilogue
    *,
    tri_chunk: int,
    n_tiles: int,
):
    """v8 kernel: per-screen-tile CULLED chunk streaming + plane-exact t.

    Grid (N, nt, K) streams only the chunks that per-tile frustum culling
    kept (select_chunks_frustum / select_chunks_occluded): compute is gated
    on k < cnt and the tail DMAs are elided by duplicate padding, so both
    HBM traffic and hit-test VPU work scale with the survivor count, not
    scene size. Winner SELECTION is bit-identical to the brute-force fused
    kernel: G products are the same 10-term dots, chunks are visited in
    ascending original order, ties keep the lowest original index (strict <
    across chunks, argmin-first within).

    Two refinements over the fused kernel (measured round 3):
    - t is recovered PLANE-EXACTLY for the winner. The MXU's default-
      precision f32 matmul leaves ~bf16 mantissa error in the determinant
      ratio (7.5mm median / 93mm p99 depth error vs the CPU f32 reference
      — the real cause of round 2's 0.73 scan-scene agreement), so the
      epilogue recomputes t = n.(v0 - o) / (n.d) on the VPU in exact f32
      from the winner's unit plane: n and v0 ride the attr16 table at
      HIGHEST-precision extraction, d is F rows 0:3, o sits in SMEM B.
      Subtracting v0 - o BEFORE the dot keeps conditioning (the n.v0 - n.o
      form cancels two ~|o|-magnitude terms: 33mm p99 tail).
    - Lambert shading |n.d| falls out of the same product, so the shade
      factor is emitted as attr row 12 and the XLA epilogue needs neither
      the one-hot attribute gather (14.4 ms/update, r2 trace) nor the
      world-dirs einsum.

    Per-chunk extraction is a value COPY through a (16,C)@(C,Rt) one-hot
    dot, split by precision need: default bf16 passes round v0/n and put a
    ~15-40mm bimodal tail on the recovered t, so the plane/id rows (0:8) go
    through HIGHEST; rgb/valid (8:16) tolerate display precision."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    K = pl.num_programs(2)
    C = tri_chunk
    D = d_ref[0]  # (8, Rt)
    Rt = D.shape[1]

    @pl.when(k == 0)
    def _():
        t_out[0, 0] = jnp.full((1, Rt), _TMAX, jnp.float32)
        attr_out[0, 0] = jnp.zeros((16, Rt), jnp.float32)

    @pl.when(k < cnt_ref[i * n_tiles + j])
    def _():
        rows = []
        for f in range(10):
            acc = b_ref[0, f, 0] * D[0:1, :]
            for kk in range(1, 4):
                acc = acc + b_ref[0, f, kk] * D[kk : kk + 1, :]
            rows.append(acc)
        F = jnp.concatenate(rows, axis=0)  # (10, Rt) f32
        G = jax.lax.dot_general(
            m_ref[0],
            F,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4C, Rt)
        detA = G[0 * C : 1 * C]
        tnum = G[1 * C : 2 * C]
        unum = G[2 * C : 3 * C]
        vnum = G[3 * C : 4 * C]
        aa = detA * detA
        p = unum * detA
        q = vnum * detA
        w = tnum * detA
        # round-5 VPU trim: single fused margin (see _exactsel_kernel_t —
        # >= keeps shared-edge acceptance; the m2-side boundary flips it
        # admits are measure-zero and detA != 0 there)
        m = jnp.minimum(
            jnp.minimum(jnp.minimum(p, q), aa - p - q),
            jnp.minimum(w - _TMIN * aa, aa - _EPS * _EPS),
        )
        hit = m >= 0.0
        t = jnp.where(hit, tnum / jnp.where(hit, detA, 1.0), _TMAX)
        tmin = jnp.min(t, axis=0)  # (Rt,)
        win = jnp.argmin(t, axis=0).astype(jnp.int32)
        row = jax.lax.broadcasted_iota(jnp.int32, (C, Rt), 0)
        oh = ((row == win[None, :]) & (tmin < _TMAX)[None, :]).astype(
            jnp.float32
        )
        prec = jax.lax.dot_general(
            a_ref[0, 0, 0:8],
            oh,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, Rt): [n(3), v0(3), gid, sem]
        disp = jax.lax.dot_general(
            a_ref[0, 0, 8:16],
            oh,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, Rt): [rgb(3), valid, pad]
        best_t = t_out[0, 0, 0, :]
        better = tmin < best_t
        t_out[0, 0] = jnp.where(better, tmin, best_t)[None, :]
        attr_out[0, 0] = jnp.where(
            better[None, :],
            jnp.concatenate([prec, disp], axis=0),
            attr_out[0, 0],
        )

    @pl.when(k == K - 1)
    def _():
        # plane-exact t + lambert shade from the accumulated winner plane
        A = attr_out[0, 0]
        best_t = t_out[0, 0, 0, :]
        hit = best_t < _TMAX * 0.5
        # F rows 0:3 (= world-space d) only
        rows = []
        for f in range(3):
            acc = b_ref[0, f, 0] * D[0:1, :]
            for kk in range(1, 4):
                acc = acc + b_ref[0, f, kk] * D[kk : kk + 1, :]
            rows.append(acc)
        nd = A[0:1] * rows[0] + A[1:2] * rows[1] + A[2:3] * rows[2]
        num = (
            A[0:1] * (A[3:4] - b_ref[0, 3, 3])
            + A[1:2] * (A[4:5] - b_ref[0, 4, 3])
            + A[2:3] * (A[5:6] - b_ref[0, 5, 3])
        )  # n . (v0 - o)
        grazing = jnp.abs(nd) < 1e-6
        t_pl = num / jnp.where(grazing, 1.0, nd)
        t_fin = jnp.where(hit[None, :] & ~grazing, t_pl, best_t[None, :])
        t_out[0, 0] = jnp.where(hit[None, :], t_fin, _TMAX)
        shade = 0.35 + 0.65 * jnp.abs(nd)
        attr_out[0, 0, 12] = shade[0]


def raycast_pallas_tilecull_t(
    tri_mat_c: jnp.ndarray,  # (S, 10, 4T) group_tri_mat(tri_mat, C) layout
    attr16: jnp.ndarray,  # (S, T//C, 16, C) chunked rows [n3, v0x3, gid,
    #                        sem, rgb3, valid, 4 pad] (attr16_table)
    chunk_ids: jnp.ndarray,  # (N, nt, K) i32, survivors first, tail = last
    cnt: jnp.ndarray,  # (N, nt) i32 survivor counts
    sids: jnp.ndarray,  # (N,)
    d_t: jnp.ndarray,  # (nt, 8, ray_tile) camera [d,1] transposed
    Bt: jnp.ndarray,  # (N, 16, 4) ray-feature matrices (B^T)
    ray_tile: int = 2048,
    tri_chunk: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tile-culled closest hit + in-kernel plane-exact t and shading.

    Returns (t (N,R) f32 plane-exact, attrs (N, nt, 16, Rt) f32) with attr
    rows [n3, v0x3, gid, sem, rgb3, valid, shade, 0, 0, 0]; attrs[:,:,11]
    == 0 marks a miss. Work per tile scales with the culled candidate
    count, not scene size; winner selection is bit-identical to
    raycast_pallas_fused_t."""
    N = sids.shape[0]
    n_tiles, K8, Rt = d_t.shape
    assert K8 == 8 and Rt == ray_tile
    S, _, T4 = tri_mat_c.shape
    C = tri_chunk
    assert (T4 // 4) % C == 0
    nt, K = chunk_ids.shape[1], chunk_ids.shape[2]
    assert nt == n_tiles and chunk_ids.shape[0] == N
    R = nt * ray_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N, nt, K),
        in_specs=[
            pl.BlockSpec((1, 16, 4), lambda i, j, k, s, ch, cn: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, ray_tile), lambda i, j, k, s, ch, cn: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 10, 4 * tri_chunk),
                lambda i, j, k, s, ch, cn: (s[i], 0, ch[(i * nt + j) * K + k]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 16, tri_chunk),
                lambda i, j, k, s, ch, cn: (s[i], ch[(i * nt + j) * K + k], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, ray_tile),
                         lambda i, j, k, s, ch, cn: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 16, ray_tile),
                         lambda i, j, k, s, ch, cn: (i, j, 0, 0)),
        ],
    )
    t, attrs = pl.pallas_call(
        functools.partial(
            _tilecull_kernel_t, tri_chunk=tri_chunk, n_tiles=nt
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, nt, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((N, nt, 16, ray_tile), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            # average case: ~K/2 survivor chunks tested per tile
            flops=2 * N * R * (K * C // 2) * 10 * 4,
            bytes_accessed=N * R * 72 + N * nt * K * C * 224,
            transcendentals=0,
        ),
    )(
        sids.astype(jnp.int32),
        chunk_ids.astype(jnp.int32).reshape(-1),
        cnt.astype(jnp.int32).reshape(-1),
        Bt.astype(jnp.float32),
        d_t,
        tri_mat_c,
        attr16,
    )
    return t.reshape(N, R), attrs


def attr16_table(
    tri_attr: jnp.ndarray,  # (S, T, 8) — [n(3), rgb(3), sem, valid]
    tri_v0: jnp.ndarray,  # (S, T, 3)
    tri_chunk: int = 32,
) -> jnp.ndarray:
    """(S, T//C, 16, C) chunked attr table for raycast_pallas_tilecull_t:
    rows [n(3), v0(3), gid, sem | rgb(3), valid, 4 pad]. Rows 0:8 are the
    precision-critical group (plane-exact t recovery + id channels); gid is
    the global tri index as f32 (exact below 2^24). Chunk-major layout so
    the kernel's (1, 1, 16, C) blocks have their last dim equal to the
    array's (Mosaic's non-128-lane block rule)."""
    S, T, _ = tri_attr.shape
    C = tri_chunk
    at = jnp.swapaxes(tri_attr, 1, 2)  # (S, 8, T)
    gid = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.float32)[None, None, :], (S, 1, T)
    )
    flat = jnp.concatenate(
        [
            at[:, 0:3],  # n
            jnp.swapaxes(tri_v0, 1, 2),  # v0
            gid,
            at[:, 6:7],  # sem
            at[:, 3:6],  # rgb
            at[:, 7:8],  # valid
            jnp.zeros((S, 4, T), jnp.float32),
        ],
        axis=1,
    )  # (S, 16, T)
    return flat.reshape(S, 16, T // C, C).transpose(0, 2, 1, 3)


def _stream_kernel_t(
    sids_ref,  # scalar-prefetch (N,)
    cnt_ref,  # scalar-prefetch (N*nt,) FLAT survivor counts
    b_ref,  # (1, 16, 4) SMEM — B[env]^T ray-feature matrix
    d_ref,  # (1, 8, ray_tile) VMEM — camera-frame [d, 1] transposed tile
    chunks_hbm,  # (N*nt, 1, K) HBM — PACKED survivor slots, NEAREST-FIRST:
    #              (dmin_cm << 18) | chunk_id. Rows are DMA'd into SMEM per
    #              tile (scalar-prefetching the whole table overflowed the
    #              1 MB SMEM budget at scan shape; 3D so the per-tile slice
    #              is a free leading-dim slice — 2D i32 memrefs are
    #              (8,128)-tiled even in HBM and reject 1-row slices)
    m_hbm,  # (S, 16, 4T) ANY/HBM — CHUNK-GROUPED scene matrix, sublane-
    #         padded to 16 rows (group_tri_mat_pad16; the scene stays in
    #         HBM, chunks are DMA'd manually)
    t_out,  # (1, 1, 1, ray_tile) f32
    i_out,  # (1, 1, 1, ray_tile) i32 — global tri index, -1 = miss
    ch_smem,  # SMEM scratch (K,) i32 — this tile's survivor row
    mbuf,  # VMEM scratch (NSLOT, 16, 4C) — prefetch ring
    tb_ref,  # VMEM scratch (1, ray_tile) f32 — best-t accumulator (pl.when
    #          bodies cannot return into the fori carry; refs carry state)
    ib_ref,  # VMEM scratch (1, ray_tile) i32
    row_sem,  # DMA semaphore () — survivor-row fetch
    sem,  # DMA semaphores (NSLOT,)
    *,
    tri_chunk: int,
    n_tiles: int,
    max_chunks: int,
    nslot: int,
    lookahead: int,
):
    """v10 large-scene kernel: per-tile culled chunk streaming, nearest
    first, with early termination gating BOTH the hit test and the DMA
    stream, behind a deep prefetch ring.

    The round-2 culled kernel put the K candidate-chunk axis on the Pallas
    grid — 200k grid steps at the scan-bench shape, every one paying grid
    overhead whether or not its chunk was real. The v9 rework streamed
    chunks through a double buffer, but one 32 KB HBM DMA in flight at a
    time left the loop LATENCY-bound (~3 us per chunk-step ≈ the measured
    400 ms/step at scan shape, 30x the compute). Here:

    - survivor rows live in HBM and are DMA'd per tile into SMEM (a
      scalar-prefetched (N*nt*K) table hit the 1 MB SMEM ceiling, so K was
      capped at ~32 — the round-2 fidelity floor, hitmatch 0.73 from
      chunk starvation);
    - a ring of `nslot` chunk buffers keeps `lookahead` DMAs in flight, so
      the per-chunk cost approaches max(compute, bandwidth) instead of
      round-trip latency (requires lookahead <= nslot - 1: a slot's next
      issue happens no earlier than one iteration after its wait);
    - chunks stream NEAREST-FIRST (ascending min possible distance dmin,
      packed in the high bits) with EARLY TERMINATION: once every ray of
      the tile holds a hit nearer than the next chunk's dmin, no remaining
      chunk can beat it, and BOTH the test and the remaining DMA issue stop
      (the issue predicate uses the pre-test best, which only overshoots —
      at most `lookahead` extra chunks stream).

    The winner is the global min-t over tested chunks — exact regardless
    of order. Attribute extraction and plane-exact t live in the XLA
    epilogue: at scan-scene table sizes the per-ray gather is a true
    (exact) HBM gather, so n/v0 arrive bit-exact without in-kernel
    extraction matmuls."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    C = tri_chunk
    tile = i * n_tiles + j
    row = pltpu.make_async_copy(chunks_hbm.at[tile], ch_smem, row_sem)
    row.start()

    D = d_ref[0]  # (8, Rt)
    Rt = D.shape[1]
    rows = []
    for f in range(10):
        acc = b_ref[0, f, 0] * D[0:1, :]
        for k in range(1, 4):
            acc = acc + b_ref[0, f, k] * D[k : k + 1, :]
        rows.append(acc)
    rows.append(jnp.zeros((6, Rt), jnp.float32))  # match the 16-row pad
    F = jnp.concatenate(rows, axis=0)  # (16, Rt) f32

    nch = cnt_ref[tile]
    sid = sids_ref[i]
    row.wait()

    def unpack(c):
        v = ch_smem[0, jnp.minimum(c, max_chunks - 1)]
        return v & 0x3FFFF, (v >> 18).astype(jnp.float32) * 1e-2

    def chunk_dma(slot, cid):
        return pltpu.make_async_copy(
            m_hbm.at[sid, :, pl.ds(cid * 4 * C, 4 * C)],
            mbuf.at[slot],
            sem.at[slot],
        )

    # warm-up: fill the pipeline (ET unknown yet — best_t starts at _TMAX,
    # which exceeds every dmin, so these issues are never wasted work the
    # ET would have skipped)
    for s in range(lookahead):
        @pl.when(s < nch)
        def _(s=s):
            cid_s, _d = unpack(jnp.int32(s))
            chunk_dma(s % nslot, cid_s).start()

    tb_ref[0] = jnp.full((Rt,), _TMAX, jnp.float32)
    ib_ref[0] = jnp.full((Rt,), -1, jnp.int32)
    n_iss0 = jnp.minimum(jnp.int32(lookahead), nch)

    def body(c, carry):
        best_t, best_i, n_iss = carry
        worst = jnp.max(best_t)
        # issue the next unissued chunk (keeps the ring `lookahead` deep);
        # stop issuing once even its dmin can't beat the worst current hit
        cid_n, dmin_n = unpack(n_iss)
        do_issue = (n_iss < nch) & (n_iss <= c + lookahead) & (worst > dmin_n)

        @pl.when(do_issue)
        def _():
            chunk_dma(lax.rem(n_iss, nslot), cid_n).start()

        n_iss = n_iss + do_issue.astype(jnp.int32)

        cid_c, dmin_c = unpack(c)
        slot = lax.rem(c, nslot)

        @pl.when(c < n_iss)
        def _():
            chunk_dma(slot, cid_c).wait()

            @pl.when(worst > dmin_c)
            def _():
                G = jax.lax.dot_general(
                    mbuf[slot],
                    F,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (4C, Rt)
                detA = G[0 * C : 1 * C]
                tnum = G[1 * C : 2 * C]
                unum = G[2 * C : 3 * C]
                vnum = G[3 * C : 4 * C]
                aa = detA * detA
                p = unum * detA
                q = vnum * detA
                w = tnum * detA
                m = jnp.minimum(
                    jnp.minimum(jnp.minimum(p, q), aa - p - q),
                    jnp.minimum(w - _TMIN * aa, aa - _EPS * _EPS),
                )  # round-5 fused margin (see _exactsel_kernel_t)
                hit = m >= 0.0
                t = jnp.where(hit, tnum / jnp.where(hit, detA, 1.0), _TMAX)
                tmin = jnp.min(t, axis=0)  # (Rt,)
                win = jnp.argmin(t, axis=0).astype(jnp.int32)
                better = tmin < best_t
                tb_ref[0] = jnp.where(better, tmin, best_t)
                ib_ref[0] = jnp.where(better, cid_c * C + win, best_i)

        return (tb_ref[0], ib_ref[0], n_iss)

    best_t, best_i, _ = lax.fori_loop(
        0, nch, body, (tb_ref[0], ib_ref[0], n_iss0)
    )
    miss = best_t >= _TMAX * 0.5
    t_out[0, 0] = jnp.where(miss, _TMAX, best_t)[None, :]
    i_out[0, 0] = jnp.where(miss, -1, best_i)[None, :]


def raycast_pallas_stream_t(
    tri_mat_c: jnp.ndarray,  # (S, 16, 4T) group_tri_mat_pad16 layout
    sids: jnp.ndarray,  # (N,) int32
    chunk_ids: jnp.ndarray,  # (N, nt, K) i32 PACKED (dmin_cm<<18 | id),
    #                          survivors first, ascending dmin
    cnt: jnp.ndarray,  # (N, nt) i32 survivor counts
    d_t: jnp.ndarray,  # (n_tiles, 8, ray_tile) camera [d,1] transposed
    Bt: jnp.ndarray,  # (N, 16, 4) ray-feature matrices (B^T)
    ray_tile: int = 1024,
    tri_chunk: int = 128,
    nslot: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming tile-culled closest hit for large scenes. Returns
    (t (N,R) f32, idx (N,R) i32, -1 miss); extract attributes + recover
    plane-exact t in XLA (true gathers at this table size)."""
    N = sids.shape[0]
    n_tiles, K8, Rt = d_t.shape
    assert K8 == 8 and Rt == ray_tile
    S, S16, T4 = tri_mat_c.shape
    assert S16 == 16, "use group_tri_mat_pad16"
    C = tri_chunk
    assert (T4 // 4) % C == 0
    assert (T4 // 4) // C <= (1 << 18), "packed chunk id is 18 bits"
    nt, K = chunk_ids.shape[1], chunk_ids.shape[2]
    assert nt == n_tiles and chunk_ids.shape[0] == N
    R = nt * ray_tile
    lookahead = nslot - 1
    # lane-dim DMA slices must be 128-aligned: pad the survivor axis
    Kp = -(-K // 128) * 128
    if Kp != K:
        chunk_ids = jnp.pad(chunk_ids, ((0, 0), (0, 0), (0, Kp - K)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nt),
        in_specs=[
            pl.BlockSpec((1, 16, 4), lambda i, j, s, cn: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, ray_tile),
                         lambda i, j, s, cn: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            # survivor table MUST stay in HBM: under ANY the compiler put
            # the small-shape case in VMEM, where a 1-row slice of an i32
            # (8,128)-tiled memref is illegal (Mosaic alignment error)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, ray_tile),
                         lambda i, j, s, cn: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, ray_tile),
                         lambda i, j, s, cn: (i, j, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, Kp), jnp.int32),
            pltpu.VMEM((nslot, 16, 4 * tri_chunk), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((nslot,)),
        ],
    )
    t, idx = pl.pallas_call(
        functools.partial(
            _stream_kernel_t,
            tri_chunk=tri_chunk,
            n_tiles=nt,
            max_chunks=K,
            nslot=nslot,
            lookahead=lookahead,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * (K * C // 2) * 10 * 4,
            bytes_accessed=N * R * 44 + N * nt * K * C * 160,
            transcendentals=0,
        ),
    )(
        sids.astype(jnp.int32),
        cnt.astype(jnp.int32).reshape(-1),
        Bt.astype(jnp.float32),
        d_t,
        chunk_ids.astype(jnp.int32).reshape(N * nt, 1, Kp),
        tri_mat_c,
    )
    return t.reshape(N, R), idx.reshape(N, R)


def _exactsel_kernel_t(
    sids_ref,  # scalar-prefetch (N,)
    cnt_ref,  # scalar-prefetch (N*nt,) FLAT survivor chunklet counts
    b_ref,  # (1, 16, 4) SMEM — B[env]^T ray-feature matrix (rows 10:16 pad)
    d_ref,  # (1, 8, ray_tile) VMEM — camera-frame [d, 1] transposed tile
    ids_hbm,  # (N*nt, 1, Kf) HBM — PACKED survivor slots, NEAREST-FIRST:
    #           (dmin_cm << 18) | chunklet_id, tail duplicate-padded
    m_hbm,  # (S, 16, 4T) ANY/HBM — CHUNK-GROUPED scene matrix at chunklet
    #         granularity c (group_tri_mat_pad16(tri_mat, c))
    t_out,  # (1, 1, 1, ray_tile) f32
    i_out,  # (1, 1, 1, ray_tile) i32 — global tri index, -1 = miss
    ch_smem,  # SMEM scratch (1, Kf) i32 — this tile's survivor row
    mbuf,  # VMEM scratch (NSLOT, 16, U*4c) — prefetch ring, U chunklets/slot
    tb_ref,  # VMEM scratch (1, ray_tile) f32
    ib_ref,  # VMEM scratch (1, ray_tile) i32
    row_sem,  # DMA semaphore ()
    sem,  # DMA semaphores (NSLOT, U)
    *,
    tri_chunk: int,  # c — chunklet granularity (gather unit)
    n_tiles: int,
    kf: int,
    nslot: int,
    unroll: int,
    groups: int,
):
    """v11 packed-stream kernel (VERDICT r3 missing #1): the per-tile
    candidate set is the EXACT-culled chunklet list from
    select_chunklets_exact — mean ~54 32-tri chunklets per 32x32-px tile on
    the scan bench vs the ~145 256-tri chunks the v10 stream kernel tested
    (~22x fewer (ray, tri) pairs through the VPU hit-test epilogue, which
    bound v10 at ~1.5us per chunk-step).

    Per fori iteration, ``unroll`` chunklets are DMA'd (one 128-lane copy
    each — Mosaic's dynamic-lane-slice alignment floor) into one ring slot
    and hit-tested through ONE (16, U*4c) x (16, Rt) matmul, so the VPU
    epilogue stays at v10's efficient large-G shape while the candidate set
    shrinks to the exact survivors. Chunklets stream NEAREST-FIRST
    (ascending packed dmin) with v10's EXACT early termination at iteration
    granularity: once every ray of the tile holds a hit nearer than the
    iteration's first chunklet's minimum possible distance, no remaining
    chunklet can win, and both the test and further DMA issue stop (the
    issue predicate uses the pre-test best, so at most ``lookahead`` extra
    iterations stream). The winner is the global min-t over tested
    chunklets — exact regardless of order; near-exact ties resolve in dmin
    order (v10 semantics, measured 0.03%-of-rays winner swaps on shared
    edges, zero hit/miss disagreements).

    v12 (round 4): SUB-TILE early termination. The kernel is VMEM-bandwidth
    bound on G (write+read ~8 MB/iteration at U=8, c=32 — see module
    docstring), so the only lever is producing fewer G bytes. Rays split
    into ``groups`` lane groups with independent best-t; a group whose
    worst ray already beats the iteration's dmin skips ITS matmul and
    epilogue entirely (its G slab is never produced). Tile-level ET needs
    EVERY ray of 1024 to hold a near hit before anything can stop; a
    256-lane group reaches that state much earlier, so the mean number of
    G slabs produced drops below the tile-level ET floor while the result
    stays exact (a skipped group's rays provably cannot be improved by any
    remaining chunklet: dmin ascending)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    c = tri_chunk
    U = unroll
    tile = i * n_tiles + j
    row = pltpu.make_async_copy(ids_hbm.at[tile], ch_smem, row_sem)
    row.start()

    D = d_ref[0]  # (8, Rt)
    Rt = D.shape[1]
    rows = []
    for f in range(10):
        acc = b_ref[0, f, 0] * D[0:1, :]
        for k in range(1, 4):
            acc = acc + b_ref[0, f, k] * D[k : k + 1, :]
        rows.append(acc)
    rows.append(jnp.zeros((6, Rt), jnp.float32))  # 16-row pad
    F = jnp.concatenate(rows, axis=0)  # (16, Rt) f32

    nch = cnt_ref[tile]
    n_iter = lax.div(nch + (U - 1), U)
    sid = sids_ref[i]
    row.wait()

    def unpack(k):
        v = ch_smem[0, jnp.minimum(k, kf - 1)]
        return v & 0x3FFFF, (v >> 18).astype(jnp.float32) * 1e-2

    def chunk_dma(slot, u, it):
        cid, _ = unpack(it * U + u)
        return pltpu.make_async_copy(
            m_hbm.at[sid, :, pl.ds(cid * 4 * c, 4 * c)],
            mbuf.at[slot, :, pl.ds(u * 4 * c, 4 * c)],
            sem.at[slot, u],
        )

    lookahead = nslot - 1
    # warm-up: ET unknown yet (best_t = _TMAX beats every dmin)
    for it0 in range(nslot - 1):
        @pl.when(it0 < n_iter)
        def _(it0=it0):
            for u in range(U):
                chunk_dma(it0 % nslot, u, jnp.int32(it0)).start()

    tb_ref[0] = jnp.full((Rt,), _TMAX, jnp.float32)
    ib_ref[0] = jnp.full((Rt,), -1, jnp.int32)
    n_iss0 = jnp.minimum(jnp.int32(lookahead), n_iter)

    gs = Rt // groups

    def body(it, n_iss):
        worsts = [
            jnp.max(tb_ref[0, g * gs : (g + 1) * gs]) for g in range(groups)
        ]
        worst = worsts[0]
        for g in range(1, groups):
            worst = jnp.maximum(worst, worsts[g])
        # issue the next unissued iteration's DMAs; stop once even its
        # first (nearest) chunklet's dmin can't beat the worst current hit
        _, dmin_n = unpack(n_iss * U)
        do_issue = (n_iss < n_iter) & (n_iss <= it + lookahead) & (
            worst > dmin_n
        )

        @pl.when(do_issue)
        def _():
            for u in range(U):
                chunk_dma(lax.rem(n_iss, nslot), u, n_iss).start()

        n_iss = n_iss + do_issue.astype(jnp.int32)
        slot = lax.rem(it, nslot)
        _, dmin_it = unpack(it * U)

        @pl.when(it < n_iss)
        def _():
            for u in range(U):
                chunk_dma(slot, u, it).wait()

            for g in range(groups):
                @pl.when(worsts[g] > dmin_it)
                def _(g=g):
                    lo = g * gs
                    # default precision: HIGHEST was measured (round 4) to
                    # make the kernel 1.4x SLOWER (the extra passes multiply
                    # G's VMEM traffic — the kernel's floor) and STILL left
                    # a 274mm p99 depth tail (the MT determinant ratio
                    # cancels near edges); winners stay selection-exact here
                    # and the XLA epilogue recovers t plane-exactly.
                    # bf16 G storage was tried (round 4) and is NOT
                    # expressible: Mosaic's tpu.matmul requires a 32-bit
                    # accumulator (preferred_element_type=bf16 fails kernel
                    # verification), and casting after the matmul would not
                    # remove the f32 materialization. The traffic lever is
                    # candidate reduction, not G narrowing.
                    G = jax.lax.dot_general(
                        mbuf[slot],
                        F[:, lo : lo + gs],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (U*4c, gs)
                    bt = tb_ref[0, lo : lo + gs]
                    bi = ib_ref[0, lo : lo + gs]
                    for u in range(U):
                        base = u * 4 * c
                        detA = G[base + 0 * c : base + 1 * c]
                        tnum = G[base + 1 * c : base + 2 * c]
                        unum = G[base + 2 * c : base + 3 * c]
                        vnum = G[base + 3 * c : base + 4 * c]
                        aa = detA * detA
                        p = unum * detA
                        q = vnum * detA
                        w = tnum * detA
                        # single fused margin: m1 >= 0 & m2 > 0 collapsed
                        # to min(m1, m2) >= 0 (round-5 VPU trim). >= keeps
                        # the shared-edge u==0/v==0 acceptance (crack-free
                        # adjacent triangles); the flips it admits on the
                        # m2 side (t exactly TMIN, |detA| exactly EPS) are
                        # measure-zero and detA != 0 still holds there, so
                        # the division below stays safe. Oracle and
                        # deployed paths share this kernel, so exactness
                        # comparisons see the same boundary rule.
                        m = jnp.minimum(
                            jnp.minimum(jnp.minimum(p, q), aa - p - q),
                            jnp.minimum(
                                w - _TMIN * aa, aa - _EPS * _EPS
                            ),
                        )
                        hit = m >= 0.0
                        t = jnp.where(
                            hit, tnum / jnp.where(hit, detA, 1.0), _TMAX
                        )
                        tmin = jnp.min(t, axis=0)  # (gs,)
                        win = jnp.argmin(t, axis=0).astype(jnp.int32)
                        cid, _ = unpack(it * U + u)
                        # NOTE no (it*U+u) < nch gate: the survivor tail is
                        # duplicate-padded with the LAST survivor
                        # (select_chunklets_exact contract), so re-testing
                        # tail slots reproduces an already-seen chunklet's
                        # t and cannot change the min (round-5 VPU trim).
                        # nch == 0 never reaches here (n_iter == 0).
                        better = tmin < bt
                        bt = jnp.where(better, tmin, bt)
                        bi = jnp.where(better, cid * c + win, bi)
                    tb_ref[0, lo : lo + gs] = bt
                    ib_ref[0, lo : lo + gs] = bi

        return n_iss

    lax.fori_loop(0, n_iter, body, n_iss0)
    best_t = tb_ref[0]
    best_i = ib_ref[0]
    miss = best_t >= _TMAX * 0.5
    t_out[0, 0] = jnp.where(miss, _TMAX, best_t)[None, :]
    i_out[0, 0] = jnp.where(miss, -1, best_i)[None, :]


def raycast_pallas_exactsel_t(
    tri_mat_c: jnp.ndarray,  # (S, 16, 4T) group_tri_mat_pad16(tri_mat, c)
    sids: jnp.ndarray,  # (N,) int32
    chunk_ids: jnp.ndarray,  # (N, nt, Kf) i32 PACKED (dmin_cm<<18 | id)
    #                          exact-culled chunklets, nearest-first,
    #                          tail duplicate-padded with the last survivor
    cnt: jnp.ndarray,  # (N, nt) i32 survivor counts
    d_t: jnp.ndarray,  # (nt, 8, ray_tile) camera [d,1] transposed
    Bt: jnp.ndarray,  # (N, 16, 4) ray-feature matrices (B^T)
    ray_tile: int = 1024,
    tri_chunk: int = 32,
    nslot: int = 3,
    unroll: int = 8,
    groups: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-culled packed-stream closest hit for large scenes (v11/v12).
    Same contract as raycast_pallas_stream_t: (t (N,R) f32, idx (N,R) i32,
    -1 miss); extract attributes + plane-exact t in XLA. U=8/nslot=3
    measured 15% faster than U=4/nslot=4 at scan shape (fixed
    per-iteration costs amortize over twice the chunklets). ``groups``
    independent sub-tile ET lanes (v12) skip finished ray groups' G slabs;
    exactness unaffected (see kernel docstring).

    v13 (round 4) revision, measured on the 860k-tri scan bench:
    groups DEFAULT IS 1. The v12 sub-tile strips were a net loss once
    the ET ceiling was measured from real data (exp_v13_et_ceiling.py:
    even PER-RAY ideal ET cuts only 21.4 -> 15.9 slabs/tile; the
    survivor lists are candidate-bound, not occlusion-bound), while the
    per-group predication + 4x smaller matmuls cost 26% (233 vs 185 ms
    at the N=256 scan shape, exp_v13_probe.py). bf16 G storage is NOT
    expressible (Mosaic requires a 32-bit matmul accumulator)."""
    N = sids.shape[0]
    n_tiles, K8, Rt = d_t.shape
    assert K8 == 8 and Rt == ray_tile
    S, S16, T4 = tri_mat_c.shape
    assert S16 == 16, "use group_tri_mat_pad16"
    c = tri_chunk
    assert 4 * c >= 128 and (4 * c) % 128 == 0, (
        "chunklet DMA slices must be 128-lane aligned (c >= 32)"
    )
    assert (T4 // 4) % c == 0
    assert (T4 // 4) // c <= (1 << 18), "packed chunklet id is 18 bits"
    nt, Kf = chunk_ids.shape[1], chunk_ids.shape[2]
    assert nt == n_tiles and chunk_ids.shape[0] == N
    assert Kf % 128 == 0, "SMEM id-row DMA needs a 128-multiple lane dim"
    assert ray_tile % groups == 0 and (ray_tile // groups) % 128 == 0, (
        "sub-tile ET groups must be 128-lane multiples"
    )
    R = nt * ray_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nt),
        in_specs=[
            pl.BlockSpec((1, 16, 4), lambda i, j, s, cn: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, ray_tile),
                         lambda i, j, s, cn: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, ray_tile),
                         lambda i, j, s, cn: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, ray_tile),
                         lambda i, j, s, cn: (i, j, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, Kf), jnp.int32),
            pltpu.VMEM((nslot, 16, unroll * 4 * c), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((nslot, unroll)),
        ],
    )
    t, idx = pl.pallas_call(
        functools.partial(
            _exactsel_kernel_t,
            tri_chunk=c,
            n_tiles=nt,
            kf=Kf,
            nslot=nslot,
            unroll=unroll,
            groups=groups,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * (Kf * c // 2) * 10 * 4,
            bytes_accessed=N * R * 44 + N * nt * Kf * c * 160,
            transcendentals=0,
        ),
    )(
        sids.astype(jnp.int32),
        cnt.astype(jnp.int32).reshape(-1),
        Bt.astype(jnp.float32),
        d_t,
        chunk_ids.astype(jnp.int32).reshape(N * nt, 1, Kf),
        tri_mat_c,
    )
    return t.reshape(N, R), idx.reshape(N, R)


def _culled_kernel_t(
    sids_ref,  # scalar-prefetch (N,)
    chunks_ref,  # scalar-prefetch (N, n_tiles, K)
    f_ref,  # (1, 1, 16, ray_tile) — TRANSPOSED features (rows 0:10)
    m_ref,  # (1, 10, 4, C) — this grid step's candidate chunk
    a_ref,  # (1, 8, C) — its TRANSPOSED attribute columns
    t_out,  # (1, 1, 1, ray_tile) f32 — revisited across the K axis
    attr_out,  # (1, 1, 8, ray_tile) f32
    *,
    tri_chunk: int,
):
    """v5-layout culled kernel: features and attributes ride rays-minor
    blocks (the row-major feature block costs a 10->128 lane-padding
    relayout copy; the (Rt, 8) attribute output is lane-8-padded). G comes
    out (4C, Rt); extraction is attrT (8,C) @ one-hot (C,Rt) on the MXU."""
    k = pl.program_id(2)
    C = tri_chunk
    F = f_ref[0, 0, 0:10, :]  # (10, Rt)
    Rt = F.shape[1]

    @pl.when(k == 0)
    def _():
        t_out[0, 0] = jnp.full((1, Rt), _TMAX, jnp.float32)
        attr_out[0, 0] = jnp.zeros((ATTR_CH, Rt), jnp.float32)

    G = jax.lax.dot_general(
        m_ref[0].reshape(10, 4 * C),
        F,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (4C, Rt)
    detA = G[0 * C : 1 * C]
    tnum = G[1 * C : 2 * C]
    unum = G[2 * C : 3 * C]
    vnum = G[3 * C : 4 * C]
    aa = detA * detA
    p = unum * detA
    q = vnum * detA
    w = tnum * detA
    m1 = jnp.minimum(jnp.minimum(p, q), aa - p - q)
    m2 = jnp.minimum(w - _TMIN * aa, aa - _EPS * _EPS)
    hit = (m1 >= 0.0) & (m2 > 0.0)
    t = jnp.where(hit, tnum / jnp.where(hit, detA, 1.0), _TMAX)
    tmin = jnp.min(t, axis=0)  # (Rt,)
    win = jnp.argmin(t, axis=0).astype(jnp.int32)
    row = jax.lax.broadcasted_iota(jnp.int32, (C, Rt), 0)
    oh = ((row == win[None, :]) & (tmin < _TMAX)[None, :]).astype(jnp.float32)
    attrs = jax.lax.dot_general(
        a_ref[0],
        oh,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8, Rt)

    best_t = t_out[0, 0, 0, :]
    better = tmin < best_t
    t_out[0, 0] = jnp.where(better, tmin, best_t)[None, :]
    attr_out[0, 0] = jnp.where(better[None, :], attrs, attr_out[0, 0])


def raycast_pallas_culled_t(
    tri_mat: jnp.ndarray,  # (S, 10, 4, T)
    tri_attr_t: jnp.ndarray,  # (S, 8, T) TRANSPOSED attribute tables
    chunk_ids: jnp.ndarray,  # (N, n_tiles, K) int32
    sids: jnp.ndarray,  # (N,)
    features_t: jnp.ndarray,  # (N, n_tiles, 16, ray_tile)
    ray_tile: int = 1024,
    tri_chunk: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Culled closest-hit + attributes with rays-minor layouts throughout.
    Returns (t (N,R) f32, attrs_t (N,8,R) f32); attrs_t[:,7]==0 marks miss."""
    N, n_tiles, K16, Rt = features_t.shape
    assert K16 == 16 and Rt == ray_tile
    R = n_tiles * ray_tile
    ids_bytes = int(np.prod(chunk_ids.shape)) * 4
    if ids_bytes > 96 * 1024 and N % 2 == 0:
        h = N // 2
        t0, a0 = raycast_pallas_culled_t(
            tri_mat, tri_attr_t, chunk_ids[:h], sids[:h], features_t[:h],
            ray_tile=ray_tile, tri_chunk=tri_chunk,
        )
        t1, a1 = raycast_pallas_culled_t(
            tri_mat, tri_attr_t, chunk_ids[h:], sids[h:], features_t[h:],
            ray_tile=ray_tile, tri_chunk=tri_chunk,
        )
        return jnp.concatenate([t0, t1]), jnp.concatenate([a0, a1])
    K = chunk_ids.shape[-1]
    assert chunk_ids.shape == (N, n_tiles, K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, n_tiles, K),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 16, ray_tile),
                lambda i, j, k, sids, ch: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 10, 4, tri_chunk),
                lambda i, j, k, sids, ch: (sids[i], 0, 0, ch[i, j, k]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ATTR_CH, tri_chunk),
                lambda i, j, k, sids, ch: (sids[i], 0, ch[i, j, k]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, 1, ray_tile), lambda i, j, k, sids, ch: (i, j, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, ATTR_CH, ray_tile),
                lambda i, j, k, sids, ch: (i, j, 0, 0),
            ),
        ],
    )
    t, attrs = pl.pallas_call(
        functools.partial(_culled_kernel_t, tri_chunk=tri_chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((N, n_tiles, ATTR_CH, ray_tile), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * K * tri_chunk * (10 * 4 + ATTR_CH),
            bytes_accessed=N * R * 48 + N * n_tiles * K * tri_chunk * 192,
            transcendentals=0,
        ),
    )(sids.astype(jnp.int32), chunk_ids.astype(jnp.int32), features_t, tri_mat, tri_attr_t)
    # (N, n_tiles, 8, Rt) -> (N, 8, R)
    attrs = attrs.transpose(0, 2, 1, 3).reshape(N, ATTR_CH, R)
    return t.reshape(N, R), attrs


def _culled_kernel(
    sids_ref,  # scalar-prefetch (N,)
    chunks_ref,  # scalar-prefetch (N, n_tiles, K) candidate chunk ids
    f_ref,  # (1, 1, ray_tile, 10)
    m_ref,  # (1, 10, 4, C) — this grid step's candidate chunk
    a_ref,  # (1, C, 8) — its attribute rows
    t_out,  # (1, 1, 8, ray_tile//8) f32 — revisited across the K axis
    attr_out,  # (1, 1, ray_tile, 8)
    *,
    tri_chunk: int,
):
    """Unlike the small-scene kernel, attributes are extracted IN-KERNEL via
    a per-chunk one-hot matmul: the scene table is too large for the one-hot
    trick in XLA and XLA's row gather scalarizes (29ms at bench shape)."""
    k = pl.program_id(2)
    C = tri_chunk
    F = f_ref[0, 0]
    Rt = F.shape[0]
    shp = (t_out.shape[2], t_out.shape[3])

    @pl.when(k == 0)
    def _():
        t_out[0, 0] = jnp.full(shp, _TMAX, jnp.float32)
        attr_out[0, 0] = jnp.zeros((Rt, ATTR_CH), jnp.float32)

    G = jax.lax.dot_general(
        F,
        m_ref[0].reshape(10, 4 * C),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    detA = G[:, 0 * C : 1 * C]
    tnum = G[:, 1 * C : 2 * C]
    unum = G[:, 2 * C : 3 * C]
    vnum = G[:, 3 * C : 4 * C]
    aa = detA * detA
    p = unum * detA
    q = vnum * detA
    w = tnum * detA
    m1 = jnp.minimum(jnp.minimum(p, q), aa - p - q)
    m2 = jnp.minimum(w - _TMIN * aa, aa - _EPS * _EPS)
    hit = (m1 >= 0.0) & (m2 > 0.0)
    t = jnp.where(hit, tnum / jnp.where(hit, detA, 1.0), _TMAX)
    tmin = jnp.min(t, axis=1, keepdims=True)
    win = jnp.argmin(t, axis=1).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    oh = (lane == win[:, None]) & (tmin < _TMAX)
    attrs = jax.lax.dot_general(
        oh.astype(jnp.float32),
        a_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tmin = tmin[:, 0]

    best_t = t_out[0, 0].reshape(Rt)
    better = tmin < best_t
    t_out[0, 0] = jnp.where(better, tmin, best_t).reshape(shp)
    attr_out[0, 0] = jnp.where(better[:, None], attrs, attr_out[0, 0])


def raycast_pallas_culled(
    tri_mat: jnp.ndarray,  # (S, 10, 4, T)
    tri_attr: jnp.ndarray,  # (S, T, 8)
    chunk_ids: jnp.ndarray,  # (N, n_tiles, K) int32 from select_chunks
    sids: jnp.ndarray,  # (N,)
    origins: jnp.ndarray = None,  # (N, R, 3)
    dirs: jnp.ndarray = None,  # (N, R, 3)
    ray_tile: int = 1024,
    tri_chunk: int = 128,
    features: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Culled closest-hit + attributes: each ray tile tests only its K
    candidate chunks — grid (N, n_tiles, K) with the output block revisited
    over K (Mosaic keeps it in VMEM), so work scales with K·tri_chunk, not
    scene size."""
    from habitat_tpu.ops.raycast import ray_features

    if features is None:
        features = ray_features(origins, dirs)
    N, R, _ = features.shape
    # chunk_ids rides the scalar-prefetch path into SMEM (1MB); split over
    # env slices when the id table would blow the budget (hit at N=256,
    # n_tiles=16, K=48 on real-scan scenes)
    ids_bytes = int(np.prod(chunk_ids.shape)) * 4
    if ids_bytes > 96 * 1024 and N % 2 == 0:
        h = N // 2
        t0, a0 = raycast_pallas_culled(
            tri_mat, tri_attr, chunk_ids[:h], sids[:h],
            features=features[:h], ray_tile=ray_tile, tri_chunk=tri_chunk,
        )
        t1, a1 = raycast_pallas_culled(
            tri_mat, tri_attr, chunk_ids[h:], sids[h:],
            features=features[h:], ray_tile=ray_tile, tri_chunk=tri_chunk,
        )
        return jnp.concatenate([t0, t1]), jnp.concatenate([a0, a1])
    S, _, _, T = tri_mat.shape
    n_tiles = R // ray_tile
    K = chunk_ids.shape[-1]
    assert chunk_ids.shape == (N, n_tiles, K)
    F = features.reshape(N, n_tiles, ray_tile, 10)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, n_tiles, K),
        in_specs=[
            pl.BlockSpec(
                (1, 1, ray_tile, 10),
                lambda i, j, k, sids, ch: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 10, 4, tri_chunk),
                lambda i, j, k, sids, ch: (sids[i], 0, 0, ch[i, j, k]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tri_chunk, ATTR_CH),
                lambda i, j, k, sids, ch: (sids[i], ch[i, j, k], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, 8, ray_tile // 8), lambda i, j, k, sids, ch: (i, j, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, ray_tile, ATTR_CH),
                lambda i, j, k, sids, ch: (i, j, 0, 0),
            ),
        ],
    )
    t, attrs = pl.pallas_call(
        functools.partial(_culled_kernel, tri_chunk=tri_chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n_tiles, 8, ray_tile // 8), jnp.float32),
            jax.ShapeDtypeStruct((N, n_tiles, ray_tile, ATTR_CH), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * K * tri_chunk * (10 * 4 + ATTR_CH),
            bytes_accessed=N * R * 48 + N * n_tiles * K * tri_chunk * 192,
            transcendentals=0,
        ),
    )(sids.astype(jnp.int32), chunk_ids.astype(jnp.int32), F, tri_mat, tri_attr)
    return t.reshape(N, R), attrs.reshape(N, R, ATTR_CH)


# ---------------------------------------------------------------------------
# v16 exact-cull mask kernel (round 5)
# ---------------------------------------------------------------------------

_CULL_CONSTS = {}


def _cull_consts(c: int = 32):
    """Static matmul operands for the cull-mask kernel at chunklet size c:
    blockdiag tri mask, plane/validity group summer + outside-event
    thresholds. Cached per c. Kind columns (16 per tri): [3p+0: d0 |
    3p+1: d0+de1 | 3p+2: d0+de2 for planes p=0..3 | 12: valid | 13-15 pad].
    """
    if c in _CULL_CONSTS:
        return _CULL_CONSTS[c]
    L = c * 16  # verts16 lanes per chunklet row
    KC = c * 16  # D columns: c*k + t
    t_of_l = np.arange(L) // 16
    t_of_col = np.arange(KC) % c
    k_of_col = np.arange(KC) // c
    mask = (t_of_l[:, None] == t_of_col[None, :]).astype(np.float32)
    # G1 col layout: c*g + t for groups g=0..3 (planes: kinds 3g..3g+2)
    # and g=4 (validity: kind 12); padded to a 128 multiple
    G1C = -(-5 * c // 128) * 128
    g_of_k = np.where(
        k_of_col < 12, k_of_col // 3, np.where(k_of_col == 12, 4, -1)
    )
    g_of_out = np.arange(G1C) // c
    t_of_out = np.arange(G1C) % c
    g1 = (
        (t_of_col[:, None] == t_of_out[None, :])
        & (g_of_k[:, None] == g_of_out[None, :])
    ).astype(np.float32)
    need = np.where(
        g_of_out < 4, 3.0, np.where(g_of_out == 4, 1.0, 1e9)
    ).astype(np.float32)[None, :]
    g2 = (
        (t_of_out[:, None] == np.arange(c)[None, :])
        & (g_of_out[:, None] <= 4)
    ).astype(np.float32)
    out = (
        jnp.asarray(mask),
        jnp.asarray(g1),
        jnp.asarray(need),
        jnp.asarray(g2),
    )
    _CULL_CONSTS[c] = out
    return out


def _cullmask_kernel_t(
    sids_ref,  # scalar-prefetch (N,)
    cntk_ref,  # scalar-prefetch (N*nt,) — head counts min(cnt1, ka)
    thr_ref,  # (1, 1, KC) VMEM — per-(env,tile) cmp thresholds by D col
    mexp_ref,  # (1, 16, KC) VMEM — M[f,k] repeated per tri col
    head_hbm,  # (N*nt, 1, ka) HBM int32 packed head (nearest-first)
    verts_hbm,  # (S*NCH, 1, L) ANY — verts16 2KB rows
    mask_ref,  # (1, L, KC) VMEM static blockdiag tri mask (const block)
    g1_ref,  # (1, KC, G1C) VMEM static plane-group summer (const block)
    need_ref,  # (1, 1, G1C) VMEM outside-event thresholds (const block)
    g2_ref,  # (1, G1C, c) VMEM group collapse (const block)
    pass_out,  # (1, ka, c) f32 — per-(head slot, tri) pass indicator
    hd_smem,  # SMEM scratch (1, ka) i32
    mbuf,  # VMEM scratch (nslot, U, L)
    wbuf,  # VMEM scratch (L, KC) — W = mask * M_expanded
    row_sem,  # DMA semaphore ()
    sem,  # DMA semaphores (nslot, U)
    *,
    c: int,
    n_tiles: int,
    ka: int,
    unroll: int,
    nslot: int,
    nch: int,
):
    """Exact-cull mask for the k_exact head, computed in-kernel (v16).

    The XLA form of the L2 test (gather 2KB verts rows -> relayout -> 12
    multiply-reduce passes) is data-movement bound: ~36 ms of the 78.8 ms
    select at the N=256 scan shape (round-5 profile: the
    lanes-to-sublanes relayout of the gathered set alone is 22 ms/step).
    Here each (env, tile) program streams its head chunklets' verts16
    rows U at a time and evaluates all 12 plane conditions + validity as
    ONE (U, 512) x (512, 512) MXU matmul against a blockdiag-masked,
    per-program-expanded component map (kind cols carry d0, d0+de1,
    d0+de2 directly, so the exact 3-corners-outside test is a straight
    per-column threshold), then collapses corners->plane-events->tri with
    two small matmuls. Head slots at/beyond the head count produce
    garbage (DMAs are clamped in-bounds); the caller gates by position.

    MEASURED: PARITY, not a win (round 5, N=256 scan shape, flagship
    paused): select 77.3 ms with this kernel vs 77.8 with the XLA form;
    the kernel's device time (36.9 ms) equals the XLA block it replaces.
    Why: the kernel is DMA-ISSUE bound — ~164 scattered 2KB row copies
    per (env, tile) program x 4096 programs ~ 24 ms of pure issue/wait
    overhead, and the HIGHEST-precision (bf16x6) dense matmul adds the
    rest (Mosaic cannot lower bf16x3, and bf16x1 would break the 1e-3
    conservative margin). A 16-contraction reformulation would cut the
    matmul but not the DMA floor, capping the best case at ~8 ms saved
    (~4%% of the render) — not worth the second formulation. Kept behind
    select_chunklets_exact(cull_backend="pallas") with an exact-equality
    test; the deployed default stays the XLA form.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * n_tiles + j
    U = unroll
    row = pltpu.make_async_copy(head_hbm.at[tile], hd_smem, row_sem)
    row.start()

    # W = blockdiag mask * M_expanded — once per program
    wbuf[...] = mask_ref[0] * jnp.concatenate([mexp_ref[0]] * c, axis=0)

    sid = sids_ref[i]
    nck = cntk_ref[tile]
    n_iter = lax.div(nck + (U - 1), U)
    row.wait()

    def cid_of(k):
        v = hd_smem[0, jnp.minimum(k, ka - 1)]
        # sentinel/pad slots decode to huge ids; clamp into the table
        return jnp.minimum(v & 0x3FFFF, nch - 1)

    def row_dma(slot, u, it):
        # mbuf is (nslot, U, 1, L): u indexes a leading dim so the copied
        # (1, L) block never slices the (8, 128) tiling (Mosaic rejects
        # sub-8 sublane slices)
        return pltpu.make_async_copy(
            verts_hbm.at[sid * nch + cid_of(it * U + u)],
            mbuf.at[slot, u],
            sem.at[slot, u],
        )

    for it0 in range(nslot - 1):
        @pl.when(it0 < n_iter)
        def _(it0=it0):
            for u in range(U):
                row_dma(it0 % nslot, u, jnp.int32(it0)).start()

    def body(it, carry):
        nxt = it + (nslot - 1)

        @pl.when(nxt < n_iter)
        def _():
            for u in range(U):
                row_dma(lax.rem(nxt, nslot), u, nxt).start()

        slot = lax.rem(it, nslot)
        for u in range(U):
            row_dma(slot, u, it).wait()
        X = mbuf[slot].reshape(U, c * 16)  # (U, 1, L) -> (U, L)
        D = jax.lax.dot_general(
            X, wbuf[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (U, KC) — HIGH (bf16x3) is not lowerable by Mosaic; DEFAULT
        # (bf16x1) would put ~cm-scale error against the 1e-3 margin
        cond = (D < thr_ref[0]).astype(jnp.float32)
        andsum = jax.lax.dot_general(
            cond, g1_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (U, G1C): per (plane-group, tri) satisfied-corner counts
        outev = (andsum >= need_ref[0]).astype(jnp.float32)
        cullcnt = jax.lax.dot_general(
            outev, g2_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (U, c): culling events per tri
        tri_pass = (cullcnt < 0.5).astype(jnp.float32)
        pass_out[0, pl.ds(it * U, U)] = tri_pass
        return carry

    lax.fori_loop(0, n_iter, body, 0)


def cullmask_pallas_t(
    verts16: jnp.ndarray,  # (S, T, 16) f32 — pack.tri_verts16
    sids: jnp.ndarray,  # (N,)
    head: jnp.ndarray,  # (N, nt, ka) int32 packed nearest-first head
    cntk: jnp.ndarray,  # (N, nt) int32 head counts (min(cnt1, ka))
    nw: jnp.ndarray,  # (N, nt, 4, 3) world inward tile-plane normals
    cam_pos: jnp.ndarray,  # (N, 3)
    eps: float = -1e-3,
    c: int = 32,
    unroll: int = 32,
    nslot: int = 2,
) -> jnp.ndarray:
    """Per-(head slot, tri) exact-cull pass mask (v16).

    Returns (N, nt, ka, c) f32 — 1.0 where the triangle survives all four
    tile planes AND is valid. Slots >= cntk hold garbage; callers must
    gate by head position."""
    from habitat_tpu.ops.raycast import VERTS16_VALID

    N, nt, ka = head.shape
    S, T, comp = verts16.shape
    assert comp == 16 and T % c == 0
    NCH = T // c
    assert ka % 128 == 0, "SMEM head row DMA needs 128-multiple lanes"
    mask, g1, need, g2 = _cull_consts(c)
    G1C = g1.shape[1]
    KC = c * 16

    # component map M (16 rows, 16 kind cols); kind 3p+1/3p+2 columns sum
    # v0+e1 / v0+e2 so every condition is a plain threshold on one column
    M = jnp.zeros((N, nt, 16, 16), jnp.float32)
    for p in range(4):
        nw_p = nw[:, :, p, :]
        M = M.at[:, :, 0:3, 3 * p].set(nw_p)
        M = M.at[:, :, 0:3, 3 * p + 1].set(nw_p)
        M = M.at[:, :, 3:6, 3 * p + 1].set(nw_p)
        M = M.at[:, :, 0:3, 3 * p + 2].set(nw_p)
        M = M.at[:, :, 6:9, 3 * p + 2].set(nw_p)
    M = M.at[:, :, VERTS16_VALID, 12].set(1.0)
    mexp = jnp.repeat(M, c, axis=-1).reshape(N * nt, 16, KC)
    b = jnp.einsum("ntpf,nf->ntp", nw, cam_pos)  # cam.nw_p offsets
    thr = jnp.full((N, nt, 16), -1e30, jnp.float32)
    for k in range(12):
        thr = thr.at[:, :, k].set(eps + b[:, :, k // 3])
    thr = thr.at[:, :, 12].set(0.5)  # valid < 0.5 == invalidity event
    thr = jnp.repeat(thr, c, axis=-1).reshape(N * nt, 1, KC)

    rows = verts16.reshape(S * NCH, 1, c * 16)
    head3 = head.reshape(N * nt, 1, ka)
    cflat = jnp.minimum(cntk, ka).reshape(N * nt).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, KC), lambda i, j, s, cn: (i * nt + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 16, KC), lambda i, j, s, cn: (i * nt + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            # static operands: constant index -> fetched once, then the
            # pipeline's same-block elision keeps them resident
            pl.BlockSpec(
                (1, c * 16, KC), lambda i, j, s, cn: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, KC, G1C), lambda i, j, s, cn: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, G1C), lambda i, j, s, cn: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, G1C, c), lambda i, j, s, cn: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, ka, c), lambda i, j, s, cn: (i * nt + j, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, ka), jnp.int32),
            pltpu.VMEM((nslot, unroll, 1, c * 16), jnp.float32),
            pltpu.VMEM((c * 16, KC), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((nslot, unroll)),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(
            _cullmask_kernel_t,
            c=c,
            n_tiles=nt,
            ka=ka,
            unroll=unroll,
            nslot=nslot,
            nch=NCH,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N * nt, ka, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * nt * ka * (KC * (c * 16 + G1C)),
            bytes_accessed=N * nt * ka * (4 + c * 64 + c * 4),
            transcendentals=0,
        ),
    )(
        sids.astype(jnp.int32),
        cflat,
        thr,
        mexp,
        head3,
        rows,
        mask[None],
        g1[None],
        need[None],
        g2[None],
    )
    return out.reshape(N, nt, ka, c)
