"""Fused Pallas TPU raycast + shading kernel.

The XLA path (ops/raycast.py raycast_mxu_batch) round-trips the determinant
tensor G = F @ M through HBM, then gathers per-hit shading attributes — both
dominate its runtime. This kernel fuses everything:

- MXU: one (ray_tile × 4·tri_chunk) determinant block per step (the
  Möller–Trumbore determinants ARE a matmul, see ops/raycast.py module doc)
- VPU: hit predicate + running closest-hit fold, entirely in registers/VMEM
- shading WITHOUT gathers: the winning triangle's attributes
  [unit normal, color, semantic id, valid] are extracted with a one-hot
  matmul (Rt×C)·(C×8) against the VMEM-resident per-scene attribute table —
  a second tiny MXU op instead of N·R random HBM gathers.

Only (t, attrs) per ray leave the core. Grid: (N envs, R/ray_tile); the
scene's coefficient matrix and attribute table are blocks indexed by the
scalar-prefetched per-env scene id, so consecutive ray tiles of one env reuse
them without re-DMA.
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

ATTR_CH = 8  # [nx, ny, nz, r, g, b, sem, valid]


def _kernel(
    sids_ref,  # scalar-prefetch (N,)
    f_ref,  # (1, 1, ray_tile, 10) VMEM — ray features of this tile
    m_ref,  # (1, 10, 4, T) VMEM — this env's scene matrix
    a_ref,  # (1, T, 8) VMEM — this env's attribute table
    t_out,  # (1, 1, 8, ray_tile//8)
    attr_out,  # (1, 1, ray_tile, 8)
    *,
    tri_chunk: int,
):
    F = f_ref[0, 0]  # (Rt, 10)
    T = m_ref.shape[3]
    n_chunks = T // tri_chunk
    Rt = F.shape[0]
    C = tri_chunk

    def body(c, carry):
        best_t, best_attr = carry
        M = m_ref[0, :, :, pl.ds(c * C, C)]  # (10, 4, C)
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
        # sign-free hit test: multiply the barycentric inequalities through by
        # detA (u = unum/detA >= 0  <=>  unum*detA >= 0, etc.) — saves the
        # sign/abs lanes and keeps the divide for winners only
        p = unum * detA
        q = vnum * detA
        w = tnum * detA
        aa = detA * detA
        hit = (
            (aa > _EPS * _EPS)
            & (p >= 0.0)
            & (q >= 0.0)
            & (p + q <= aa)
            & (w > _TMIN * aa)
        )
        # NOTE(perf): pl.reciprocal(approx=True) here measured SLOWER than
        # the exact divide (19.9ms vs 18.4ms full render at N=256) — the
        # kernel is not divide-bound; don't re-try that experiment.
        t = jnp.where(hit, tnum / jnp.where(hit, detA, 1.0), _TMAX)
        tmin = jnp.min(t, axis=1, keepdims=True)  # (Rt, 1)
        # exact one-hot of the winner via argmin (ties -> lowest index)
        win = jnp.argmin(t, axis=1).astype(jnp.int32)  # (Rt,)
        lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        oh = (lane == win[:, None]) & (tmin < _TMAX)
        A = a_ref[0, pl.ds(c * C, C), :]  # (C, 8)
        attrs = jax.lax.dot_general(
            oh.astype(jnp.float32),
            A,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Rt, 8)
        tmin = tmin[:, 0]
        better = tmin < best_t
        return (
            jnp.where(better, tmin, best_t),
            jnp.where(better[:, None], attrs, best_attr),
        )

    init = (
        jnp.full((Rt,), _TMAX, jnp.float32),
        jnp.zeros((Rt, ATTR_CH), jnp.float32),
    )
    best_t, best_attr = lax.fori_loop(0, n_chunks, body, init)
    t_out[0, 0] = best_t.reshape(t_out.shape[2], t_out.shape[3])
    attr_out[0, 0] = best_attr


def raycast_pallas_batch(
    tri_mat: jnp.ndarray,  # (S, 10, 4, T) scene coefficient matrices
    tri_attr: jnp.ndarray,  # (S, T, 8) attribute tables
    sids: jnp.ndarray,  # (N,) int32
    origins: jnp.ndarray = None,  # (N, R, 3)
    dirs: jnp.ndarray = None,  # (N, R, 3)
    ray_tile: int = 2048,
    tri_chunk: int = 128,
    features: jnp.ndarray = None,  # optional precomputed (N, R, 10)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest-hit + shading for all envs.

    Returns (t (N,R) f32, attrs (N,R,8) f32); attrs[...,7] == 0 marks a miss.
    `features` short-circuits ray_features(origins, dirs) — the fast render
    path builds it as one tiny matmul against the constant pixel grid
    (raycast.ray_feature_matrix) instead of per-pixel trig.
    """
    from habitat_tpu.ops.raycast import ray_features

    if features is not None:
        N, R, _ = features.shape
    else:
        N, R, _ = origins.shape
    S, _, _, T = tri_mat.shape
    tri_chunk = min(tri_chunk, T)
    assert T % tri_chunk == 0, (T, tri_chunk)
    ray_tile = min(ray_tile, R)
    assert R % ray_tile == 0, (R, ray_tile)
    n_tiles = R // ray_tile

    if features is None:
        features = ray_features(origins, dirs)
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
            pl.BlockSpec(
                (1, T, ATTR_CH),
                lambda i, j, sids: (sids[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, ray_tile // 8), lambda i, j, sids: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, ray_tile, ATTR_CH), lambda i, j, sids: (i, j, 0, 0)),
        ],
    )

    t, attrs = pl.pallas_call(
        functools.partial(_kernel, tri_chunk=tri_chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n_tiles, 8, ray_tile // 8), jnp.float32),
            jax.ShapeDtypeStruct((N, n_tiles, ray_tile, ATTR_CH), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * T * (10 * 4 + ATTR_CH),
            bytes_accessed=N * R * (40 + 4 + 4 * ATTR_CH) + N * (160 + 32) * T,
            transcendentals=0,
        ),
    )(sids.astype(jnp.int32), F, tri_mat, tri_attr)
    return t.reshape(N, R), attrs.reshape(N, R, ATTR_CH)


def _culled_kernel(
    sids_ref,  # scalar-prefetch (N,)
    chunks_ref,  # scalar-prefetch (N*n_tiles*K,) flattened chunk ids
    f_ref,  # (1, 1, ray_tile, 10)
    m_ref,  # (1, 10, 4, C) — this grid step's candidate chunk
    a_ref,  # (1, C, 8)
    t_out,  # (1, 1, 8, ray_tile//8) — revisited across the K axis
    attr_out,  # (1, 1, ray_tile, 8)
    *,
    tri_chunk: int,
):
    k = pl.program_id(2)
    F = f_ref[0, 0]
    C = tri_chunk
    Rt = F.shape[0]

    @pl.when(k == 0)
    def _():
        t_out[0, 0] = jnp.full((t_out.shape[2], t_out.shape[3]), _TMAX, jnp.float32)
        attr_out[0, 0] = jnp.zeros((Rt, ATTR_CH), jnp.float32)

    M = m_ref[0]  # (10, 4, C)
    G = jax.lax.dot_general(
        F,
        M.reshape(10, 4 * C),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    detA = G[:, 0 * C : 1 * C]
    tnum = G[:, 1 * C : 2 * C]
    unum = G[:, 2 * C : 3 * C]
    vnum = G[:, 3 * C : 4 * C]
    p = unum * detA
    q = vnum * detA
    w = tnum * detA
    aa = detA * detA
    hit = (
        (aa > _EPS * _EPS)
        & (p >= 0.0)
        & (q >= 0.0)
        & (p + q <= aa)
        & (w > _TMIN * aa)
    )
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
    t_out[0, 0] = jnp.where(better, tmin, best_t).reshape(
        t_out.shape[2], t_out.shape[3]
    )
    attr_out[0, 0] = jnp.where(better[:, None], attrs, attr_out[0, 0])


def raycast_pallas_culled(
    tri_mat: jnp.ndarray,  # (S, 10, 4, T)
    tri_attr: jnp.ndarray,  # (S, T, 8)
    chunk_ids: jnp.ndarray,  # (N, n_tiles, K) int32 from select_chunks
    sids: jnp.ndarray,  # (N,)
    origins: jnp.ndarray,  # (N, R, 3)
    dirs: jnp.ndarray,  # (N, R, 3)
    ray_tile: int = 1024,
    tri_chunk: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Culled closest-hit: each ray tile tests only its K candidate chunks —
    the kernel's grid is (N, n_tiles, K) with the output block revisited over
    K (Mosaic keeps it in VMEM), so work scales with K·128 triangles, not the
    scene size."""
    from habitat_tpu.ops.raycast import ray_features

    N, R, _ = origins.shape
    # chunk_ids rides the scalar-prefetch path into SMEM (1MB); split over
    # env slices when the id table would blow the budget (hit at N=256,
    # n_tiles=16, K=48 on real-scan scenes)
    ids_bytes = int(np.prod(chunk_ids.shape)) * 4
    if ids_bytes > 96 * 1024 and N % 2 == 0:
        h = N // 2
        t0, a0 = raycast_pallas_culled(
            tri_mat, tri_attr, chunk_ids[:h], sids[:h], origins[:h], dirs[:h],
            ray_tile=ray_tile, tri_chunk=tri_chunk,
        )
        t1, a1 = raycast_pallas_culled(
            tri_mat, tri_attr, chunk_ids[h:], sids[h:], origins[h:], dirs[h:],
            ray_tile=ray_tile, tri_chunk=tri_chunk,
        )
        return jnp.concatenate([t0, t1]), jnp.concatenate([a0, a1])
    S, _, _, T = tri_mat.shape
    n_tiles = R // ray_tile
    K = chunk_ids.shape[-1]
    assert chunk_ids.shape == (N, n_tiles, K)

    F = ray_features(origins, dirs).reshape(N, n_tiles, ray_tile, 10)

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
            pl.BlockSpec((1, 1, 8, ray_tile // 8), lambda i, j, k, sids, ch: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, ray_tile, ATTR_CH), lambda i, j, k, sids, ch: (i, j, 0, 0)),
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
            flops=2 * N * R * K * tri_chunk * (10 * 4 + ATTR_CH) // 1,
            bytes_accessed=N * R * 48 + N * n_tiles * K * tri_chunk * 192,
            transcendentals=0,
        ),
    )(sids.astype(jnp.int32), chunk_ids.astype(jnp.int32), F, tri_mat, tri_attr)
    return t.reshape(N, R), attrs.reshape(N, R, ATTR_CH)


# NOTE: a whole-image-per-program kernel variant (fewer, bigger programs)
# was prototyped but trips Mosaic's scoped-VMEM accounting on this toolchain;
# revisit in round 2 (see PROGRESS.md renderer notes).
