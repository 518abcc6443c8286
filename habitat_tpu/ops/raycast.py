"""Batched triangle raycasting → RGB / Depth / Semantic sensor frames.

TPU-native replacement for habitat-sim's Magnum GL renderer (SURVEY §2.9;
reference call sites sims/habitat_simulator/habitat_simulator.py:373-435,
461-485). All N envs render in one array program: rays are generated from the
batched agent poses, intersected against the HBM-resident ``ScenePack``
triangles, and shaded flat+lambert. No GL, no host round trips, frames are
native device arrays (the reference's gpu2gpu path is moot).

The intersection core is the MXU formulation: Möller–Trumbore's four
determinants are bilinear in per-ray features F = [d, o, o×d, 1] and
per-triangle coefficients, so ray×tri testing is ONE matmul
G = F @ M, with M:(10, 4, T) giving segments (detA | t_num | u_num | v_num):

    detA  = -d·n                       (n = e1×e2)
    t_num =  o·n - v0·n
    u_num =  (o×d)·e2 + d·(v0×e2)
    v_num = -(o×d)·e1 + d·(e1×v0)

Backends:
- ``raycast_mxu_batch``: pure XLA (tests/CPU + fallback)
- ``ops.raycast_pallas.raycast_pallas_batch``: fused Pallas kernel — the
  determinant block lives in VMEM, only (t, idx) leave the core (the XLA
  path round-trips G through HBM, which dominates its runtime).
- ``raycast_rays``: scalar Möller–Trumbore oracle for tests.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from habitat_tpu.sims.scene import ScenePack
from habitat_tpu.utils.geometry import camera_rays, yaw_to_forward

_EPS = 1e-7
_TMIN = 1e-3
_TMAX = 1e6


# ---------------------------------------------------------------------------
# reference (oracle) implementation
# ---------------------------------------------------------------------------


def _mt_chunk(o, d, v0, e1, e2, valid):
    """Classic Möller–Trumbore: rays (R,3) × tri chunk (C,3) -> t (R,C)."""
    d_ = d[:, None, :]
    o_ = o[:, None, :]
    v0_ = v0[None, :, :]
    e1_ = e1[None, :, :]
    e2_ = e2[None, :, :]
    h = jnp.cross(d_, e2_)
    a = jnp.sum(e1_ * h, axis=-1)
    f = jnp.where(jnp.abs(a) > _EPS, 1.0 / jnp.where(jnp.abs(a) > _EPS, a, 1.0), 0.0)
    s = o_ - v0_
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1_)
    v = f * jnp.sum(d_ * q, axis=-1)
    t = f * jnp.sum(e2_ * q, axis=-1)
    hit = (
        (jnp.abs(a) > _EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > _TMIN)
        & valid[None, :]
    )
    return jnp.where(hit, t, _TMAX)


def raycast_rays(
    tri_v0, tri_e1, tri_e2, tri_valid, origins, dirs, chunk: int = 128
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest-hit oracle. Returns (t (R,), tri_index (R,), -1 on miss)."""
    T = tri_v0.shape[0]
    assert T % chunk == 0, (T, chunk)
    n_chunks = T // chunk
    R = origins.shape[0]

    def body(carry, xs):
        best_t, best_i = carry
        v0, e1, e2, valid, base = xs
        t = _mt_chunk(origins, dirs, v0, e1, e2, valid)
        tmin = jnp.min(t, axis=1)
        imin = jnp.argmin(t, axis=1).astype(jnp.int32) + base
        better = tmin < best_t
        return (jnp.where(better, tmin, best_t), jnp.where(better, imin, best_i)), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_t, best_i), _ = lax.scan(
        body,
        (jnp.full((R,), _TMAX, jnp.float32), jnp.full((R,), -1, jnp.int32)),
        (
            tri_v0.reshape(n_chunks, chunk, 3),
            tri_e1.reshape(n_chunks, chunk, 3),
            tri_e2.reshape(n_chunks, chunk, 3),
            tri_valid.reshape(n_chunks, chunk),
            bases,
        ),
    )
    return jnp.where(best_t >= _TMAX, _TMAX, best_t), jnp.where(
        best_t >= _TMAX, -1, best_i
    )


# ---------------------------------------------------------------------------
# MXU formulation
# ---------------------------------------------------------------------------

# tri_attr16 row layout contract (built by sims/scene.pack_scenes, consumed by
# the v14 channel-major epilogue below): [attr(8) | v0(3) | n.v0 | pad(4)].
ATTR16_NV0 = 11
# tri_verts16 row layout contract (pack_scenes <-> select_chunklets_exact):
# [v0(3) | e1(3) | e2(3) | pad(6) | valid]. Validity lives in the row so the
# exact select needs ONE wide-row gather per candidate, not a second bool one.
VERTS16_VALID = 15


def build_tri_matrix(tri_v0, tri_e1, tri_e2, tri_valid) -> np.ndarray:
    """(T,3) host arrays -> (10, 4, T) f32 coefficient matrix (see module doc).
    Segment-major layout so each determinant occupies a contiguous lane range
    after the matmul. Padding (invalid) triangles get all-zero columns."""
    n = np.cross(tri_e1, tri_e2)
    v0xe2 = np.cross(tri_v0, tri_e2)
    e1xv0 = np.cross(tri_e1, tri_v0)
    T = tri_v0.shape[0]
    M = np.zeros((10, 4, T), np.float32)
    M[0:3, 0] = -n.T
    M[3:6, 1] = n.T
    M[9, 1] = -np.sum(tri_v0 * n, axis=-1)
    M[0:3, 2] = v0xe2.T
    M[6:9, 2] = tri_e2.T
    M[0:3, 3] = e1xv0.T
    M[6:9, 3] = -tri_e1.T
    M *= np.asarray(tri_valid)[None, None, :]
    return M


def build_tri_matrix_jnp(tri_v0, tri_e1, tri_e2, valid) -> jnp.ndarray:
    """Device-side build_tri_matrix for DYNAMIC triangles (movable objects
    whose transforms change every step — reference keeps these in Bullet;
    here they are rebuilt in-jit, (..., T, 3) -> (..., 10, 4, T))."""
    n = jnp.cross(tri_e1, tri_e2)
    v0xe2 = jnp.cross(tri_v0, tri_e2)
    e1xv0 = jnp.cross(tri_e1, tri_v0)
    T = tri_v0.shape[-2]
    batch = tri_v0.shape[:-2]
    M = jnp.zeros(batch + (10, 4, T), jnp.float32)
    sw = lambda x: jnp.swapaxes(x, -1, -2)  # (...,T,3)->(...,3,T)
    M = M.at[..., 0:3, 0, :].set(-sw(n))
    M = M.at[..., 3:6, 1, :].set(sw(n))
    M = M.at[..., 9, 1, :].set(-jnp.sum(tri_v0 * n, axis=-1))
    M = M.at[..., 0:3, 2, :].set(sw(v0xe2))
    M = M.at[..., 6:9, 2, :].set(sw(tri_e2))
    M = M.at[..., 0:3, 3, :].set(sw(e1xv0))
    M = M.at[..., 6:9, 3, :].set(-sw(tri_e1))
    return M * valid[..., None, None, :]


def ray_features(origins: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """(...,3),(...,3) -> (...,10): [d, o, o×d, 1]."""
    oxd = jnp.cross(origins, dirs)
    ones = jnp.ones(origins.shape[:-1] + (1,), jnp.float32)
    return jnp.concatenate([dirs, origins, oxd, ones], axis=-1).astype(jnp.float32)


def ray_features_t(origins: jnp.ndarray, dirs: jnp.ndarray, ray_tile: int) -> jnp.ndarray:
    """(N,R,3),(N,R,3) -> (N, R/ray_tile, 16, ray_tile) TRANSPOSED features
    for raycast_pallas_index_t (rays minor = lane-exact kernel blocks; the
    row-major (N,R,10) form costs a 10->128 lane-padding relayout copy at the
    kernel boundary — 114 ms/update at bench shape, r2 trace). Rows 10:16 are
    sublane padding; channel order matches ray_features: [d, o, o x d, 1]."""
    oxd = jnp.cross(origins, dirs)
    N, R, _ = origins.shape
    F = jnp.stack(
        [
            dirs[..., 0], dirs[..., 1], dirs[..., 2],
            origins[..., 0], origins[..., 1], origins[..., 2],
            oxd[..., 0], oxd[..., 1], oxd[..., 2],
            jnp.ones((N, R), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)  # (N, 10, R)
    F = jnp.pad(F, ((0, 0), (0, 6), (0, 0)))
    return F.reshape(N, 16, R // ray_tile, ray_tile).transpose(0, 2, 1, 3)


def ray_feature_matrix(cam_pos, yaw, pitch) -> jnp.ndarray:
    """(N,3),(N,),(N,) -> (N,4,10) B with ray_features = [d_cam, 1] @ B.

    F = [d_world, o, o x d_world, 1] is bilinear in the camera-frame dir:
    d_world = R d_cam, o x d_world = skew(o) R d_cam. Row-vector form:
    B[0:3] = [R^T | 0 | -R^T skew(o) | 0], B[3] = [0 | o | 0 | 1]. Lets the
    fast render path build features with one tiny matmul against the
    constant pixel grid instead of per-pixel trig (see render_batch)."""
    from habitat_tpu.utils.geometry import view_rotation_matrix

    N = cam_pos.shape[0]
    rot = view_rotation_matrix(yaw, pitch)  # (N,3,3), d_world = R @ d_cam
    o = cam_pos.astype(jnp.float32)
    zeros = jnp.zeros((N, 3, 3), jnp.float32)
    sk = jnp.zeros((N, 3, 3), jnp.float32)
    sk = sk.at[:, 0, 1].set(-o[:, 2]).at[:, 0, 2].set(o[:, 1])
    sk = sk.at[:, 1, 0].set(o[:, 2]).at[:, 1, 2].set(-o[:, 0])
    sk = sk.at[:, 2, 0].set(-o[:, 1]).at[:, 2, 1].set(o[:, 0])
    rT = jnp.swapaxes(rot, 1, 2)
    b_top = jnp.concatenate(
        [rT, zeros, -jnp.einsum("nij,njk->nik", rT, sk)], axis=2
    )
    b_top = jnp.concatenate([b_top, jnp.zeros((N, 3, 1), jnp.float32)], axis=2)
    b_bot = jnp.concatenate(
        [
            jnp.zeros((N, 3), jnp.float32),
            o,
            jnp.zeros((N, 3), jnp.float32),
            jnp.ones((N, 1), jnp.float32),
        ],
        axis=1,
    )[:, None, :]
    return jnp.concatenate([b_top, b_bot], axis=1)


def mt_epilogue(G: jnp.ndarray, C: int):
    """Determinant segments (..., 4C) -> (t (...,C)). Shared by XLA+Pallas."""
    detA = G[..., 0 * C : 1 * C]
    tnum = G[..., 1 * C : 2 * C]
    unum = G[..., 2 * C : 3 * C]
    vnum = G[..., 3 * C : 4 * C]
    s = jnp.sign(detA)
    a = jnp.abs(detA)
    us = unum * s
    vs = vnum * s
    ts = tnum * s
    hit = (a > _EPS) & (us >= 0.0) & (vs >= 0.0) & (us + vs <= a) & (ts > _TMIN * a)
    return jnp.where(hit, tnum / jnp.where(a > _EPS, detA, 1.0), _TMAX)


def raycast_mxu_batch(
    tri_mats: jnp.ndarray,  # (N, 10, 4, T) per-env triangle matrices
    origins: jnp.ndarray,  # (N, R, 3)
    dirs: jnp.ndarray,  # (N, R, 3)
    tri_chunk: int = 128,
    ray_tile: int = 0,  # 0 = auto (bounds the live intermediate to ~128MB)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA path: batched GEMM, ray tiles (outer map) × tri chunks (inner scan)."""
    N, R, _ = origins.shape
    T = tri_mats.shape[3]
    tri_chunk = min(tri_chunk, T)
    assert T % tri_chunk == 0, (T, tri_chunk)
    n_chunks = T // tri_chunk
    if ray_tile <= 0:
        budget = 128 * 1024 * 1024 // 4
        ray_tile = max(256, budget // max(1, N * tri_chunk * 4))
        ray_tile = 1 << (ray_tile.bit_length() - 1)
    ray_tile = min(ray_tile, R)
    if R % ray_tile:
        # non-pow2 ray counts (e.g. the reference's 640x360 sensors): use
        # the largest divisor of R within the VMEM budget tile
        k = -(-R // ray_tile)
        while R % k:
            k += 1
        ray_tile = R // k
    assert R % ray_tile == 0, (R, ray_tile)
    n_tiles = R // ray_tile

    F = ray_features(origins, dirs)  # (N,R,10)
    F = F.reshape(N, n_tiles, ray_tile, 10).transpose(1, 0, 2, 3)
    # chunks: (n_chunks, N, 10, 4, C)
    Mc = tri_mats.reshape(N, 10, 4, n_chunks, tri_chunk).transpose(3, 0, 1, 2, 4)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * tri_chunk

    def per_tile(Ft):  # (N, ray_tile, 10)
        def body(carry, xs):
            best_t, best_i = carry
            M, base = xs  # (N, 10, 4, C)
            G = jax.lax.dot_general(
                Ft,
                M.reshape(N, 10, -1),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (N, ray_tile, 4C)
            t = mt_epilogue(G, tri_chunk)
            tmin = jnp.min(t, axis=-1)
            imin = jnp.argmin(t, axis=-1).astype(jnp.int32) + base
            better = tmin < best_t
            return (
                jnp.where(better, tmin, best_t),
                jnp.where(better, imin, best_i),
            ), None

        init = (
            jnp.full((N, ray_tile), _TMAX, jnp.float32),
            jnp.full((N, ray_tile), -1, jnp.int32),
        )
        (bt, bi), _ = lax.scan(body, init, (Mc, bases))
        return bt, bi

    bt, bi = lax.map(per_tile, F)  # (n_tiles, N, ray_tile)
    t = bt.transpose(1, 0, 2).reshape(N, R)
    i = bi.transpose(1, 0, 2).reshape(N, R)
    return t, jnp.where(t >= _TMAX, -1, i)


def select_chunks(
    chunk_bounds: jnp.ndarray,  # (N, NC, 4) per-env chunk spheres (xyz, r)
    origins: jnp.ndarray,  # (N, R, 3)
    dirs: jnp.ndarray,  # (N, R, 3)
    ray_tile: int,
    k: int,
    with_cnt: bool = False,
) -> jnp.ndarray:
    """Per-ray-tile top-K candidate chunks by cone/sphere culling.

    Camera rays within a tile share an origin; the tile forms a cone (axis =
    mean direction, half-angle covering the tile's rays). A chunk's bounding
    sphere is a candidate iff the cone intersects it; the K nearest candidates
    win (K*128 triangles tested instead of the whole scene — the coarse level
    of a BVH, kept flat so shapes stay static). Returns (N, n_tiles, K) int32.
    Padding/degenerate chunks (r < 0) are never selected unless nothing else
    is left.
    """
    N, R, _ = origins.shape
    n_tiles = R // ray_tile
    d = dirs.reshape(N, n_tiles, ray_tile, 3)
    axis = d.mean(axis=2)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-9)
    cos_tile = jnp.min(jnp.sum(d * axis[:, :, None, :], axis=-1), axis=2)  # (N,T)
    ang_tile = jnp.arccos(jnp.clip(cos_tile, -1.0, 1.0))

    o = origins.reshape(N, n_tiles, ray_tile, 3)[:, :, 0]  # (N,n_tiles,3) apex
    c = chunk_bounds[..., :3]  # (N,NC,3)
    r = chunk_bounds[..., 3]  # (N,NC)
    v = c[:, None, :, :] - o[:, :, None, :]  # (N,nt,NC,3)
    dist = jnp.linalg.norm(v, axis=-1)
    cos_v = jnp.sum(v * axis[:, :, None, :], axis=-1) / jnp.maximum(dist, 1e-9)
    ang_v = jnp.arccos(jnp.clip(cos_v, -1.0, 1.0))
    ang_r = jnp.arcsin(jnp.clip(r[:, None, :] / jnp.maximum(dist, 1e-9), 0.0, 1.0))
    visible = (ang_v <= ang_tile[:, :, None] + ang_r) | (dist <= r[:, None, :])
    valid = (r > 0)[:, None, :]
    valid = valid & _lod_band_ok(chunk_bounds, dist)
    score = jnp.where(visible & valid, jnp.maximum(dist - r[:, None, :], 0.0), 1e9)
    k = min(k, score.shape[-1])
    neg, idx = jax.lax.top_k(-score, k)  # nearest K
    if with_cnt:
        cnt = jnp.sum(neg > -1e8, axis=-1).astype(jnp.int32)
        return idx.astype(jnp.int32), cnt
    return idx.astype(jnp.int32)


def _lod_band_ok(chunk_bounds: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Discrete-LOD render band: a chunk competes only when the tile apex is
    within its [dmin, dmax] distance range (chunk_bounds cols 4:6; single-LOD
    packs carry [0, 1e9] = always on). Padded by the chunk radius so band
    boundaries never open gaps."""
    if chunk_bounds.shape[-1] < 6:
        return jnp.ones_like(dist, dtype=bool)
    r = chunk_bounds[..., 3][:, None, :]
    dmin = chunk_bounds[..., 4][:, None, :]
    dmax = chunk_bounds[..., 5][:, None, :]
    return ((dist + r) >= dmin) & ((dist - r) <= dmax)


def select_chunks_occluded(
    pack_tri_mat: jnp.ndarray,  # (S,10,4,T)
    chunk_bounds: jnp.ndarray,  # (N,NC,4)
    sids: jnp.ndarray,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    ray_tile: int,
    k: int,
    lowres_stride: int = 64,
    depth_margin: float = 1.0,
    pre_chunks: int = 16,
    with_cnt: bool = False,
    with_dmax: bool = False,
) -> jnp.ndarray:
    """Occlusion-aware chunk selection: a low-res raycast (1/stride of the
    rays) bounds each tile's max depth; only cone-visible chunks NEARER than
    that bound compete for the K slots — far geometry behind walls never
    wastes kernel work.

    The prepass tests a PROXY SUBSET instead of the whole scene (at HM3D
    scale a full brute prepass would cost more than the render, and
    materializing (N,10,4,T) per-env matrices OOMs at 500k+ tris). Testing a
    subset only raises the depth estimate (hits can only get nearer with
    more geometry), so the bound stays conservative: dmax_subset >=
    dmax_true, i.e. culling never drops a visible chunk that full-prepass
    culling would keep.

    Proxy choice (round-2 fix): on LOD packs the proxy is the COARSEST-LOD
    chunks (band dmax unbounded) — they tile the WHOLE scene sparsely, so
    the depth bound reflects the actual walls. The round-1 proxy (chunks
    nearest the agent) covered ~16 chunks of local floor on a 6,714-chunk
    scan, the bound degenerated to the 40m miss default, near_enough culled
    nothing, and K nearest-chunks starved real geometry (cull convergence
    0.34, BENCH large-scene r1). Nearest-to-agent remains the fallback for
    single-LOD packs."""
    N, R, _ = origins.shape
    NC = chunk_bounds.shape[1]
    n_tiles = R // ray_tile
    o_lr = origins[:, ::lowres_stride]
    d_lr = dirs[:, ::lowres_stride]
    agent = origins[:, 0]  # (N,3) shared ray origin
    cdist = jnp.linalg.norm(
        chunk_bounds[..., :3] - agent[:, None, :], axis=-1
    ) - chunk_bounds[..., 3]
    cdist = jnp.where(chunk_bounds[..., 3] > 0, cdist, 1e9)
    if chunk_bounds.shape[-1] >= 6:
        # prefer coarse-LOD chunks (scene-covering); a large distance bonus
        # keeps fine chunks out of the proxy unless there are few coarse ones
        coarse = chunk_bounds[..., 5] > 1e8
        cdist = jnp.where(coarse, cdist, cdist + 1e6)
        # proxy size in TRIS stays constant across chunk granularities
        C_here = pack_tri_mat.shape[3] // NC
        kp = min(max(pre_chunks, 192 * 128 // C_here), NC)
    else:
        kp = min(pre_chunks, NC)
    _, near_ids = jax.lax.top_k(-cdist, kp)  # (N,kp)
    S = pack_tri_mat.shape[0]
    C = pack_tri_mat.shape[3] // NC
    # chunk-major gather: (S*NC, 10, 4, C) rows, never materializing the
    # (N, 10, 4, T) per-env scene matrices (21GB at 512k tris, N=256)
    flat = pack_tri_mat.reshape(S, 10, 4, NC, C).transpose(0, 3, 1, 2, 4)
    flat = flat.reshape(S * NC, 10, 4, C)
    Mg = flat[sids[:, None] * NC + near_ids]  # (N, kp, 10, 4, C)
    Mg = Mg.transpose(0, 2, 3, 1, 4).reshape(N, 10, 4, kp * C)
    t_lr, _ = raycast_mxu_batch(Mg, o_lr, d_lr, tri_chunk=128)
    t_lr = jnp.where(t_lr > 1e5, 40.0, t_lr)  # miss -> generous bound
    per_tile = t_lr.reshape(N, n_tiles, ray_tile // lowres_stride)
    dmax = per_tile.max(axis=-1) * 1.2 + depth_margin  # (N, n_tiles)

    d = dirs.reshape(N, n_tiles, ray_tile, 3)
    axis = d.mean(axis=2)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-9)
    cos_tile = jnp.min(jnp.sum(d * axis[:, :, None, :], axis=-1), axis=2)
    ang_tile = jnp.arccos(jnp.clip(cos_tile, -1.0, 1.0))
    o = origins.reshape(N, n_tiles, ray_tile, 3)[:, :, 0]
    c = chunk_bounds[..., :3]
    r = chunk_bounds[..., 3]
    v = c[:, None, :, :] - o[:, :, None, :]
    dist = jnp.linalg.norm(v, axis=-1)
    cos_v = jnp.sum(v * axis[:, :, None, :], axis=-1) / jnp.maximum(dist, 1e-9)
    ang_v = jnp.arccos(jnp.clip(cos_v, -1.0, 1.0))
    ang_r = jnp.arcsin(jnp.clip(r[:, None, :] / jnp.maximum(dist, 1e-9), 0.0, 1.0))
    visible = (ang_v <= ang_tile[:, :, None] + ang_r) | (dist <= r[:, None, :])
    near_enough = (dist - r[:, None, :]) <= dmax[:, :, None]
    valid = (r > 0)[:, None, :]
    valid = valid & _lod_band_ok(chunk_bounds, dist)
    score = jnp.where(
        visible & valid & near_enough,
        jnp.maximum(dist - r[:, None, :], 0.0),
        1e9,
    )
    kk = min(k, score.shape[-1])
    neg, idx = jax.lax.top_k(-score, kk)
    if not with_cnt:
        if with_dmax:
            return idx.astype(jnp.int32), dmax
        return idx.astype(jnp.int32)
    # stream-kernel contract: valid survivors NEAREST-FIRST (top_k's score
    # order IS ascending min-possible-distance), tail duplicate-padded with
    # the last survivor, per-(env, tile) survivor counts. Each slot PACKS
    # the chunk's min possible distance (centimeters, 13 bits, floor —
    # rounding DOWN keeps the early-out conservative; capped at 81.9 m)
    # above the 18-bit chunk id in one i32: two separate (N*nt*K) scalar-
    # prefetch arrays overflowed the 1 MB SMEM budget at scan-bench shape
    # (2x 512 KB). Front-to-back early termination: once every ray of the
    # tile has a hit nearer than chunk c's min distance (ascending by
    # construction), no later chunk can beat it.
    valid_sel = neg > -1e8
    cnt = jnp.sum(valid_sel, axis=-1).astype(jnp.int32)  # (N, n_tiles)
    ids = idx.astype(jnp.int32)
    last = jnp.take_along_axis(
        ids, jnp.maximum(cnt - 1, 0)[..., None], axis=-1
    )
    pos = jnp.arange(kk, dtype=jnp.int32)
    ids = jnp.where(pos[None, None, :] < cnt[..., None], ids, last)
    ids = jnp.where(cnt[..., None] > 0, ids, 0)
    dmin_cm = jnp.clip(jnp.floor(-neg * 1e2), 0, 8191).astype(jnp.int32)
    dmin_cm = jnp.where(valid_sel, dmin_cm, 0)
    # duplicate-padded tail slots keep dmin 0 (never read: loop bound = cnt)
    dmin_cm = jnp.where(pos[None, None, :] < cnt[..., None], dmin_cm, 0)
    packed = (dmin_cm << 18) | ids
    if with_dmax:
        return packed.astype(jnp.int32), cnt, dmax
    return packed.astype(jnp.int32), cnt


def select_chunks_occluded_raw(
    pack_tri_mat, chunk_bounds, sids, origins, dirs, ray_tile, k, **kw
):
    """select_chunks_occluded returning UNPACKED (ids, cnt, dmax): survivor
    parent-chunk ids nearest-first (no dmin bit-packing), counts, and the
    per-tile occlusion depth bound — the v11 exact-cull level-0 input."""
    packed, cnt, dmax = select_chunks_occluded(
        pack_tri_mat, chunk_bounds, sids, origins, dirs, ray_tile, k,
        with_cnt=True, with_dmax=True, **kw,
    )
    return (packed & 0x3FFFF).astype(jnp.int32), cnt, dmax


def chunklet_aabbs(
    tri_v0: jnp.ndarray,  # (S, T, 3)
    tri_e1: jnp.ndarray,
    tri_e2: jnp.ndarray,
    tri_valid: jnp.ndarray,  # (S, T)
    c: int = 32,
) -> jnp.ndarray:
    """Per-chunklet AABBs (S, T//c, 6) = [center(3), half(3)]; empty
    chunklets get an inverted box that fails every positive-vertex test."""
    S, T, _ = tri_v0.shape
    n = T // c
    verts = jnp.stack(
        [tri_v0, tri_v0 + tri_e1, tri_v0 + tri_e2], axis=2
    ).reshape(S, n, c * 3, 3)
    m = jnp.repeat(tri_valid.reshape(S, n, c), 3, axis=2)[..., None]
    lo = jnp.min(jnp.where(m, verts, jnp.inf), axis=2)
    hi = jnp.max(jnp.where(m, verts, -jnp.inf), axis=2)
    any_v = tri_valid.reshape(S, n, c).any(axis=2)[..., None]
    lo = jnp.where(any_v, lo, 1e9)
    hi = jnp.where(any_v, hi, -1e9)
    return jnp.concatenate([(lo + hi) * 0.5, (hi - lo) * 0.5], axis=-1)


def select_chunklets_exact(
    tri_v0: jnp.ndarray,  # (S, T, 3)
    tri_e1: jnp.ndarray,
    tri_e2: jnp.ndarray,
    tri_valid: jnp.ndarray,  # (S, T)
    aabbs: jnp.ndarray,  # (S, T//c, 6) from chunklet_aabbs
    sids: jnp.ndarray,  # (N,)
    cam_pos: jnp.ndarray,  # (N, 3)
    yaw: jnp.ndarray,
    pitch: jnp.ndarray,
    planes_cam: jnp.ndarray,  # (nt, 4, 3) tile_plane_normals_cam
    ids0: jnp.ndarray,  # (N, nt, K0) L0 surviving PARENT chunk ids
    cnt0: jnp.ndarray,  # (N, nt)
    parent_c: int,  # parent chunk granularity (tris)
    c: int = 32,  # chunklet granularity (kernel gather unit)
    k_aabb: Optional[int] = None,
    k_final: Optional[int] = None,
    skip_exact: bool = True,
    verts16: Optional[jnp.ndarray] = None,
    k_exact: int = 384,
    cull_backend: str = "xla",  # "pallas": v16 in-kernel exact test
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v11 hierarchical EXACT chunklet selection (VERDICT r3 missing #1).

    Level 1 expands each L0 parent-chunk survivor into its c-granularity
    chunklets and culls by the AABB positive-vertex rule (the box corner
    most inside each tile plane — if even it is outside, every triangle in
    the box is). Level 2 runs bin_tris_tiles' EXACT 3-vertex plane test on
    the survivors' gathered triangles (same -1e-3 conservative margin —
    see bin_tris_tiles for the rounding analysis), so a culled chunklet
    provably contains no triangle any tile ray can hit: the packed-stream
    kernel result matches brute force AT THE SAME LOD-band selection
    (bands apply at parent level in L0, the band-valid oracle's rule).

    NO occlusion pre-cull: the round-3 low-res depth-prepass bound is a
    sampled-ray heuristic (1 ray per 8x8 px * 1.2 + 1 m) that provably can
    drop true winners through unsampled sightlines (a doorway ray found
    exactly that in test_exact_chunklet_culling_conservative). Occlusion is
    instead exploited EXACTLY by the kernel: survivors stream nearest-first
    (dmin packed in the high bits, v10's encoding) and early termination
    stops once every ray of the tile holds a hit nearer than the next
    chunklet's minimum possible distance.

    Measured on the 860k-tri scan bench (scripts/exp_exact_cull_stats.py):
    sphere-only c=16 admits 322 chunklets/tile; AABB c=32 admits 134; the
    exact test keeps 53.5 with a tight depth bound — the ET-reachable
    floor — and ~100-200 without one (the list the kernel streams from).

    skip_exact=True (the DEPLOYED default, round 4): L1-only, UNCAPPED,
    single packed sort. The round-4 interpret-mode kernel test caught the
    capped flow dropping true survivors (k_aabb=128 clipped an L1 set of
    138 — a real missed wall); with no cap the output is conservative by
    construction, and the extra streamed chunklets cost only ~0.26 us each
    in the kernel (U=8 amortization) — far less than the L2 pass that
    previously bounded them. k_aabb/k_final=None means Kc (uncapped);
    explicit caps remain for the L2 path and small-scene tests (a capped
    call can DROP TRUE SURVIVORS when counts exceed the cap — exactness is
    only guaranteed uncapped).

    Returns (packed (N, nt, Kf) int32 = (dmin_cm << 18) | chunklet_id,
    ascending dmin (ids tie-break), survivors first, tail duplicate-padded
    (Kf is k_final, or Kc lane-padded to a 128 multiple when uncapped);
    cnt (N, nt) int32)."""
    from habitat_tpu.utils.geometry import view_rotation_matrix

    N, nt, K0 = ids0.shape
    S, T, _ = tri_v0.shape
    NCH = T // c
    expand = parent_c // c
    Kc = K0 * expand
    R3 = view_rotation_matrix(yaw, pitch)  # (N,3,3)
    nw = jnp.einsum(
        "nij,kpj->nkpi", R3, planes_cam,
        precision=jax.lax.Precision.HIGHEST,
    )  # (N, nt, 4, 3) world inward normals

    # ---- L1: AABB positive-vertex over expanded candidates ---------------
    cand = (
        ids0[..., None] * expand
        + jnp.arange(expand, dtype=jnp.int32)[None, None, None, :]
    ).reshape(N, nt, Kc)  # (N, nt, Kc) chunklet ids
    pos0 = jnp.arange(K0, dtype=jnp.int32)
    cand_valid = jnp.broadcast_to(
        pos0[None, None, :, None] < cnt0[..., None, None],
        (N, nt, K0, expand),
    ).reshape(N, nt, Kc)  # L0 tail is padding; gate by position
    # gather chunklet AABBs at PARENT granularity (expand x 24-byte rows):
    # small-row gathers are the measured wall on this path (round-4 trace)
    NC0 = T // parent_c
    ab = aabbs.reshape(S * NC0, expand, 6)[
        sids[:, None, None] * NC0 + ids0
    ].reshape(N, nt, Kc, 6)
    ctr = ab[..., 0:3] - cam_pos[:, None, None, :]  # box center rel apex
    half = ab[..., 3:6]
    # positive vertex per plane, one plane at a time: the fused 4-plane
    # broadcast materialized (N,nt,Kc,4,3) intermediates
    inside = None
    for pl_i in range(4):
        nw_p = nw[:, :, None, pl_i, :]  # (N, nt, 1, 3)
        d_p = jnp.sum((ctr + jnp.sign(nw_p) * half) * nw_p, axis=-1)
        ok_p = d_p > -1e-3
        inside = ok_p if inside is None else (inside & ok_p)
    surv1 = inside & cand_valid

    assert NCH <= (1 << 18), "packed chunklet id is 18 bits"
    if verts16 is not None:
        # ---- round-5 PACKED-EXACT path (the deployed default when the
        # pack carries tri_verts16): the L2 any-triangle 3-vertex plane
        # test runs on the k_exact NEAREST L1 survivors via ONE 2KB-row
        # gather per chunklet ([v0|e1|e2|pad7] x 32 tris = 512 f32 lanes,
        # chunklet-major — the small-row layout of the round-4 L2 was the
        # measured wall), and any survivor BEYOND the cap passes through
        # untested. Cap overflow therefore degrades peformance only, never
        # exactness — the round-4 cap-drops-true-survivors failure mode is
        # structurally gone. Measured on the 860k-tri scan bench: L1 admits
        # 163.9 chunklets/tile, the exact test 83.9 (2x fewer kernel
        # chunk-steps); OBB and 8/16-tri sub-AABB bounds measured ~no
        # reduction (164.8 / 142.9) — the cut is inherently per-triangle
        # (different triangles separate against different planes).
        dmin = jnp.maximum(
            jnp.linalg.norm(ctr, axis=-1) - jnp.linalg.norm(half, axis=-1),
            0.0,
        )
        dmin_cm = jnp.clip(jnp.floor(dmin * 1e2), 0, 8191).astype(jnp.int32)
        packed = jnp.where(
            surv1, (dmin_cm << 18) | cand, jnp.int32(0x7FFFFFFF)
        )
        packed = lax.sort(packed, dimension=-1)  # nearest-first survivors
        cnt1 = jnp.sum(surv1, axis=-1).astype(jnp.int32)
        ka = min(k_exact, Kc)
        head = packed[..., :ka]
        ids1 = head & ((1 << 18) - 1)
        pos_a = jnp.arange(ka, dtype=jnp.int32)
        in_head = pos_a[None, None, :] < jnp.minimum(cnt1, ka)[..., None]
        if cull_backend == "pallas" and ka % 128 == 0:
            # v16 (round 5): the L2 test as a Pallas kernel — the XLA form
            # below is data-movement bound (~36 of 78.8 ms select at
            # N=256: 22 ms lanes-to-sublanes relayout of the gathered
            # rows + 12 x 0.77 ms reduces). The kernel streams the head's
            # verts16 rows per (env, tile) and evaluates all 12 plane
            # conditions + validity as one blockdiag-masked MXU matmul.
            from habitat_tpu.ops.raycast_pallas import cullmask_pallas_t

            tri_pass = cullmask_pallas_t(
                verts16, sids, head, jnp.minimum(cnt1, ka), nw, cam_pos,
                c=c,
            )
            keep_head = jnp.any(tri_pass > 0.5, axis=-1) & in_head
        else:
            # ONE wide-row gather: (S*NCH, 512) lane-perfect rows keyed by
            # chunklet id; validity rides in lane VERTS16_VALID (a separate
            # tri_valid gather is a 32-byte-row gather — the measured-slow
            # class). NEGATIVES (round 5, N=256): gathering with (c, 16)
            # trailing block dims: 227.8 ms (vs 79.5); one batched
            # dot_general against a (16, 16) component map: 89.2 ms. The
            # loop + reshape is the fast XLA formulation; the Pallas
            # branch above is the only thing measured faster.
            rows = verts16.reshape(S * NCH, c * 16)
            p16 = rows[sids[:, None, None] * NCH + ids1].reshape(
                N, nt, ka, c, 16
            )
            vgood = p16[..., VERTS16_VALID] > 0.5
            rel0 = p16[..., 0:3] - cam_pos[:, None, None, None, :]
            eps = -1e-3
            out_any = None
            for pl_i in range(4):
                nw_p = nw[:, :, None, None, pl_i, :]
                d0 = jnp.sum(rel0 * nw_p, axis=-1)
                de1 = jnp.sum(p16[..., 3:6] * nw_p, axis=-1)
                de2 = jnp.sum(p16[..., 6:9] * nw_p, axis=-1)
                out_p = (d0 < eps) & (d0 + de1 < eps) & (d0 + de2 < eps)
                out_any = out_p if out_any is None else (out_any | out_p)
            keep_head = jnp.any(~out_any & vgood, axis=-1) & in_head
        head2 = jnp.where(keep_head, head, jnp.int32(0x7FFFFFFF))
        # compaction: full-Kc re-sort. A head-only sort + shifted
        # take_along_axis gap-close was tried (round 5) and measured 2.8x
        # SLOWER overall (223.7 vs 79.5 ms select at N=256): the per-lane
        # dynamic gather along the 2560-lane minor axis lowers to a
        # generic gather that costs far more than the sort it saves.
        packed = jnp.concatenate([head2, packed[..., ka:]], axis=-1)
        packed = lax.sort(packed, dimension=-1)  # push culled to the tail
        cnt2 = (
            jnp.sum(keep_head, axis=-1)
            + jnp.maximum(cnt1 - ka, 0)
        ).astype(jnp.int32)
        kf = Kc if k_final is None else min(k_final, Kc)
        kf = -(-kf // 128) * 128
        if kf <= Kc:
            packed = packed[..., :kf]
        else:
            packed = jnp.pad(packed, ((0, 0), (0, 0), (0, kf - Kc)))
        cnt2 = jnp.minimum(cnt2, kf)
        last = jnp.take_along_axis(
            packed, jnp.maximum(cnt2 - 1, 0)[..., None], axis=-1
        )
        posf = jnp.arange(kf, dtype=jnp.int32)
        packed = jnp.where(
            posf[None, None, :] < cnt2[..., None], packed, last
        )
        packed = jnp.where(cnt2[..., None] > 0, packed, 0)
        return packed.astype(jnp.int32), cnt2

    if skip_exact:
        # L1-only path: ONE packed sort over ALL Kc candidates,
        # uncapped unless the caller says otherwise. (The packed
        # (dmin << 18 | id) key already id-orders equal-dmin ties, so the
        # id-argsort compaction the L2 path needs is redundant here; and
        # the round-4 interpret test proved caps drop true survivors.)
        dmin = jnp.maximum(
            jnp.linalg.norm(ctr, axis=-1) - jnp.linalg.norm(half, axis=-1),
            0.0,
        )
        dmin_cm = jnp.clip(jnp.floor(dmin * 1e2), 0, 8191).astype(jnp.int32)
        packed = jnp.where(
            surv1, (dmin_cm << 18) | cand, jnp.int32(0x7FFFFFFF)
        )
        packed = lax.sort(packed, dimension=-1)
        cnt2 = jnp.sum(surv1, axis=-1).astype(jnp.int32)
        kf = Kc if k_final is None else min(k_final, Kc)
        kf = -(-kf // 128) * 128  # kernel SMEM row DMA needs 128-lane mult
        if kf <= Kc:
            packed = packed[..., :kf]
        else:
            packed = jnp.pad(packed, ((0, 0), (0, 0), (0, kf - Kc)))
        cnt2 = jnp.minimum(cnt2, kf)
        last = jnp.take_along_axis(
            packed, jnp.maximum(cnt2 - 1, 0)[..., None], axis=-1
        )
        posf = jnp.arange(kf, dtype=jnp.int32)
        packed = jnp.where(posf[None, None, :] < cnt2[..., None], packed, last)
        packed = jnp.where(cnt2[..., None] > 0, packed, 0)
        return packed.astype(jnp.int32), cnt2

    # compact SORTED BY CHUNKLET ID (L0's top_k emits nearest-first parent
    # order; the L2 gather needs a compact list): value-sort survivors' ids
    # with culled slots pushed to a big sentinel
    ka = min(k_aabb or 512, Kc)
    key1 = jnp.where(surv1, cand, jnp.int32(1 << 30))
    ord1 = jnp.argsort(key1, axis=-1)[..., :ka]  # candidate slots, id-sorted
    ids1 = jnp.take_along_axis(cand, ord1, axis=-1)  # (N, nt, ka)
    cnt1 = jnp.minimum(jnp.sum(surv1, axis=-1), ka).astype(jnp.int32)
    ctr1 = jnp.take_along_axis(ctr, ord1[..., None], axis=2)
    half1 = jnp.take_along_axis(half, ord1[..., None], axis=2)

    # ---- L2: exact any-triangle 3-vertex plane test -----------------------
    # one PACKED 1.1KB-row gather of [v0|e1|e2] per chunklet (three
    # separate 384-byte gathers measured ~3x slower); per-plane loop keeps
    # the dot intermediates at (N,nt,ka,c) instead of (N,nt,ka,c,4,3). A
    # lax.map-slabbed variant measured 2.2x SLOWER (543 vs 249 ms select —
    # sequential slabs serialize the gathers), so this stays one pass.
    verts9 = jnp.concatenate(
        [tri_v0, tri_e1, tri_e2], axis=-1
    ).reshape(S * NCH, c, 9)
    flat_key = sids[:, None, None] * NCH + ids1
    p9 = verts9[flat_key]  # (N, nt, ka, c, 9)
    vgood = tri_valid.reshape(S * NCH, c)[flat_key]  # (N, nt, ka, c)
    rel0 = p9[..., 0:3] - cam_pos[:, None, None, None, :]
    eps = -1e-3
    out_any = None
    for pl_i in range(4):
        nw_p = nw[:, :, None, None, pl_i, :]  # (N, nt, 1, 1, 3)
        d0 = jnp.sum(rel0 * nw_p, axis=-1)  # (N, nt, ka, c)
        de1 = jnp.sum(p9[..., 3:6] * nw_p, axis=-1)
        de2 = jnp.sum(p9[..., 6:9] * nw_p, axis=-1)
        out_p = (d0 < eps) & (d0 + de1 < eps) & (d0 + de2 < eps)
        out_any = out_p if out_any is None else (out_any | out_p)
    ch_in = jnp.any(~out_any & vgood, axis=-1)  # (N, nt, ka)
    pos1 = jnp.arange(ka, dtype=jnp.int32)
    surv2 = ch_in & (pos1[None, None, :] < cnt1[..., None])
    # pack (dmin_cm << 18 | id) — v10's stream encoding: the kernel streams
    # nearest-first and EARLY-TERMINATES once every ray beats the next
    # chunklet's min possible distance. dmin from the box, FLOORED (rounding
    # down keeps the early-out conservative), capped at 81.9 m.
    assert NCH <= (1 << 18), "packed chunklet id is 18 bits"
    dmin1 = jnp.maximum(
        jnp.linalg.norm(ctr1, axis=-1) - jnp.linalg.norm(half1, axis=-1), 0.0
    )
    dmin_cm = jnp.clip(jnp.floor(dmin1 * 1e2), 0, 8191).astype(jnp.int32)
    packed = (dmin_cm << 18) | ids1
    kf = min(k_final or ka, ka)
    key2 = jnp.where(surv2, packed, jnp.int32(0x7FFFFFFF))
    packed2 = jnp.sort(key2, axis=-1)[..., :kf]  # ascending dmin, id ties
    cnt2 = jnp.minimum(jnp.sum(surv2, axis=-1), kf).astype(jnp.int32)
    # duplicate-pad the tail with the last survivor (DMA-elision contract)
    last = jnp.take_along_axis(
        packed2, jnp.maximum(cnt2 - 1, 0)[..., None], axis=-1
    )
    posf = jnp.arange(kf, dtype=jnp.int32)
    packed2 = jnp.where(posf[None, None, :] < cnt2[..., None], packed2, last)
    packed2 = jnp.where(cnt2[..., None] > 0, packed2, 0)
    return packed2.astype(jnp.int32), cnt2


def tile_plane_normals_cam(
    hfov_rad: float, height: int, width: int, th: int, tw: int
) -> np.ndarray:
    """Inward side-plane normals of each screen-tile frustum, camera frame.

    Tiles raster row-major over (height//th, width//tw); rays of tile j are
    the row-major pixels of that block (for tw == width this is exactly the
    kernel's consecutive-ray tiling). Planes pass through the camera apex and
    the tile's outermost pixel-center rays padded outward by half a pixel:
    for the unnormalized pixel dir (px, py, -1),
      left   px >= x_lo  <=>  dot(( 1, 0,  x_lo), d) >= 0
      right  px <= x_hi  <=>  dot((-1, 0, -x_hi), d) >= 0
      bottom py >= y_lo  <=>  dot(( 0, 1,  y_lo), d) >= 0
      top    py <= y_hi  <=>  dot(( 0,-1, -y_hi), d) >= 0
    Returns (n_tiles, 4, 3) float32. A triangle with ALL THREE vertices
    outside ONE plane cannot be hit by any ray of the tile: every tile dir d
    has dot(n, d) >= 0, so ray points o + t d satisfy dot(n, p - o) >= 0,
    while every point of the triangle has dot(n, p - o) < 0.
    """
    fx = float(np.tan(hfov_rad / 2.0))
    aspect = height / width
    xs = np.linspace(-fx, fx, width)
    ys = np.linspace(fx * aspect, -fx * aspect, height)
    dx = xs[1] - xs[0] if width > 1 else fx
    dy = abs(ys[1] - ys[0]) if height > 1 else fx * aspect
    nty, ntx = height // th, width // tw
    planes = np.zeros((nty, ntx, 4, 3), np.float32)
    for ty in range(nty):
        for tx in range(ntx):
            x_lo = xs[tx * tw] - 0.5 * dx
            x_hi = xs[tx * tw + tw - 1] + 0.5 * dx
            y_hi = ys[ty * th] + 0.5 * dy  # ys descends
            y_lo = ys[ty * th + th - 1] - 0.5 * dy
            planes[ty, tx, 0] = (1.0, 0.0, x_lo)
            planes[ty, tx, 1] = (-1.0, 0.0, -x_hi)
            planes[ty, tx, 2] = (0.0, 1.0, y_lo)
            planes[ty, tx, 3] = (0.0, -1.0, -y_hi)
    return planes.reshape(nty * ntx, 4, 3)


def bin_tris_tiles(
    tri_v0: jnp.ndarray,  # (S, T, 3)
    tri_e1: jnp.ndarray,
    tri_e2: jnp.ndarray,
    tri_valid: jnp.ndarray,  # (S, T)
    sids: jnp.ndarray,  # (N,)
    cam_pos: jnp.ndarray,  # (N, 3)
    yaw: jnp.ndarray,
    pitch: jnp.ndarray,
    planes_cam: jnp.ndarray,  # (nt, 4, 3) from tile_plane_normals_cam
) -> jnp.ndarray:
    """Conservative per-screen-tile triangle culling flags.

    Returns culled (N, nt, T) bool. EXACT-conservative: a culled triangle
    cannot be hit by any ray of its tile (see tile_plane_normals_cam), so
    dropping culled triangles reproduces the brute-force result
    bit-for-bit.
    """
    from habitat_tpu.utils.geometry import view_rotation_matrix

    hi = jax.lax.Precision.HIGHEST
    R = view_rotation_matrix(yaw, pitch)  # (N,3,3), d_world = R @ d_cam
    # HIGHEST throughout: at default precision the bf16 passes round these
    # ~scene-scale dots by up to ~0.04 and misclassify borderline vertices —
    # measured as 1.7k/2k true-winner culls on the bench scenes (round 3).
    # The -1e-3 margin absorbs the remaining f32 rounding of both this test
    # and the kernel's G products (conservative: keeps, never culls, ties).
    nw = jnp.einsum("nij,kpj->nkpi", R, planes_cam, precision=hi)
    v0 = tri_v0[sids]  # (N,T,3)
    e1 = tri_e1[sids]
    e2 = tri_e2[sids]
    rel0 = v0 - cam_pos[:, None, :]
    # dots for the 3 vertices: d0 = n.(v0-o), d1 = d0 + n.e1, d2 = d0 + n.e2
    d0 = jnp.einsum("nkpc,ntc->nkpt", nw, rel0, precision=hi)  # (N,nt,4,T)
    de1 = jnp.einsum("nkpc,ntc->nkpt", nw, e1, precision=hi)
    de2 = jnp.einsum("nkpc,ntc->nkpt", nw, e2, precision=hi)
    eps = -1e-3
    out_all = (d0 < eps) & (d0 + de1 < eps) & (d0 + de2 < eps)  # 3 verts out
    return jnp.any(out_all, axis=2) | ~tri_valid[sids][:, None, :]


def bin_tris_tiles_order(
    tri_v0, tri_e1, tri_e2, tri_valid, sids, cam_pos, yaw, pitch, planes_cam
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tri binning as (order, cnt): survivors first in original index
    order (stable sort), cnt survivors per (env, tile)."""
    culled = bin_tris_tiles(
        tri_v0, tri_e1, tri_e2, tri_valid, sids, cam_pos, yaw, pitch,
        planes_cam,
    )
    cnt = jnp.sum(~culled, axis=-1).astype(jnp.int32)  # (N, nt)
    order = jnp.argsort(culled, axis=-1, stable=True).astype(jnp.int32)
    return order, cnt


def select_chunks_frustum(
    tri_v0: jnp.ndarray,  # (S, T, 3)
    tri_e1: jnp.ndarray,
    tri_e2: jnp.ndarray,
    tri_valid: jnp.ndarray,  # (S, T)
    sids: jnp.ndarray,  # (N,)
    cam_pos: jnp.ndarray,  # (N, 3)
    yaw: jnp.ndarray,
    pitch: jnp.ndarray,
    planes_cam: jnp.ndarray,  # (nt, 4, 3) from tile_plane_normals_cam
    tri_chunk: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chunk-granularity conservative frustum culling for the tile-culled
    kernel: a chunk survives for an (env, tile) iff any of its triangles
    does under bin_tris_tiles' vertex-plane test.

    Returns (chunk_ids (N, nt, K=T//C) int32, cnt (N, nt) int32):
    survivors first in ascending chunk order (closest-hit tie-breaking
    unchanged), the tail PADDED WITH THE LAST SURVIVOR so the kernel's
    consecutive-duplicate index_map values elide the tail DMAs (re-testing
    the duplicate is prevented by the k < cnt gate). cnt == 0 pads with
    chunk 0 (fully gated)."""
    culled = bin_tris_tiles(
        tri_v0, tri_e1, tri_e2, tri_valid, sids, cam_pos, yaw, pitch,
        planes_cam,
    )
    N, nt, T = culled.shape
    C = tri_chunk
    K = T // C
    surv_chunk = jnp.any(~culled.reshape(N, nt, K, C), axis=-1)  # (N,nt,K)
    cnt = jnp.sum(surv_chunk, axis=-1).astype(jnp.int32)
    ids = jnp.argsort(~surv_chunk, axis=-1, stable=True).astype(jnp.int32)
    # duplicate-pad the tail with the last survivor
    last = jnp.take_along_axis(
        ids, jnp.maximum(cnt - 1, 0)[:, :, None], axis=-1
    )  # (N, nt, 1)
    kk = jnp.arange(K, dtype=jnp.int32)
    ids = jnp.where(kk[None, None, :] < cnt[:, :, None], ids, last)
    return ids, cnt


def select_chunks_hier(
    chunk_bounds: jnp.ndarray,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    kernel_tile: int,
    sub: int,
    k: int,
) -> jnp.ndarray:
    """Tighter-cone selection: cull on kernel_tile/sub sub-tiles, then union
    the sub-tile lists per kernel tile -> (N, n_tiles, sub*k) (duplicates are
    harmless for closest-hit). The kernel tile stays >=1024 (Mosaic layout),
    the CONES shrink by ~sub^0.5."""
    ids = select_chunks(chunk_bounds, origins, dirs, kernel_tile // sub, k)
    N, n_sub, K = ids.shape
    return ids.reshape(N, n_sub // sub, sub * K)


def exact_t_from_hit(tri_v0, sids, idx, attrs, origins, dirs, t_kernel):
    """Reconstruct EXACT f32 hit distance from the winner's plane.

    For reduced-precision kernel variants whose t only decides ORDERING:
    given the winner's UNIT normal (attrs[...,0:3]) and any vertex v0 of it,
    t = n·(v0 - o) / n·d in f32 — per-ray cost, not per-ray-tri. Falls back
    to the kernel t on grazing hits (n·d ≈ 0). Unused on the current f32
    kernels (their fold t is already exact); kept for bf16 experiments."""
    v0g = tri_v0[sids[:, None], jnp.maximum(idx, 0)]  # (N,R,3)
    n = attrs[..., 0:3]
    nd = jnp.sum(n * dirs, axis=-1)
    num = jnp.sum(n * (v0g - origins), axis=-1)
    safe = jnp.abs(nd) > 1e-6
    t_ex = num / jnp.where(safe, nd, 1.0)
    ok = (idx >= 0) & safe & (t_ex > 0)
    return jnp.where(ok, t_ex, t_kernel)


def _pick_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    try:
        dev = jax.config.jax_default_device
        if dev is not None:
            return "pallas" if dev.platform == "tpu" else "xla"
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    except Exception:
        return "xla"


# ---------------------------------------------------------------------------
# full sensor rendering
# ---------------------------------------------------------------------------


def render_batch(
    pack: ScenePack,
    sids: jnp.ndarray,  # (N,)
    cam_pos: jnp.ndarray,  # (N,3)
    yaw: jnp.ndarray,  # (N,)
    pitch: jnp.ndarray,  # (N,)
    *,
    height: int,
    width: int,
    hfov_deg: float = 90.0,
    max_depth: float = 10.0,
    min_depth: float = 0.0,
    normalize_depth: bool = True,
    tri_chunk: int = 128,
    ray_tile: int = 0,
    backend: str = "auto",
    dynamic: Optional[Dict[str, jnp.ndarray]] = None,
    cull_k: Optional[int] = None,
    projection: str = "pinhole",  # pinhole | equirect | fisheye
) -> Dict[str, jnp.ndarray]:
    """Render all envs: (N,H,W,C) frames, one fused raycast.

    The reference needs N worker processes + a cross-process batch renderer
    (core/batch_rendering/) for the same job; here it is one array program.
    Depth semantics match HabitatSimDepthSensor (habitat_simulator.py:139-199):
    planar z-depth clipped to [min_depth, max_depth], normalized if requested.

    dynamic: optional per-env movable geometry (rearrangement objects —
    reference renders these via Bullet-transformed nodes). Dict with
    v0/e1/e2 (N,Td,3), valid (N,Td), color (N,Td,3), sem (N,Td); tested in a
    second (small, XLA) pass merged by closest hit.
    """
    from habitat_tpu.utils.geometry import equirect_rays, fisheye_rays

    N = sids.shape[0]
    # backend="stream" forces the v10 nearest-first stream kernel on the
    # blocked large-scene path (the v11 exact-cull path is the default)
    stream_mode = backend == "stream"
    if stream_mode:
        backend = "pallas"
    be_early = _pick_backend(backend)
    n_chunks_early = pack.tri_mat.shape[3] // 128
    # cull_k=None -> auto: the small/mid-scene path boundary stays at the
    # historical 48 (96-chunk scenes and below keep the whole-scene-in-VMEM
    # fused kernels), while the large-scene STREAM path deploys K=160 — the
    # measured exactness knee on the scan bench (K=96: hitmatch 0.979,
    # K=160: 1.0 / t-agree 0.9994 vs the band-valid all-chunks oracle).
    cull_boundary = cull_k if cull_k is not None else 48
    if cull_k is None:
        cull_k = 160
    if (
        be_early == "pallas"
        and projection == "pinhole"
        and dynamic is None
        and (height * width) % 1024 == 0
        and not (n_chunks_early > 2 * cull_boundary)
    ):
        # FAST PATH: matrix ray generation. Pinhole rays are a CONSTANT
        # camera-frame pixel grid rotated per env, and the MT ray features
        # F = [d, o, o x d, 1] are bilinear in [d_cam, 1], so F is one tiny
        # (R,4)x(N,4,10) einsum against ray_feature_matrix(o, yaw, pitch)
        # instead of per-pixel-per-env trig + cross products (profiled at
        # ~25% of render time at N=256). dirs for shading = F[..., 0:3].
        from habitat_tpu.ops.raycast_pallas import (
            group_tri_mat,
            raycast_pallas_fused_t,
        )

        d_cam = camera_rays(
            jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(hfov_deg), height, width
        ).reshape(-1, 3)
        B = ray_feature_matrix(cam_pos, yaw, pitch)  # (N, 4, 10)
        d_aug = jnp.concatenate(
            [d_cam, jnp.ones((d_cam.shape[0], 1), jnp.float32)], axis=-1
        )
        # v7: the kernel builds the transposed ray features F = B^T @ [d,1]^T
        # in-kernel from SMEM scalars (the v5 HBM feature tensor + its einsum
        # cost 20 ms/update, r2 trace raycast.py:563). Attribute extraction
        # stays in XLA as a transposed one-hot dot — (N,8,T)@(N,T,R) with
        # rays in lanes (the in-kernel per-chunk variant measured slower,
        # see _fused_kernel_t docstring). Shading is CHANNEL-MAJOR; only the
        # final u8 rgb pays a (N,3,R)->(N,R,3) relayout.
        R = d_aug.shape[0]
        ray_tile = min(2048, R)
        n_tiles = R // ray_tile
        d_t = jnp.pad(
            d_aug.reshape(n_tiles, ray_tile, 4).transpose(0, 2, 1),
            ((0, 0), (0, 4), (0, 0)),
        )  # (n_tiles, 8, Rt)
        Bt = jnp.pad(B.transpose(0, 2, 1), ((0, 0), (0, 6), (0, 0)))  # (N,16,4)
        T = pack.tri_attr.shape[1]
        # v8 small/mid-scene path: conservative per-screen-tile frustum
        # culling at C=32 chunk granularity (select_chunks_frustum) feeds
        # the dynamic-count fused kernel — hit-test VPU work (the brute
        # kernel's measured floor) scales with the surviving chunk count
        # while keeping the whole-scene-in-VMEM layout. Beyond 4096 tris
        # the O(T)-per-tile culling einsums grow past the kernel saving;
        # very large scenes use the occlusion-culled path below.
        use_sel = T <= 4096 and ray_tile % width == 0 and T % 32 == 0
        sky = jnp.array([0.65, 0.75, 0.9], jnp.float32)
        if use_sel:
            from habitat_tpu.ops.raycast_pallas import (
                raycast_pallas_fused_sel_t,
            )

            th = ray_tile // width
            planes = jnp.asarray(
                tile_plane_normals_cam(
                    np.deg2rad(hfov_deg), height, width, th, width
                )
            )
            ids, cnt = select_chunks_frustum(
                pack.tri_v0, pack.tri_e1, pack.tri_e2, pack.tri_valid,
                sids, cam_pos, yaw, pitch, planes, tri_chunk=32,
            )
            t, idx = raycast_pallas_fused_sel_t(
                group_tri_mat(pack.tri_mat, tri_chunk=32),
                sids, ids, cnt, d_t, Bt, ray_tile=ray_tile, tri_chunk=32,
            )
        else:
            t, idx = raycast_pallas_fused_t(
                group_tri_mat(pack.tri_mat),
                sids,
                d_t,
                Bt,
                ray_tile=ray_tile,
            )
        hit = idx >= 0
        # extraction table carries v0 alongside the display attrs so the
        # epilogue can recover t PLANE-EXACTLY: the kernel's default-
        # precision G matmul leaves ~bf16 mantissa error in the determinant
        # ratio (7.5mm median / 93mm p99 depth error vs the CPU f32
        # reference, round 3) — t = n.(v0 - o) / (n.d) recomputed in exact
        # f32 removes it. HIGHEST keeps the one-hot COPY exact (default
        # bf16 passes round v0/n into a 15-40mm bimodal tail).
        # attribute extraction: XLA transposed one-hot dot. An in-VMEM
        # Pallas one-hot kernel (build each (T, Rt) one-hot in VMEM, never
        # ship it to HBM) was built and MEASURED NEGATIVE in round 5:
        # render32 236.4 ms vs 221.8 clean at the headline shape — XLA
        # already keeps this fused well, and the render is actually bound
        # by the raycast kernel's VPU ray-tri floor (4.8 of 6.9 ms/frame,
        # single-frame trace). Experiment + kernel preserved in
        # scripts/exp_onehot_attr_kernel.py.
        table_s = jnp.concatenate(
            [
                jnp.swapaxes(pack.tri_attr, 1, 2),  # (S,8,T)
                jnp.swapaxes(pack.tri_v0, 1, 2),  # (S,3,T)
            ],
            axis=1,
        )  # (S, 11, T)
        oh = (
            jnp.arange(T, dtype=idx.dtype)[None, :, None]
            == idx[:, None, :]
        ).astype(jnp.float32)  # (N,T,R)
        attrs_t = jax.lax.dot_general(
            table_s[sids],
            oh,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * hit[:, None, :].astype(jnp.float32)  # (N,11,R)
        dirs_t = jnp.einsum(
            "rk,nkf->nfr",
            d_aug,
            B[..., 0:3],
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, 3, R) world-space dirs
        nd = jnp.sum(attrs_t[:, 0:3] * dirs_t, axis=1)  # (N,R) signed n.d
        num = jnp.sum(
            attrs_t[:, 0:3]
            * (attrs_t[:, 8:11] - cam_pos.astype(jnp.float32)[:, :, None]),
            axis=1,
        )  # (N,R) n.(v0 - o)
        ok = hit & (jnp.abs(nd) > 1e-6)
        t_pl = jnp.where(ok, num / jnp.where(ok, nd, 1.0), t)
        z = t_pl * (-d_cam[None, :, 2])
        z = jnp.where(hit, z, max_depth)
        z = jnp.clip(z, min_depth, max_depth)
        if normalize_depth:
            z = (z - min_depth) / (max_depth - min_depth)
        depth = z.reshape(N, height, width, 1).astype(jnp.float32)
        lambert = jnp.abs(nd)
        shade = 0.35 + 0.65 * lambert
        rgb_t = jnp.where(
            hit[:, None, :], attrs_t[:, 3:6] * shade[:, None, :], sky[None, :, None]
        )
        rgb_u8 = (
            jnp.clip(rgb_t * 255.0, 0, 255)
            .astype(jnp.uint8)
            .transpose(0, 2, 1)
            .reshape(N, height, width, 3)
        )
        sem = jnp.where(hit, jnp.round(attrs_t[:, 6]).astype(jnp.int32), 0)
        return {
            "rgb": rgb_u8,
            "depth": depth,
            "semantic": sem.reshape(N, height, width, 1),
        }

    if projection == "equirect":
        ray_fn = lambda y, p: equirect_rays(y, p, height, width)
    elif projection == "fisheye":
        ray_fn = lambda y, p: fisheye_rays(y, p, jnp.deg2rad(hfov_deg * 2), height, width)
    else:
        ray_fn = lambda y, p: camera_rays(y, p, jnp.deg2rad(hfov_deg), height, width)
    dirs = jax.vmap(ray_fn)(yaw, pitch).reshape(N, -1, 3)
    R = dirs.shape[1]
    origins = jnp.broadcast_to(cam_pos[:, None, :], (N, R, 3))

    be = _pick_backend(backend)
    if be == "pallas":
        from habitat_tpu.ops.raycast_pallas import (
            _gather_attrs,
            raycast_pallas_index_t,
        )

        n_chunks = pack.tri_mat.shape[3] // 128
        if n_chunks > 2 * cull_boundary and R % 1024 == 0:
            # large scene: occlusion-aware per-ray-tile culling (low-res
            # depth prepass bounds each tile's max depth; the K nearest
            # cone-visible chunks within that bound are tested) — work
            # scales with K, not scene size.
            #
            # Ray tiles are COMPACT PIXEL BLOCKS (32x32), not row strips:
            # a 128-wide strip's cone has ~46 deg half-angle in EVERY
            # direction (the horizontal FOV dominates), so near-floor
            # chunks pass every strip's cone test and flood the K slots;
            # a 32x32 block cone is ~23 deg and discriminates vertically.
            blocked = (
                projection == "pinhole" and height % 32 == 0 and width % 32 == 0
            )
            if blocked:
                def to_blocks(x):
                    tail = x.shape[2:]
                    x = x.reshape((N, height // 32, 32, width // 32, 32) + tail)
                    x = jnp.swapaxes(x, 2, 3)
                    return x.reshape((N, R) + tail)

                def from_blocks(x):
                    tail = x.shape[2:]
                    x = x.reshape((N, height // 32, width // 32, 32, 32) + tail)
                    x = jnp.swapaxes(x, 2, 3)
                    return x.reshape((N, R) + tail)

                origins_c, dirs_c = to_blocks(origins), to_blocks(dirs)
            else:
                origins_c, dirs_c = origins, dirs
            if blocked:
                d_cam_l = camera_rays(
                    jnp.float32(0.0), jnp.float32(0.0),
                    jnp.deg2rad(hfov_deg), height, width,
                ).reshape(-1, 3)
                dcb = jnp.swapaxes(
                    d_cam_l.reshape(height // 32, 32, width // 32, 32, 3),
                    1, 2,
                ).reshape(R, 3)  # (R,3) camera frame, 32x32 block order
                d_aug_l = jnp.concatenate(
                    [dcb, jnp.ones((R, 1), jnp.float32)], axis=-1
                )
                nt_l = R // 1024
                d_t_l = jnp.pad(
                    d_aug_l.reshape(nt_l, 1024, 4).transpose(0, 2, 1),
                    ((0, 0), (0, 4), (0, 0)),
                )  # (nt, 8, 1024)
                B_l = ray_feature_matrix(cam_pos, yaw, pitch)
                Bt_l = jnp.pad(
                    B_l.transpose(0, 2, 1), ((0, 0), (0, 6), (0, 0))
                )
                C_big = pack.tri_mat.shape[3] // pack.chunk_bounds.shape[1]
                if not stream_mode and (pack.tri_mat.shape[3] % 32 == 0):
                    # v11 EXACT-CULL packed stream (default): hierarchical
                    # cone -> AABB -> exact 3-vertex plane culling shrinks
                    # the per-tile candidate set to the provable survivors
                    # (~75 x 32-tri chunklets/tile on the scan bench vs
                    # v10's ~145 x 256-tri chunks), streamed nearest-first
                    # U-at-a-time through v10-sized matmuls with exact
                    # in-kernel early termination (~54 effective).
                    from habitat_tpu.ops.raycast_pallas import (
                        group_tri_mat_pad16,
                        raycast_pallas_exactsel_t,
                    )

                    ids0, cnt0 = select_chunks(
                        pack.chunk_bounds[sids], origins_c, dirs_c,
                        1024, max(cull_k, 320), with_cnt=True,
                    )
                    planes_l = jnp.asarray(
                        tile_plane_normals_cam(
                            np.deg2rad(hfov_deg), height, width, 32, 32
                        )
                    )
                    # precomputed pack-time tables when present (scan-scale
                    # packs precompute them; regrouping alone measured
                    # 9.8 ms/frame — scene-constant work does not belong in
                    # the per-step render)
                    ab = (
                        pack.chunklet_ab32
                        if pack.chunklet_ab32 is not None
                        else chunklet_aabbs(
                            pack.tri_v0, pack.tri_e1, pack.tri_e2,
                            pack.tri_valid, c=32,
                        )
                    )
                    gm32 = (
                        pack.tri_mat_g32
                        if pack.tri_mat_g32 is not None
                        else group_tri_mat_pad16(pack.tri_mat, 32)
                    )
                    ids, cnt = select_chunklets_exact(
                        pack.tri_v0, pack.tri_e1, pack.tri_e2,
                        pack.tri_valid, ab, sids, cam_pos, yaw, pitch,
                        planes_l, ids0, cnt0,
                        parent_c=C_big, c=32, skip_exact=True,
                        # round 5: packed-exact L2 halves the streamed
                        # candidate set (163.9 -> 83.9 chunklets/tile on
                        # the scan bench) with overflow-passthrough
                        # exactness; packs without the verts table keep
                        # the L1-only behavior
                        verts16=pack.tri_verts16,
                    )
                    t, idx = raycast_pallas_exactsel_t(
                        gm32, sids, ids, cnt, d_t_l, Bt_l,
                        ray_tile=1024, tri_chunk=32,
                    )
                else:
                    # v10 STREAM path (backend="stream"): nearest-first
                    # chunk streaming with in-kernel early termination.
                    from habitat_tpu.ops.raycast_pallas import (
                        group_tri_mat_pad16,
                        raycast_pallas_stream_t,
                    )

                    ids, cnt = select_chunks_occluded(
                        pack.tri_mat, pack.chunk_bounds[sids], sids,
                        origins_c, dirs_c, 1024, cull_k, with_cnt=True,
                    )
                    t, idx = raycast_pallas_stream_t(
                        group_tri_mat_pad16(pack.tri_mat, C_big),
                        sids, ids, cnt, d_t_l, Bt_l,
                        ray_tile=1024, tri_chunk=C_big,
                    )
                if pack.tri_attr16 is not None:
                    # v14 CHANNEL-MAJOR epilogue (round 4): every (N,R,c)
                    # intermediate with a 3/8/16-wide minor dim tiles to
                    # 128 lanes on TPU, so the old channel-minor epilogue
                    # moved ~16-40x its real bytes (measured 30.8 ms at
                    # N=64 — 36% of render — while the idx row-gather alone
                    # is 7 ms; scripts/exp_v14_epilogue.py). Everything
                    # after the ONE row gather runs as (N,c,R) with rays
                    # packing the lanes, mirroring the fused path above.
                    # Round 5: the dynamic-geometry pass merges here in the
                    # SAME channel-major block order (previously any dynamic
                    # geometry dropped the whole render to the channel-minor
                    # epilogue — rearrange-on-scan never got the fast path).
                    hit = idx >= 0
                    safe_idx = jnp.maximum(idx, 0)
                    a16 = pack.tri_attr16[sids[:, None], safe_idx]
                    at_t = jnp.swapaxes(a16, 1, 2)  # (N, 16, R) block order
                    dirs_bt = jnp.einsum(
                        "rk,nkf->nfr",
                        d_aug_l,
                        B_l[..., 0:3],
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (N, 3, R) world dirs, block order
                    nd = jnp.sum(at_t[:, 0:3] * dirs_bt, axis=1)  # n.d
                    n_o = jnp.sum(
                        at_t[:, 0:3] * cam_pos.astype(jnp.float32)[:, :, None],
                        axis=1,
                    )
                    ok = hit & (jnp.abs(nd) > 1e-6)
                    # plane-exact t from the precomputed n.v0 row (scene.py
                    # attr16 slot ATTR16_NV0): the kernel's default-precision
                    # G matmul leaves ~bf16 mantissa depth error; f32
                    # (n.v0 - n.o)/(n.d) recovers it. Caveat: the two dot
                    # products are rounded independently, so the difference
                    # loses the conditioning of the fused n.(v0-o) form —
                    # error ~|n.v0|*1e-7, negligible at room scale but this
                    # path assumes scene coordinates of modest extent.
                    t_pl = jnp.where(
                        ok,
                        (at_t[:, ATTR16_NV0] - n_o) / jnp.where(ok, nd, 1.0),
                        t,
                    )
                    col_t = at_t[:, 3:6]
                    sem_t = at_t[:, 6]
                    if dynamic is not None:
                        # dynamic pass in BLOCK order, merged channel-major
                        # (attribute lookup stays a transposed one-hot
                        # matmul — rays in lanes, same as the static side)
                        from habitat_tpu.ops.raycast_pallas import (
                            raycast_pallas_index_t,
                        )

                        td = dynamic["v0"].shape[1]
                        dpad = (-td) % 128
                        v0d = jnp.pad(dynamic["v0"], ((0, 0), (0, dpad), (0, 0)))
                        e1d = jnp.pad(dynamic["e1"], ((0, 0), (0, dpad), (0, 0)))
                        e2d = jnp.pad(dynamic["e2"], ((0, 0), (0, dpad), (0, 0)))
                        validd = jnp.pad(dynamic["valid"], ((0, 0), (0, dpad)))
                        dmat = build_tri_matrix_jnp(v0d, e1d, e2d, validd)
                        nrm_d = jnp.cross(e1d, e2d)
                        nrm_d = nrm_d / (
                            jnp.linalg.norm(nrm_d, axis=-1, keepdims=True) + 1e-9
                        )
                        cold = jnp.pad(
                            dynamic["color"], ((0, 0), (0, dpad), (0, 0))
                        )
                        semd = jnp.pad(
                            dynamic["sem"], ((0, 0), (0, dpad))
                        ).astype(jnp.float32)
                        t2, idx2 = raycast_pallas_index_t(
                            dmat,
                            jnp.arange(N, dtype=jnp.int32),
                            ray_features_t(origins_c, dirs_c, 1024),
                            ray_tile=1024,
                        )
                        closer = (idx2 >= 0) & (t2 < t)
                        Tp = dmat.shape[-1]
                        table_t = jnp.concatenate(
                            [nrm_d, cold, semd[..., None]], axis=-1
                        ).transpose(0, 2, 1)  # (N, 7, Tp)
                        oh = (
                            jnp.arange(Tp, dtype=idx2.dtype)[None, :, None]
                            == idx2[:, None, :]
                        ).astype(jnp.float32)  # (N, Tp, R)
                        attr2_t = jax.lax.dot_general(
                            table_t,
                            oh,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                        )  # (N, 7, R)
                        nd2 = jnp.sum(attr2_t[:, 0:3] * dirs_bt, axis=1)
                        hit = hit | closer
                        t_pl = jnp.where(closer, t2, t_pl)
                        nd = jnp.where(closer, nd2, nd)
                        col_t = jnp.where(
                            closer[:, None, :], attr2_t[:, 3:6], col_t
                        )
                        sem_t = jnp.where(closer, attr2_t[:, 6], sem_t)
                    # mask t before the depth multiply so a +inf kernel-miss
                    # t can never reach the multiply (NaN-safety independent
                    # of the pinhole gating on dcb.z != 0)
                    z = jnp.where(hit, t_pl, 0.0) * (-dcb[:, 2])[None, :]
                    z = jnp.where(hit, z, max_depth)
                    z = jnp.clip(z, min_depth, max_depth)
                    if normalize_depth:
                        z = (z - min_depth) / (max_depth - min_depth)
                    depth = from_blocks(z).reshape(
                        N, height, width, 1
                    ).astype(jnp.float32)
                    shade = 0.35 + 0.65 * jnp.abs(nd)
                    sky_l = jnp.array([0.65, 0.75, 0.9], jnp.float32)
                    rgb_t = jnp.where(
                        hit[:, None, :],
                        col_t * shade[:, None, :],
                        sky_l[None, :, None],
                    )
                    rgb_u8 = from_blocks(
                        jnp.clip(rgb_t * 255.0, 0, 255)
                        .astype(jnp.uint8)
                        .transpose(0, 2, 1)
                    ).reshape(N, height, width, 3)
                    sem_b = jnp.where(
                        hit, jnp.round(sem_t).astype(jnp.int32), 0
                    )
                    return {
                        "rgb": rgb_u8,
                        "depth": depth,
                        "semantic": from_blocks(sem_b).reshape(
                            N, height, width, 1
                        ),
                    }
                t = from_blocks(t)
                idx = from_blocks(idx)
                hit = idx >= 0
                safe_idx = jnp.maximum(idx, 0)
                if pack.tri_attr16 is not None:
                    # ONE 64-byte-row gather: [attr(8) | v0(3) | pad] — two
                    # separate small-row gathers measured 115.8 ms vs 23.3
                    # at the N=256 scan shape (round 4)
                    a16 = pack.tri_attr16[sids[:, None], safe_idx]
                    attrs = a16[..., 0:8] * hit[..., None].astype(jnp.float32)
                    v0g = a16[..., 8:11]
                else:
                    attrs = pack.tri_attr[sids[:, None], safe_idx] * hit[
                        ..., None
                    ].astype(jnp.float32)  # (N,R,8) true gather = exact copy
                    v0g = pack.tri_v0[sids[:, None], safe_idx]  # (N,R,3)
                nd = jnp.sum(attrs[..., 0:3] * dirs, axis=-1)
                num = jnp.sum(attrs[..., 0:3] * (v0g - origins), axis=-1)
                ok = hit & (jnp.abs(nd) > 1e-6)
                # plane-exact t: the kernel's default-precision G matmul
                # leaves ~bf16 mantissa depth error (round-2's 0.73
                # scan-scene agreement); exact f32 n.(v0-o)/(n.d) fixes it
                t = jnp.where(ok, num / jnp.where(ok, nd, 1.0), t)
            else:
                ids = select_chunks_occluded(
                    pack.tri_mat, pack.chunk_bounds[sids], sids, origins_c,
                    dirs_c, 1024, cull_k,
                )
                from habitat_tpu.ops.raycast_pallas import (
                    raycast_pallas_culled_t,
                )

                t, attrs_t = raycast_pallas_culled_t(
                    pack.tri_mat,
                    jnp.swapaxes(pack.tri_attr, 1, 2),
                    ids,
                    sids,
                    ray_features_t(origins_c, dirs_c, 1024),
                    ray_tile=1024,
                )
                attrs = jnp.swapaxes(attrs_t, 1, 2)  # (N,R,8)
                hit = attrs[..., 7] > 0.5
        else:
            rt = 2048 if R % 2048 == 0 else R
            t, idx = raycast_pallas_index_t(
                pack.tri_mat, sids, ray_features_t(origins, dirs, rt), ray_tile=rt
            )
            attrs = _gather_attrs(pack.tri_attr, sids, idx)
            hit = idx >= 0
        n = attrs[..., 0:3]
        base = attrs[..., 3:6]
        sem_val = attrs[..., 6]
    else:
        t, idx = raycast_mxu_batch(
            pack.tri_mat[sids], origins, dirs, tri_chunk=tri_chunk, ray_tile=ray_tile
        )
        hit = idx >= 0
        safe_idx = jnp.maximum(idx, 0)  # (N,R)
        sid_r = sids[:, None]
        attr = pack.tri_attr[sid_r, safe_idx]  # (N,R,8)
        n = attr[..., 0:3]
        base = attr[..., 3:6]
        sem_val = attr[..., 6]

    if dynamic is not None:
        td = dynamic["v0"].shape[1]
        pad = (-td) % 128
        v0d = jnp.pad(dynamic["v0"], ((0, 0), (0, pad), (0, 0)))
        e1d = jnp.pad(dynamic["e1"], ((0, 0), (0, pad), (0, 0)))
        e2d = jnp.pad(dynamic["e2"], ((0, 0), (0, pad), (0, 0)))
        validd = jnp.pad(dynamic["valid"], ((0, 0), (0, pad)))
        dmat = build_tri_matrix_jnp(v0d, e1d, e2d, validd)  # (N,10,4,Tp)
        if be == "pallas":
            # per-env dynamic geometry = per-env "scenes": reuse the fused
            # index kernel with sids = arange(N), gather attributes in-jit
            from habitat_tpu.ops.raycast_pallas import raycast_pallas_index_t

            nrm = jnp.cross(e1d, e2d)
            nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-9)
            cold = jnp.pad(dynamic["color"], ((0, 0), (0, pad), (0, 0)))
            semd = jnp.pad(dynamic["sem"], ((0, 0), (0, pad))).astype(jnp.float32)
            rt2 = 2048 if R % 2048 == 0 else R
            t2, idx2 = raycast_pallas_index_t(
                dmat,
                jnp.arange(N, dtype=jnp.int32),
                ray_features_t(origins, dirs, rt2),
                ray_tile=rt2,
            )
            closer = (idx2 >= 0) & (t2 < t)
            # attribute lookup as a transposed one-hot matmul: the per-ray
            # take_along_axis gathers scalarize on TPU (traced at 13.5
            # ms/step at N=64 — 70% of the whole rearrange sim step); the
            # (N,7,Tp)@(N,Tp,R) dot rides the MXU with rays in lanes
            Tp = dmat.shape[-1]
            table_t = jnp.concatenate(
                [nrm, cold, semd[..., None]], axis=-1
            ).transpose(0, 2, 1)  # (N, 7, Tp)
            oh = (
                jnp.arange(Tp, dtype=idx2.dtype)[None, :, None] == idx2[:, None, :]
            ).astype(jnp.float32)  # (N, Tp, R)
            attr2_t = jax.lax.dot_general(
                table_t,
                oh,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (N, 7, R)
            nrm2 = attr2_t[:, 0:3].transpose(0, 2, 1)
            col2 = attr2_t[:, 3:6].transpose(0, 2, 1)
            sem2 = attr2_t[:, 6]
        else:
            t2, idx2 = raycast_mxu_batch(dmat, origins, dirs, tri_chunk=128)
            closer = (idx2 >= 0) & (t2 < t)
            si2 = jnp.maximum(idx2, 0)
            nrm2 = jnp.cross(
                jnp.take_along_axis(v0d * 0 + e1d, si2[..., None], axis=1),
                jnp.take_along_axis(e2d, si2[..., None], axis=1),
            )
            nrm2 = nrm2 / (jnp.linalg.norm(nrm2, axis=-1, keepdims=True) + 1e-9)
            cold = jnp.pad(dynamic["color"], ((0, 0), (0, pad), (0, 0)))
            semd = jnp.pad(dynamic["sem"], ((0, 0), (0, pad)))
            col2 = jnp.take_along_axis(cold, si2[..., None], axis=1)
            sem2 = jnp.take_along_axis(semd, si2, axis=1).astype(jnp.float32)
        t = jnp.where(closer, t2, t)
        hit = hit | closer
        n = jnp.where(closer[..., None], nrm2, n)
        base = jnp.where(closer[..., None], col2, base)
        sem_val = jnp.where(closer, sem2, sem_val)

    if projection == "pinhole":
        # planar depth = t * cos(angle to camera forward) (HabitatSim semantics)
        cp = jnp.cos(pitch)
        fwd_flat = yaw_to_forward(yaw)
        fwd = jnp.stack(
            [fwd_flat[..., 0] * cp, jnp.sin(pitch), fwd_flat[..., 2] * cp], axis=-1
        )
        z = t * jnp.sum(dirs * fwd[:, None, :], axis=-1)
    else:
        z = t  # euclidean range for panoramic projections
    z = jnp.where(hit, z, max_depth)
    z = jnp.clip(z, min_depth, max_depth)
    if normalize_depth:
        z = (z - min_depth) / (max_depth - min_depth)
    depth = z.reshape(N, height, width, 1).astype(jnp.float32)

    lambert = jnp.abs(jnp.sum(n * dirs, axis=-1))
    shade = 0.35 + 0.65 * lambert
    sky = jnp.array([0.65, 0.75, 0.9], jnp.float32)
    rgb = jnp.where(hit[..., None], base * shade[..., None], sky)
    rgb_u8 = (
        jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8).reshape(N, height, width, 3)
    )

    sem = jnp.where(hit, jnp.round(sem_val).astype(jnp.int32), 0)
    sem = sem.reshape(N, height, width, 1)
    return {"rgb": rgb_u8, "depth": depth, "semantic": sem}


def render_env(
    pack: ScenePack,
    sid: jnp.ndarray,
    cam_pos: jnp.ndarray,
    yaw: jnp.ndarray,
    pitch: jnp.ndarray,
    **kw,
) -> Dict[str, jnp.ndarray]:
    """Single-env convenience wrapper (N=1 render_batch, squeezed)."""
    out = render_batch(
        pack,
        jnp.asarray(sid)[None],
        jnp.asarray(cam_pos)[None],
        jnp.asarray(yaw)[None],
        jnp.asarray(pitch)[None],
        **kw,
    )
    return {k: v[0] for k, v in out.items()}
