"""Kernel v7: fuse ray-feature generation AND attribute extraction in-kernel.

v5 ships a (N, tiles, 16, Rt) feature tensor through HBM (einsum 20 ms/update
+ 64 MB round trip) and extracts winner attributes in XLA (14.4 ms/update).
v7 builds F inside the kernel from the per-env (4,10) ray-feature matrix B
(SMEM scalars x the shared camera-dir tile — 40 scalar-vector FMAs, exact
f32 like the HIGHEST einsum) and extracts attributes per chunk on the MXU
((8,128)@(128,Rt) one-hot dot folded by closest-t).

Also tests chunk granularity: the bench scenes have 86 valid tris padded to
T=128; with C=32 the loop can stop at n_used=96 — 25% less G traffic (the
kernel's VMEM floor). Mosaic requires dynamic lane slices at multiples of
128, so the caller re-groups the tri matrix as (S, 10, 4T) with chunk c in
columns [c*4C, (c+1)*4C) = [detA(C)|tnum(C)|unum(C)|vnum(C)] (4C=128 for
C=32), and pads the transposed attr table to a 128-wide window per chunk.
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

_EPS = 1e-7
_TMIN = 1e-3
_TMAX = 1e6
ATTR_CH = 8


def _kernel_v7(sids_ref, b_ref, d_ref, m_ref, a_ref, t_out, attr_out, *,
               tri_chunk, n_used):
    C = tri_chunk
    D = d_ref[0]  # (8, Rt) rows 0:4 = [dx, dy, dz, 1]
    Rt = D.shape[1]
    # F rows: 40 scalar-vector FMAs (exact f32; matches the HIGHEST einsum)
    rows = []
    for f in range(10):
        acc = b_ref[0, f, 0] * D[0:1, :]
        for k in range(1, 4):
            acc = acc + b_ref[0, f, k] * D[k : k + 1, :]
        rows.append(acc)
    F = jnp.concatenate(rows, axis=0)  # (10, Rt)

    def body(c, carry):
        best_t, best_a = carry
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
        m1 = jnp.minimum(jnp.minimum(p, q), aa - p - q)
        m2 = jnp.minimum(w - _TMIN * aa, aa - _EPS * _EPS)
        hit = (m1 >= 0.0) & (m2 > 0.0)
        t = jnp.where(hit, tnum / jnp.where(hit, detA, 1.0), _TMAX)
        tmin = jnp.min(t, axis=0)  # (Rt,)
        win = jnp.argmin(t, axis=0).astype(jnp.int32)
        # one-hot over the chunk's 128-wide attr window (rows C..127 are
        # zero-padded in a_ref and can never match win < C)
        row = jax.lax.broadcasted_iota(jnp.int32, (128, Rt), 0)
        oh = ((row == win[None, :]) & (tmin < _TMAX)[None, :]).astype(jnp.float32)
        attrs = jax.lax.dot_general(
            a_ref[0, :, pl.ds(c * 128, 128)],
            oh,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, Rt)
        better = tmin < best_t
        return (
            jnp.where(better, tmin, best_t),
            jnp.where(better[None, :], attrs, best_a),
        )

    init = (
        jnp.full((Rt,), _TMAX, jnp.float32),
        jnp.zeros((ATTR_CH, Rt), jnp.float32),
    )
    best_t, best_a = lax.fori_loop(0, n_used // C, body, init)
    t_out[0, 0] = jnp.where(best_t >= _TMAX * 0.5, _TMAX, best_t)[None, :]
    attr_out[0, 0] = best_a


def group_tri_mat(tri_mat, C):
    """(S,10,4,T) -> (S,10,4T) with chunk c in cols [c*4C,(c+1)*4C)."""
    S, _, _, T = tri_mat.shape
    return (
        tri_mat.reshape(S, 10, 4, T // C, C)
        .transpose(0, 1, 3, 2, 4)
        .reshape(S, 10, 4 * T)
    )


def pad_attr_windows(tri_attr_t, C):
    """(S,8,T) -> (S,8,(T//C)*128): chunk c in cols [c*128, c*128+C)."""
    S, A, T = tri_attr_t.shape
    if C == 128:
        return tri_attr_t
    nc = T // C
    out = jnp.zeros((S, A, nc, 128), tri_attr_t.dtype)
    out = out.at[:, :, :, :C].set(
        tri_attr_t.reshape(S, A, nc, C)
    )
    return out.reshape(S, A, nc * 128)


def raycast_v7(tri_mat_c, tri_attr_w, sids, d_t, Bt, ray_tile=2048,
               tri_chunk=32, n_used=0):
    """tri_mat_c: (S,10,4T) chunk-grouped; tri_attr_w: (S,8,(T//C)*128)
    window-padded; d_t: (n_tiles, 8, Rt); Bt: (N, 16, 4)."""
    N = sids.shape[0]
    n_tiles, K8, Rt = d_t.shape
    S, _, T4 = tri_mat_c.shape
    T = T4 // 4
    C = tri_chunk
    if n_used <= 0:
        n_used = T
    n_used = min(((n_used + C - 1) // C) * C, T)
    R = n_tiles * ray_tile
    TW = tri_attr_w.shape[2]

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
            pl.BlockSpec((1, ATTR_CH, TW), lambda i, j, sids: (sids[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, ray_tile), lambda i, j, sids: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, ATTR_CH, ray_tile), lambda i, j, sids: (i, j, 0, 0)),
        ],
    )
    t, attrs = pl.pallas_call(
        functools.partial(_kernel_v7, tri_chunk=C, n_used=n_used),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((N, n_tiles, ATTR_CH, ray_tile), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * n_used * (10 * 4 + ATTR_CH),
            bytes_accessed=N * R * 40 + N * n_used * 192,
            transcendentals=0,
        ),
    )(sids.astype(jnp.int32), Bt, d_t, tri_mat_c, tri_attr_w)
    return t.reshape(N, R), attrs.transpose(0, 2, 1, 3).reshape(N, ATTR_CH, R)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.sims.scene import pack_scenes
    from habitat_tpu.ops.raycast import camera_rays, ray_feature_matrix
    from habitat_tpu.ops.raycast_pallas import (
        raycast_pallas_index_t, _gather_attrs,
    )

    rng = np.random.default_rng(0)
    scenes, _, _ = make_procedural_pointnav(num_scenes=4, episodes_per_scene=16, seed=0)
    pack = pack_scenes(scenes)
    N = 256
    H = W = 128
    R = H * W
    ray_tile = 2048
    n_tiles = R // ray_tile
    sids = jnp.asarray(rng.integers(0, 4, N), jnp.int32)
    cam = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    yaw = jnp.asarray(rng.uniform(-3, 3, N).astype(np.float32))
    pitch = jnp.zeros((N,), jnp.float32)

    d_cam = camera_rays(jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), H, W).reshape(-1, 3)
    d_aug = jnp.concatenate([d_cam, jnp.ones((R, 1), jnp.float32)], -1)
    d_t = jnp.pad(d_aug.reshape(n_tiles, ray_tile, 4).transpose(0, 2, 1),
                  ((0, 0), (0, 4), (0, 0)))  # (n_tiles, 8, Rt)
    Bm = ray_feature_matrix(cam, yaw, pitch)  # (N, 4, 10)
    Bt = jnp.pad(Bm.transpose(0, 2, 1), ((0, 0), (0, 6), (0, 0)))  # (N,16,4)
    attr_t = jnp.swapaxes(pack.tri_attr, 1, 2)  # (S, 8, T)
    n_used = int(np.asarray(pack.tri_valid.sum(axis=1)).max())
    print("valid tris:", n_used)

    def v5_full(Bm):
        d_tiles = d_aug.reshape(n_tiles, ray_tile, 4)
        Bp = jnp.pad(Bm, ((0, 0), (0, 0), (0, 6)))
        Ft = jnp.einsum("jrk,nkf->njfr", d_tiles, Bp,
                        precision=jax.lax.Precision.HIGHEST)
        t, idx = raycast_pallas_index_t(pack.tri_mat, sids, Ft, ray_tile=ray_tile)
        attrs = _gather_attrs(pack.tri_attr, sids, idx)  # (N,R,8)
        return t, attrs

    t5, a5 = jax.jit(v5_full)(Bm)
    t5n, a5n = np.asarray(t5), np.asarray(a5)
    hit5 = a5n[..., 7] > 0.5

    variants = [(32, n_used, "C32/n96"), (128, 0, "C128/T128"), (32, 0, "C32/T128")]
    for C, nu, tag in variants:
        mat_c = group_tri_mat(pack.tri_mat, C)
        attr_w = pad_attr_windows(attr_t, C)
        t7, a7 = jax.jit(functools.partial(
            raycast_v7, ray_tile=ray_tile, tri_chunk=C, n_used=nu
        ))(mat_c, attr_w, sids, d_t, Bt)
        t7n = np.asarray(t7)
        a7n = np.asarray(a7).transpose(0, 2, 1)
        hit7 = a7n[..., 7] > 0.5
        both = hit5 & hit7
        print(f"[{tag}] hit agree: {(hit5 == hit7).mean():.6f}  "
              f"t max rel: {np.max(np.abs(t7n - t5n)[both] / np.maximum(t5n[both], 1e-3)):.2e}  "
              f"attr max abs: {np.max(np.abs(a7n - a5n)[both]):.2e}")

    def step5(Bm):
        t, attrs = v5_full(Bm)
        return Bm + (t[:, :1] * 0.0)[:, :, None]

    per5 = chain_time(step5, Bm, k1=2, k2=10)
    print(f"v5 pipeline (einsum+kernel+extract): {per5*1e3:.2f} ms/step")

    for C, nu, tag in variants:
        mat_c = group_tri_mat(pack.tri_mat, C)
        attr_w = pad_attr_windows(attr_t, C)

        def step7(Bt, mat_c=mat_c, attr_w=attr_w, C=C, nu=nu):
            t, attrs = raycast_v7(mat_c, attr_w, sids, d_t, Bt,
                                  ray_tile=ray_tile, tri_chunk=C, n_used=nu)
            return Bt + (t[:, :1] * 0.0)[:, :, None]

        per7 = chain_time(step7, Bt, k1=2, k2=10)
        print(f"v7 [{tag}]: {per7*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
