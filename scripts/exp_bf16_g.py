"""Experiment: can the raycast kernel's G intermediate go bf16?

Round-1/2 finding: the kernel is VMEM-bandwidth bound on G (Rt x 4C f32
write+read ~ 8.5ms of 9.2 at bench shape). Halving G's bytes would halve the
kernel. Earlier attempts failed:
  - preferred_element_type=bf16: Mosaic demands a 32-bit matmul accumulator.
  - bf16 broadcast-compares in the epilogue: Mosaic relayout rejects.

New angle tried here: f32 accumulate -> immediate .astype(bf16) (Mosaic may
fuse the downcast into the matmul epilogue so the VMEM spill is bf16), then
run the min-chains in bf16 ARITHMETIC ONLY (mul/min are plain VPU ops; no
bf16 compares), upcast the two reduced columns to f32 for the compare+select.
Exactness: t from bf16 tnum/detA has ~0.4% error -> refine by recomputing the
winner's t in f32 from a one-hot extraction of the winner's 4 G columns...
which needs G f32 again. Instead the refinement gathers the winner tri's
coefficient ROW (10 values) in XLA and redoes the dot per ray (R x 10 flops,
trivial) — kernel returns only (t_approx, idx); exact t recomputed outside.

Measures, at the bench shape (N=256, R=16384, T=128):
  A. current f32 kernel (raycast_pallas_index)
  B. bf16-G kernel (this file)
  C. B + XLA exact-t refinement epilogue
and reports max |t_B - t_A| / winner mismatch rate for honesty.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-7
_TMIN = 1e-3
_TMAX = 1e6


def _chunk_winner_bf16(F, M, C):
    G = jax.lax.dot_general(
        F,
        M.reshape(10, 4 * C),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # downcast right at the matmul epilogue
    detA = G[:, 0 * C : 1 * C]
    tnum = G[:, 1 * C : 2 * C]
    unum = G[:, 2 * C : 3 * C]
    vnum = G[:, 3 * C : 4 * C]
    aa = detA * detA
    p = unum * detA
    q = vnum * detA
    w = tnum * detA
    m1 = jnp.minimum(jnp.minimum(p, q), aa - p - q)
    m2 = jnp.minimum(w - jnp.bfloat16(_TMIN) * aa, aa - jnp.bfloat16(_EPS * _EPS))
    # compare in f32 after the min-chains (bf16 compares are the rejected op)
    m1f = m1.astype(jnp.float32)
    m2f = m2.astype(jnp.float32)
    hit = (m1f >= 0.0) & (m2f > 0.0)
    tn = tnum.astype(jnp.float32)
    dA = detA.astype(jnp.float32)
    t = jnp.where(hit, tn / jnp.where(hit, dA, 1.0), _TMAX)
    tmin = jnp.min(t, axis=1)
    win = jnp.argmin(t, axis=1).astype(jnp.int32)
    return tmin, win


def _kernel_bf16(sids_ref, f_ref, m_ref, t_out, i_out, *, tri_chunk):
    F = f_ref[0, 0]
    T = m_ref.shape[3]
    C = tri_chunk
    Rt = F.shape[0]

    def body(c, carry):
        best_t, best_i = carry
        tmin, win = _chunk_winner_bf16(F, m_ref[0, :, :, pl.ds(c * C, C)], C)
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


def raycast_bf16_index(tri_mat, sids, features, ray_tile=2048, tri_chunk=128):
    N, R, _ = features.shape
    S, _, _, T = tri_mat.shape
    tri_chunk = min(tri_chunk, T)
    ray_tile = min(ray_tile, R)
    n_tiles = R // ray_tile
    F = features.reshape(N, n_tiles, ray_tile, 10)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, ray_tile, 10), lambda i, j, sids: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 10, 4, T), lambda i, j, sids: (sids[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, ray_tile // 8), lambda i, j, sids: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 8, ray_tile // 8), lambda i, j, sids: (i, j, 0, 0)),
        ],
    )
    t, idx = pl.pallas_call(
        functools.partial(_kernel_bf16, tri_chunk=tri_chunk),
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


def refine_t(tri_mat, sids, features, idx):
    """Exact f32 t for the winner tri: per-ray dot of its 10 ray features with
    the winner's (detA,tnum) coefficient columns (one-hot extraction)."""
    S, _, _, T = tri_mat.shape
    safe = jnp.maximum(idx, 0)
    # coefficient rows for detA (ch 0) and tnum (ch 1): (S,10,T) -> per-env
    co = tri_mat[sids][:, :, 0:2, :]  # (N,10,2,T)
    oh = (safe[..., None] == jnp.arange(T, dtype=idx.dtype)).astype(jnp.float32)
    # (N,R,T) @ (N,T,20) -> (N,R,20)
    tab = co.reshape(co.shape[0], 20, T).transpose(0, 2, 1)
    picked = jax.lax.dot_general(
        oh, tab, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (N,R,20): [detA(10) | tnum(10)] coefficient rows? no — picked values
    # tri_mat[:, :, c, t] are the 10 coefficients multiplied by ray features
    det_co = picked[..., 0:10]
    # layout check happens numerically below
    detA = jnp.einsum("nrk,nrk->nr", det_co, features)
    tnum_co = picked[..., 10:20]
    tnum = jnp.einsum("nrk,nrk->nr", tnum_co, features)
    ok = (idx >= 0) & (jnp.abs(detA) > 1e-12)
    return jnp.where(ok, tnum / jnp.where(ok, detA, 1.0), _TMAX)


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # axon: block_until_ready may not block; pull a scalar
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / iters, out


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.ops.raycast import ray_features
    from habitat_tpu.ops.raycast_pallas import raycast_pallas_index

    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=4, episodes_per_scene=16, seed=0
    )
    env = make_nav_env(
        scenes, episodes, num_envs=256, precomputed_fields=fields,
        sensor_specs=(("HabitatSimDepthSensor", {"height": 128, "width": 128}),),
    )
    pack = env.pack
    tri_mat = pack.tri_mat
    N, R = 256, 128 * 128
    rng = np.random.default_rng(0)
    sids = jnp.asarray(rng.integers(0, tri_mat.shape[0], N), jnp.int32)
    origins = jnp.asarray(rng.uniform(-2, 2, (N, R, 3)).astype(np.float32))
    d = rng.normal(size=(N, R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    feats = jax.jit(ray_features)(origins, dirs)
    jax.block_until_ready(feats)

    f32 = jax.jit(lambda f: raycast_pallas_index(tri_mat, sids, f))
    bf = jax.jit(lambda f: raycast_bf16_index(tri_mat, sids, f))
    bf_ref = jax.jit(
        lambda f: (lambda t, i: (refine_t(tri_mat, sids, f, i), i))(
            *raycast_bf16_index(tri_mat, sids, f)
        )
    )

    try:
        dt_a, (t_a, i_a) = timeit(f32, feats)
        print(f"A f32 kernel:          {dt_a*1e3:8.2f} ms")
    except Exception as e:
        print("A failed:", repr(e)[:300])
        return
    try:
        dt_b, (t_b, i_b) = timeit(bf, feats)
        print(f"B bf16-G kernel:       {dt_b*1e3:8.2f} ms")
        mism = float(jnp.mean((i_a != i_b).astype(jnp.float32)))
        hit = np.asarray(i_a) >= 0
        ta, tb = np.asarray(t_a), np.asarray(t_b)
        terr = np.abs(ta - tb)[hit & (np.asarray(i_b) >= 0)]
        print(f"  winner mismatch: {mism:.4%}  t err max {terr.max():.4g} "
              f"median {np.median(terr):.4g}")
    except Exception as e:
        print("B failed:", repr(e)[:300])
        return
    try:
        dt_c, (t_c, i_c) = timeit(bf_ref, feats)
        tc = np.asarray(t_c)
        same = hit & (np.asarray(i_c) == np.asarray(i_a))
        rerr = np.abs(tc - ta)[same]
        print(f"C bf16 + exact-t:      {dt_c*1e3:8.2f} ms  refined t err max "
              f"{rerr.max():.4g}")
    except Exception as e:
        print("C failed:", repr(e)[:300])


if __name__ == "__main__":
    main()
