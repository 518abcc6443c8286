"""bf16 MATMUL INPUTS for the raycast kernel (f32 accumulator).

exp_bf16_g.py tested storing G in bf16 (negative: Mosaic materializes f32
then converts). This tests the other half: feed F and M to the MXU as bf16
with preferred_element_type=f32. An f32xf32 MXU dot is internally ~3 bf16
passes, so bf16 inputs should cut the dot cost ~3x at the price of ~3
decimal digits on G. Rendering could then (a) inflate the hit test by a
relative slop so edge hits never flake, and (b) recompute the winner's t
exactly per-ray (ops/raycast.exact_t_from_hit).

Times three g-only kernels at bench shape: f32 inputs (the current floor),
bf16 inputs, and bf16 with the full hit-test epilogue.
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


def _kernel_gonly(sids_ref, f_ref, m_ref, t_out, *, tri_chunk, epilogue):
    F = f_ref[0, 0, 0:10, :]
    T = m_ref.shape[3]
    C = tri_chunk
    Rt = F.shape[1]

    def body(c, best):
        G = jax.lax.dot_general(
            m_ref[0, :, :, pl.ds(c * C, C)].reshape(10, 4 * C), F,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if not epilogue:
            return jnp.minimum(best, jnp.min(G, axis=0))
        detA = G[0 * C : 1 * C]
        tnum = G[1 * C : 2 * C]
        unum = G[2 * C : 3 * C]
        vnum = G[3 * C : 4 * C]
        aa = detA * detA
        p = unum * detA
        q = vnum * detA
        w = tnum * detA
        slop = 1e-3 * aa  # edge slop: inflate tris ~0.1% against bf16 noise
        m1 = jnp.minimum(jnp.minimum(p, q), aa - p - q)
        m2 = jnp.minimum(w - _TMIN * aa, aa - _EPS * _EPS)
        hit = (m1 >= -slop) & (m2 > 0.0)
        t = jnp.where(hit, tnum / jnp.where(hit, detA, 1.0), _TMAX)
        return jnp.minimum(best, jnp.min(t, axis=0))

    best = lax.fori_loop(0, T // C, body, jnp.full((Rt,), _TMAX, jnp.float32))
    t_out[0, 0] = best[None, :]


def raycast_gonly(tri_mat, sids, features_t, ray_tile=2048, epilogue=False):
    N, n_tiles, K16, Rt = features_t.shape
    S, _, _, T = tri_mat.shape
    R = n_tiles * ray_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 16, ray_tile), lambda i, j, sids: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 10, 4, T), lambda i, j, sids: (sids[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, ray_tile), lambda i, j, sids: (i, j, 0, 0)),
        ],
    )
    (t,) = pl.pallas_call(
        functools.partial(_kernel_gonly, tri_chunk=min(128, T), epilogue=epilogue),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, n_tiles, 1, ray_tile), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * R * T * 10 * 4,
            bytes_accessed=N * R * (64 + 4) + N * R * T * 10,
            transcendentals=0,
        ),
    )(sids.astype(jnp.int32), features_t, tri_mat)
    return t.reshape(N, R)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.sims.scene import pack_scenes
    from habitat_tpu.ops.raycast import ray_features_t

    rng = np.random.default_rng(0)
    scenes, _, _ = make_procedural_pointnav(num_scenes=4, episodes_per_scene=16, seed=0)
    pack = pack_scenes(scenes)
    N, R = 256, 128 * 128
    sids = jnp.asarray(rng.integers(0, 4, N), jnp.int32)
    o = jnp.asarray(rng.uniform(-2, 2, (N, R, 3)).astype(np.float32))
    d = rng.normal(size=(N, R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    feats_t = jax.jit(functools.partial(ray_features_t, ray_tile=2048))(o, jnp.asarray(d))
    tm32 = pack.tri_mat
    tm16 = tm32.astype(jnp.bfloat16)
    f16 = feats_t.astype(jnp.bfloat16)
    print("T =", tm32.shape[3])

    for name, tm, ft, ep in [
        ("f32 g-only", tm32, feats_t, False),
        ("bf16 g-only", tm16, f16, False),
        ("f32 full", tm32, feats_t, True),
        ("bf16 full", tm16, f16, True),
    ]:
        def step(f, tm=tm, ep=ep):
            t = raycast_gonly(tm, sids, f, epilogue=ep)
            return f + (t[:, :1] * 0.0).astype(f.dtype)[:, None, None, :]

        per = chain_time(step, ft, k1=2, k2=10)
        print(f"{name}: {per*1e3:.2f} ms/step")

    # accuracy probe: bf16-input t vs f32 t on the full epilogue
    t32 = jax.jit(functools.partial(raycast_gonly, epilogue=True))(tm32, sids, feats_t)
    t16 = jax.jit(functools.partial(raycast_gonly, epilogue=True))(tm16, sids, f16)
    t32, t16 = np.asarray(t32), np.asarray(t16)
    hit = t32 < 1e5
    hit16 = t16 < 1e5
    print("hit frac f32", hit.mean(), "agree", (hit == hit16).mean())
    if hit.any():
        rel = np.abs(t16 - t32)[hit & hit16] / np.maximum(t32[hit & hit16], 1e-3)
        print("t rel err p50/p99/max:", np.percentile(rel, 50),
              np.percentile(rel, 99), rel.max())


if __name__ == "__main__":
    main()
