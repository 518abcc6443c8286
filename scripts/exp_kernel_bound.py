"""What bounds the raycast kernel? Timing-only variants at bench shape.

  gonly    : matmul G = F@M, write min(G) — no epilogue at all
  gonly_bf : same with bf16 inputs
  v0_rtX   : current kernel at ray_tile X
  lean     : matmul + 8-pass epilogue (min-chain, no argmin/onehot/div)
  nodiv    : v0 minus the division (order by w*sign trick, approximate)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

_TMAX = 1e6


def make_pallas(kernel, N, n_tiles, ray_tile, T, tri_chunk):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, ray_tile, 10), lambda i, j, sids: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 10, 4, T), lambda i, j, sids: (sids[i], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, ray_tile // 8), lambda i, j, sids: (i, j, 0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(kernel, tri_chunk=tri_chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n_tiles, 8, ray_tile // 8), jnp.float32)
        ],
    )


def k_gonly(sids_ref, f_ref, m_ref, t_out, *, tri_chunk, dt=jnp.float32):
    F = f_ref[0, 0].astype(dt)
    T = m_ref.shape[3]
    C = tri_chunk

    def body(c, best):
        M = m_ref[0, :, :, pl.ds(c * C, C)].reshape(10, 4 * C).astype(dt)
        G = jax.lax.dot_general(
            F, M, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return jnp.minimum(best, jnp.min(G, axis=1))

    best = lax.fori_loop(
        0, T // C, body, jnp.full((F.shape[0],), _TMAX, jnp.float32)
    )
    t_out[0, 0] = best.reshape(t_out.shape[2], t_out.shape[3])


def k_lean(sids_ref, f_ref, m_ref, t_out, *, tri_chunk):
    """8-ish pass epilogue: min-chain hit + reciprocal-free depth proxy."""
    F = f_ref[0, 0]
    T = m_ref.shape[3]
    C = tri_chunk

    def body(c, best):
        M = m_ref[0, :, :, pl.ds(c * C, C)].reshape(10, 4 * C)
        G = jax.lax.dot_general(
            F, M, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        d = G[:, 0:C]
        tn = G[:, C : 2 * C]
        un = G[:, 2 * C : 3 * C]
        vn = G[:, 3 * C : 4 * C]
        aa = d * d
        p = un * d
        q = vn * d
        m = jnp.minimum(jnp.minimum(p, q), aa - p - q)
        t = jnp.where(m >= 0.0, tn / jnp.where(m >= 0, d, 1.0), _TMAX)
        return jnp.minimum(best, jnp.min(t, axis=1))

    best = lax.fori_loop(
        0, T // C, body, jnp.full((F.shape[0],), _TMAX, jnp.float32)
    )
    t_out[0, 0] = best.reshape(t_out.shape[2], t_out.shape[3])


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.ops.raycast import camera_rays, ray_feature_matrix
    from habitat_tpu.ops.raycast_pallas import raycast_pallas_batch

    num_envs = 256
    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=4, episodes_per_scene=16, seed=0
    )
    env = make_nav_env(
        scenes, episodes, num_envs=num_envs, precomputed_fields=fields,
        max_episode_steps=500,
        sensor_specs=(("PointGoalWithGPSCompassSensor", None),),
    )
    pack = env.pack
    state, _ = jax.jit(env.reset_fn)(jax.random.PRNGKey(0))
    sids = env.table.scene_idx[state.ep_idx].astype(jnp.int32)
    cam = state.pos.at[:, 1].add(1.25)
    yaw, pitch = state.yaw, jnp.zeros_like(state.yaw)
    d_cam = camera_rays(
        jnp.float32(0.0), jnp.float32(0.0), jnp.deg2rad(90.0), 128, 128
    ).reshape(-1, 3)
    d_aug = jnp.concatenate(
        [d_cam, jnp.ones((d_cam.shape[0], 1), jnp.float32)], axis=-1
    )
    B = ray_feature_matrix(cam, yaw, pitch)
    F = jnp.einsum("rk,nkf->nrf", d_aug, B, precision=jax.lax.Precision.HIGHEST)
    jax.block_until_ready(F)
    N = num_envs
    R = F.shape[1]
    S, _, _, T = pack.tri_mat.shape
    res = {"T": T}

    for rt in (1024, 2048):
        n_tiles = R // rt
        Fr = F.reshape(N, n_tiles, rt, 10)
        call = make_pallas(k_gonly, N, n_tiles, rt, T, min(128, T))
        f = jax.jit(lambda s, x: call(s, x, pack.tri_mat))
        res[f"gonly_rt{rt}_ms"] = round(timeit(f, sids, Fr) * 1e3, 2)

    n_tiles = R // 2048
    Fr = F.reshape(N, n_tiles, 2048, 10)
    call = make_pallas(
        functools.partial(k_gonly, dt=jnp.bfloat16), N, n_tiles, 2048, T, 128
    )
    f = jax.jit(lambda s, x: call(s, x, pack.tri_mat))
    res["gonly_bf16_ms"] = round(timeit(f, sids, Fr) * 1e3, 2)

    call = make_pallas(k_lean, N, n_tiles, 2048, T, 128)
    f = jax.jit(lambda s, x: call(s, x, pack.tri_mat))
    res["lean_ms"] = round(timeit(f, sids, Fr) * 1e3, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
