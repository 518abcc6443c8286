"""Ablate the Pallas raycast kernel: time stripped-down variants to locate
the cost (G matmul / hit-test / min-reduce / attr matmul / stores).
Proper sync via scalar device_get."""

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

from habitat_tpu.ops import raycast_pallas as rp


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, iters=20):
    out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    return round((time.time() - t0) / iters * 1e3, 2)


def make_variant(mode, N, R, T, ray_tile=2048, tri_chunk=128):
    n_tiles = R // ray_tile

    def kern(sids_ref, f_ref, m_ref, a_ref, t_out, attr_out):
        F = f_ref[0, 0]
        C = tri_chunk
        Rt = F.shape[0]
        n_chunks = T // C

        def body(c, carry):
            best_key, best_attr = carry
            M = m_ref[0, :, :, pl.ds(c * C, C)]
            if mode == "matmul_only":
                G = jax.lax.dot_general(
                    F, M.reshape(10, 4 * C), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                key = jnp.min(jax.lax.bitcast_convert_type(G[:, :C], jnp.int32), axis=1)
                return (jnp.minimum(key, best_key), best_attr)
            key, oh = rp._chunk_min_key(F, M, C)
            if mode == "no_attr":
                return (jnp.minimum(key, best_key), best_attr)
            A = a_ref[0, pl.ds(c * C, C), :]
            attrs = jax.lax.dot_general(
                oh, A, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            better = key < best_key
            return (
                jnp.where(better, key, best_key),
                jnp.where(better[:, None], attrs, best_attr),
            )

        init = (
            jnp.full((ray_tile,), rp._I32_MAX, jnp.int32),
            jnp.zeros((ray_tile, 8), jnp.float32),
        )
        bk, ba = lax.fori_loop(0, T // tri_chunk, body, init)
        t_out[0, 0] = rp._key_to_t(bk).reshape(t_out.shape[2], t_out.shape[3])
        if mode != "no_store_attr":
            attr_out[0, 0] = ba

    def run(tri_mat, tri_attr, sids, F):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, ray_tile, 10), lambda i, j, s: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 10, 4, T), lambda i, j, s: (s[i], 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, 8), lambda i, j, s: (s[i], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, 8, ray_tile // 8), lambda i, j, s: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, ray_tile, 8), lambda i, j, s: (i, j, 0, 0)),
            ],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((N, n_tiles, 8, ray_tile // 8), jnp.float32),
                jax.ShapeDtypeStruct((N, n_tiles, ray_tile, 8), jnp.float32),
            ],
        )(sids.astype(jnp.int32), F.reshape(N, n_tiles, ray_tile, 10), tri_mat, tri_attr)

    return jax.jit(run)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    N, R, T = 256, 16384, 128
    S = 4
    key = jax.random.PRNGKey(0)
    tri_mat = jax.random.normal(key, (S, 10, 4, T), jnp.float32)
    tri_attr = jax.random.normal(key, (S, T, 8), jnp.float32)
    sids = jnp.zeros((N,), jnp.int32)
    F = jax.random.normal(key, (N, R, 10), jnp.float32)

    res = {}
    for mode in ("full", "no_attr", "matmul_only"):
        fn = make_variant(mode, N, R, T)
        res[f"{mode}_ms"] = timeit(fn, tri_mat, tri_attr, sids, F)

    # current production kernel for reference
    prod = jax.jit(lambda F: rp.raycast_pallas_batch(tri_mat, tri_attr, sids, features=F))
    res["production_ms"] = timeit(prod, F)

    # ray_tile sweep on full
    for rt in (1024, 4096):
        fn = make_variant("full", N, R, T, ray_tile=rt)
        res[f"full_rt{rt}_ms"] = timeit(fn, tri_mat, tri_attr, sids, F)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
