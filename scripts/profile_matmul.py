"""What does the G determinant matmul cost at XLA level, in different
dtypes/layouts? Informs the kernel redesign."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return round((time.time() - t0) / iters * 1e3, 2)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    N, R, T = 256, 16384, 128
    key = jax.random.PRNGKey(0)
    F = jax.random.normal(key, (N, R, 10), jnp.float32)
    M = jax.random.normal(key, (N, 10, 4 * T), jnp.float32)
    res = {}

    # 1. plain f32 batched matmul (what the kernel does per program, batched)
    f = jax.jit(lambda F, M: jnp.einsum("nrk,nkc->nrc", F, M))
    res["G_f32_ms"] = timeit(f, F, M)

    # 2. bf16
    Fb, Mb = F.astype(jnp.bfloat16), M.astype(jnp.bfloat16)
    fb = jax.jit(
        lambda F, M: jax.lax.dot_general(
            F, M, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
    )
    res["G_bf16_ms"] = timeit(fb, Fb, Mb)

    # 3. K padded to 128 (dense MXU shape)
    F128 = jnp.pad(F, ((0, 0), (0, 0), (0, 118)))
    M128 = jnp.pad(M, ((0, 0), (0, 118), (0, 0)))
    res["G_f32_k128_ms"] = timeit(f, F128, M128)

    # 4. one-hot attr matmul (N*R, T) @ (T, 8)
    oh = jax.random.normal(key, (N, R, T), jnp.float32)
    A = jax.random.normal(key, (N, T, 8), jnp.float32)
    g = jax.jit(lambda o, A: jnp.einsum("nrc,nco->nro", o, A))
    res["attr_f32_ms"] = timeit(g, oh, A)

    # 5. VPU reference: 20 elementwise passes over (N,R,4T)
    X = jax.random.normal(key, (N, R, 4 * T), jnp.float32)

    def vpu(x):
        for _ in range(10):
            x = x * 1.0001 + 0.1
        return x

    res["vpu20_f32_ms"] = timeit(jax.jit(vpu), X)

    # 6. the G matmul in the epilogue-friendly shape used by pallas programs:
    #    2048 separate (2048,10)@(10,512) — measured via vmap to mimic
    F2 = F.reshape(N * 8, 2048, 10)
    M2 = jnp.broadcast_to(M[:, None], (N, 8, 10, 4 * T)).reshape(N * 8, 10, 4 * T)
    res["G_f32_tiled_ms"] = timeit(f, F2, M2)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
