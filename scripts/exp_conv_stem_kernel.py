"""Batch-in-lanes Pallas stem conv vs XLA's emitter (VERDICT r4 #2).

Measures fwd and fwd+bwd at the headline update shape (B=4096 minibatch,
128x128x4 RGBD) INCLUDING the NHWC<->B-minor boundary transposes the kernel
needs — the honest comparison the round-2 negative results demand. Also
verifies numerics vs the XLA conv on-device."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from conv_stem_kernel import conv_stem, conv_stem_reference


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, k1=2, k2=10):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(k1):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t1 = time.time()
    for _ in range(k2):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main():
    res = {}
    B, H, W, C = 2048, 128, 128, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.normal(size=(7, 7, C, 32)).astype(np.float32) * 0.05)

    # numerics on-device (fused: avoid holding two (B,64,64,32) f32 copies)
    err, scale = jax.jit(
        lambda x, w: (
            jnp.max(jnp.abs(conv_stem(x, w) - conv_stem_reference(x, w))),
            jnp.max(jnp.abs(conv_stem_reference(x, w))),
        )
    )(x, w)
    res["fwd_max_err"] = round(float(err), 6)
    res["fwd_scale"] = round(float(scale), 3)
    print(json.dumps(res), flush=True)

    f_k = jax.jit(conv_stem)
    f_r = jax.jit(conv_stem_reference)
    res["fwd_kernel_ms"] = round(timeit(f_k, x, w) * 1e3, 2)
    res["fwd_xla_ms"] = round(timeit(f_r, x, w) * 1e3, 2)
    print(json.dumps(res), flush=True)

    def loss_k(w, x):
        return jnp.sum(conv_stem(x, w) ** 2)

    def loss_r(w, x):
        # bf16-output conv (what nn.Conv(dtype=bf16) actually runs in the
        # model); keeping preferred_element_type=f32 here trips a dtype
        # mismatch inside JAX's conv transpose rule (bf16 operand, f32 dy)
        y = lax.conv_general_dilated(
            x,
            w.astype(jnp.bfloat16),
            (2, 2),
            padding=[(2, 3), (2, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_k = jax.jit(jax.grad(loss_k, argnums=(0, 1)))
    g_r = jax.jit(jax.grad(loss_r, argnums=(0, 1)))
    gk, gxk = g_k(w, x)
    gr, gxr = g_r(w, x)
    res["wgrad_rel_err"] = round(
        float(jnp.max(jnp.abs(gk - gr)) / (jnp.max(jnp.abs(gr)) + 1e-9)), 6
    )
    del gk, gxk, gr, gxr
    res["bwd_kernel_ms"] = round(timeit(g_k, w, x) * 1e3, 2)
    res["bwd_xla_ms"] = round(timeit(g_r, w, x) * 1e3, 2)
    K = 7 * 7 * C
    tf = 2 * B * (H // 2) * (W // 2) * 32 * K
    res["fwd_kernel_tfs"] = round(tf / res["fwd_kernel_ms"] * 1e-9, 1)
    res["fwd_xla_tfs"] = round(tf / res["fwd_xla_ms"] * 1e-9, 1)
    res["bwd_kernel_tfs"] = round(3 * tf / res["bwd_kernel_ms"] * 1e-9, 1)
    res["bwd_xla_tfs"] = round(3 * tf / res["bwd_xla_ms"] * 1e-9, 1)
    print("FINAL:", json.dumps(res))


if __name__ == "__main__":
    main()
