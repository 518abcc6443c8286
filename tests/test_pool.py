"""Pallas maxpool-backward kernel (ops/pool.py) vs XLA's select-and-scatter.

Reference counterpart: torch MaxPool2d VJP inside the reference's ResNet stem
(habitat-baselines/habitat_baselines/rl/ddppo/policy/resnet.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from habitat_tpu.ops.pool import _supported, _xla_maxpool, max_pool_3x3s2


def _grads(fn, x, dy):
    _, vjp = jax.vjp(fn, x)
    return vjp(dy)[0]


def _oracle_bwd(x, y, dy):
    """All-ties-credited maxpool bwd: gx[p] = sum_w dy[w] * (x[p] == y[w])
    over the windows w covering p (3x3/2 SAME, pad high only)."""
    x, y, dy = (np.asarray(v, np.float32) for v in (x, y, dy))
    _, h, w, _ = x.shape
    gx = np.zeros_like(x)
    for a in range(3):
        na = (h - 1 - a) // 2 + 1
        for b in range(3):
            nb = (w - 1 - b) // 2 + 1
            xs = x[:, a::2, b::2][:, :na, :nb]
            gx[:, a::2, b::2][:, :na, :nb] += dy[:, :na, :nb] * (
                xs == y[:, :na, :nb]
            )
    return gx


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(128, 32, 32, 8), (256, 64, 64, 16)])
def test_pool_bwd_matches_oracle(dtype, shape):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, shape, jnp.float32).astype(dtype)
    y = _xla_maxpool(x)
    dy = jax.random.normal(k2, y.shape, jnp.float32).astype(dtype)

    assert _supported(x)
    got = _grads(lambda v: max_pool_3x3s2(v, True), x, dy)
    assert got.dtype == x.dtype
    # tolerance = accumulation-order rounding when a pixel is the max of
    # several overlapping windows (f32: 1-ulp; bf16: kernel accumulates
    # in bf16, the oracle in f32)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), _oracle_bwd(x, y, dy), atol=tol, rtol=tol
    )
    if dtype == jnp.float32:
        # continuous f32: no exact window ties, so the all-ties rule
        # coincides with XLA's first-in-scan select-and-scatter
        ref = _grads(_xla_maxpool, x, dy)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_pool_forward_identical():
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 32, 32, 8))
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3s2(x, True)), np.asarray(_xla_maxpool(x))
    )


def test_pool_unsupported_falls_back():
    # odd batch -> not _supported; the gather-form fallback must match the
    # oracle, and (tie-free f32) XLA's own VJP up to multi-window
    # accumulation-order rounding
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (3, 32, 32, 8))
    assert not _supported(x)
    y = _xla_maxpool(x)
    dy = jax.random.normal(k2, y.shape)
    ref = _grads(_xla_maxpool, x, dy)
    got = _grads(lambda v: max_pool_3x3s2(v, True), x, dy)
    np.testing.assert_allclose(
        np.asarray(got), _oracle_bwd(x, y, dy), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-6, rtol=1e-6
    )


def test_pool_bwd_under_remat():
    # the fallback must compose with jax.checkpoint (the PPO update remats
    # the CNN); the old jax.vjp-inside-custom_vjp fallback failed here
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 32, 32, 8))

    @jax.jit
    def loss(v):
        return jnp.sum(jax.checkpoint(lambda u: max_pool_3x3s2(u, True) ** 2)(v))

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
