"""StemConv (space-to-depth-4 stem) equivalence vs the plain 7x7/2 conv.

The packed form must be numerically the reference stem (flax nn.Conv SAME
padding, bias-free, reference rl/ddppo/policy/resnet.py stem) — same
products, same f32 accumulation — including its weight gradient.
"""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from habitat_tpu.models.resnet import StemConv


def _ref_apply(w, x, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        w.astype(dtype),
        (2, 2),
        padding=[(2, 3), (2, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_stem_matches_plain_conv_f32():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 128, 128, 4), jnp.float32)
    m = StemConv(32, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    w = params["params"]["kernel"]
    y = m.apply(params, x)
    y_ref = _ref_apply(w, x, jnp.float32)
    assert y.shape == (2, 64, 64, 32) == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4, rtol=1e-4)


def test_stem_matches_plain_conv_odd_sizes_fallback():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 66, 66, 3), jnp.float32)
    m = StemConv(8, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    y_ref = _ref_apply(params["params"]["kernel"], x, jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4, rtol=1e-4)


def test_stem_weight_gradient_matches():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 64, 64, 4), jnp.float32)
    m = StemConv(16, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)

    def loss_packed(w):
        p = {"params": {"kernel": w}}
        y = m.apply(p, x)
        return jnp.sum(jnp.sin(y))

    def loss_ref(w):
        return jnp.sum(jnp.sin(_ref_apply(w, x, jnp.float32)))

    w = params["params"]["kernel"]
    g1 = jax.grad(loss_packed)(w)
    g2 = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3, rtol=1e-3)


def test_stem_bf16_close():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 128, 128, 4), jnp.float32)
    m = StemConv(32, dtype=jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(params, x), np.float32)
    y_ref = np.asarray(
        _ref_apply(params["params"]["kernel"], x, jnp.bfloat16), np.float32
    )
    # identical products, possibly different accumulation order
    assert np.max(np.abs(y - y_ref)) < 0.15
