"""Batch-in-lanes Pallas stem conv (scripts/conv_stem_kernel.py): interpret-mode
equivalence with the XLA conv — fwd at bf16 rounding, grads vs an f32
reference within bf16 tolerance (the kernels run bf16 operands with f32
accumulation, exactly like the XLA path they replace)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from conv_stem_kernel import conv_stem, conv_stem_reference



@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(128, 32, 32, 4)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(7, 7, 4, 32)).astype(np.float32) * 0.1)
    return x, w


def test_fwd_matches_xla_conv(data):
    x, w = data
    with pltpu.force_tpu_interpret_mode():
        y = conv_stem(x, w)
    yr = conv_stem_reference(x, w)
    assert y.shape == (128, 16, 16, 32)
    # both paths compute bf16 products with f32 accumulation
    assert float(jnp.abs(y - yr).max()) < 1e-4


def test_grads_match_f32_reference(data):
    x, w = data

    def ref_f32(w, x):
        y = lax.conv_general_dilated(
            x.astype(jnp.float32), w, (2, 2), padding=[(2, 3), (2, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(jnp.sin(y))

    with pltpu.force_tpu_interpret_mode():
        gk, gxk = jax.grad(
            lambda w, x: jnp.sum(jnp.sin(conv_stem(x, w))), argnums=(0, 1)
        )(w, x)
    gr, gxr = jax.grad(ref_f32, argnums=(0, 1))(w, x)
    wrel = float(jnp.abs(gk - gr).max() / jnp.abs(gr).max())
    drel = float(
        jnp.abs(gxk.astype(jnp.float32) - gxr.astype(jnp.float32)).max()
        / jnp.abs(gxr).max()
    )
    assert wrel < 0.02, wrel  # bf16 products vs the f32 reference
    assert drel < 0.02, drel
