"""CLIP-RN50 encoder: shapes, pooling modes, frozen-ness, weight import."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from habitat_tpu.models.clip_resnet import (
    CLIPResNet,
    ResNetCLIPEncoder,
    clip_preprocess,
    load_clip_rn50_weights,
)


def test_preprocess_shapes_and_norm():
    img = jnp.full((2, 128, 128, 3), 128, jnp.uint8)
    out = clip_preprocess(img)
    assert out.shape == (2, 224, 224, 3)
    # 128/255 normalized by CLIP mean/std
    exp = (128 / 255.0 - 0.48145466) / 0.26862954
    np.testing.assert_allclose(out[0, 0, 0, 0], exp, atol=1e-4)
    # already-224 input passes through without resize
    assert clip_preprocess(jnp.zeros((1, 224, 224, 3), jnp.float32)).shape == (
        1,
        224,
        224,
        3,
    )


@pytest.fixture(scope="module")
def rgb_obs():
    return {"rgb": jnp.zeros((1, 64, 64, 3), jnp.uint8)}


def test_attnpool_output_and_frozen(rgb_obs):
    enc = ResNetCLIPEncoder(pooling="attnpool")
    params = enc.init(jax.random.PRNGKey(0), rgb_obs)
    out, vjp = jax.vjp(lambda p: enc.apply(p, rgb_obs), params)
    assert out.shape == (1, 1024)
    assert np.isfinite(np.asarray(out)).all()
    # frozen: stop_gradient kills all grads through the trunk
    (g,) = vjp(jnp.ones_like(out))
    assert all(float(jnp.abs(x).max()) == 0.0 for x in jax.tree_util.tree_leaves(g))


def test_rgbd_sum_pool():
    obs = {
        "rgb": jnp.zeros((1, 64, 64, 3), jnp.uint8),
        "depth": jnp.full((1, 64, 64, 1), 0.5, jnp.float32),
    }
    enc = ResNetCLIPEncoder()
    params = enc.init(jax.random.PRNGKey(0), obs)
    out = enc.apply(params, obs)
    assert out.shape == (1, 2048)  # summed maps -> global avg pool


def test_output_dim_helper():
    assert ResNetCLIPEncoder.output_dim({"rgb"}, "attnpool") == 1024
    assert ResNetCLIPEncoder.output_dim({"rgb"}, "avgpool") == 2048
    assert ResNetCLIPEncoder.output_dim({"rgb", "depth"}) == 2048
    assert ResNetCLIPEncoder.output_dim({"rgb"}, "none") == 2048 * 49


def _synthetic_torch_sd(rng):
    """Build a torch-layout RN50-visual state dict with random values."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.01

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    conv("conv1", 32, 3, 3), bn("bn1", 32)
    conv("conv2", 32, 32, 3), bn("bn2", 32)
    conv("conv3", 64, 32, 3), bn("bn3", 64)
    inp = 64
    for stage, depth in enumerate((3, 4, 6, 3)):
        planes = 64 * 2**stage
        for b in range(depth):
            p = f"layer{stage + 1}.{b}"
            conv(f"{p}.conv1", planes, inp, 1), bn(f"{p}.bn1", planes)
            conv(f"{p}.conv2", planes, planes, 3), bn(f"{p}.bn2", planes)
            conv(f"{p}.conv3", planes * 4, planes, 1), bn(f"{p}.bn3", planes * 4)
            if b == 0:
                conv(f"{p}.downsample.0", planes * 4, inp, 1)
                bn(f"{p}.downsample.1", planes * 4)
            inp = planes * 4
    sd["attnpool.positional_embedding"] = (
        rng.standard_normal((50, 2048)).astype(np.float32) * 0.01
    )
    for proj, o in (("q_proj", 2048), ("k_proj", 2048), ("v_proj", 2048), ("c_proj", 1024)):
        sd[f"attnpool.{proj}.weight"] = (
            rng.standard_normal((o, 2048)).astype(np.float32) * 0.01
        )
        sd[f"attnpool.{proj}.bias"] = np.zeros(o, np.float32)
    return sd


def test_weight_import_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    sd = _synthetic_torch_sd(rng)
    path = tmp_path / "rn50_visual.npz"
    np.savez(path, **{f"visual.{k}": v for k, v in sd.items()})

    trunk = CLIPResNet()
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), x)
    loaded = load_clip_rn50_weights(params, str(path))
    # conv1 kernel must equal the transposed torch weight
    got = np.asarray(loaded["params"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    got_pe = np.asarray(loaded["params"]["attnpool"]["positional_embedding"])
    np.testing.assert_allclose(got_pe, sd["attnpool.positional_embedding"])
    out = trunk.apply(loaded, x)
    assert out.shape == (1, 1024) and np.isfinite(np.asarray(out)).all()

    with pytest.raises(FileNotFoundError):
        load_clip_rn50_weights(params, "/nonexistent/rn50.npz")
