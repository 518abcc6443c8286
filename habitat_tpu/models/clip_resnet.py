"""CLIP-RN50 visual encoder (TPU-native flax reimplementation).

Counterpart of the reference's ResNetCLIPEncoder (habitat-baselines/
habitat_baselines/rl/ddppo/policy/resnet_policy.py:279-391), which wraps
OpenAI's `clip.load("RN50")` torch model as a FROZEN feature extractor with
three pooling modes. We reimplement the CLIP "modified ResNet" visual trunk
directly in flax (bf16 matmuls on the MXU, frozen batch-norm folded into an
affine), because the clip package's torch graph would leave the XLA program.

Architecture (matches the public CLIP RN50 visual trunk):
  - 3-conv stem (each 3x3; stride-2 on the first) + blur-free avg-pool 2,
  - 4 stages of "anti-aliased" bottlenecks [3,4,6,3] where stride-2
    downsampling is avgpool-then-conv instead of strided conv,
  - AttentionPool2d head: learned positional embedding over the 7x7 grid +
    one multi-head attention readout with the mean token as query
    (embed 2048, 32 heads, output 1024).

Frozen semantics (reference :341-345 freezes all params and eval()s BN): the
whole trunk runs under `stop_gradient`, and batch-norm is a pure affine using
stored running statistics. Weights can be imported from a LOCAL torch/npz
CLIP checkpoint via `load_clip_rn50_weights` (this environment has zero
egress, so nothing is downloaded; random init is used otherwise and the
encoder still provides the correct shapes/compute for training-from-scratch).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

# CLIP preprocessing constants (public CLIP preprocess pipeline).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
CLIP_RESOLUTION = 224


class FrozenBatchNorm(nn.Module):
    """Eval-mode batch norm: affine with stored running statistics.

    Parameters live in the "params" collection so a checkpoint loader can
    fill them; gradients never flow (the encoder is wrapped in stop_gradient).
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        scale = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        mean = self.param("mean", nn.initializers.zeros, shape)
        var = self.param("var", nn.initializers.ones, shape)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


def _conv(features, kernel, stride=1, name=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        dtype=jnp.bfloat16,
        name=name,
    )


class CLIPBottleneck(nn.Module):
    """CLIP's anti-aliased bottleneck: all convs stride 1; spatial reduction
    is an avg-pool placed after conv2 (and in the shortcut)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(_conv(self.planes, 1, name="conv1")(x)))
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(_conv(self.planes, 3, name="conv2")(y)))
        if self.stride > 1:
            y = nn.avg_pool(y, (self.stride, self.stride), (self.stride, self.stride))
        y = FrozenBatchNorm(out_ch, name="bn3")(_conv(out_ch, 1, name="conv3")(y))
        if self.stride > 1 or x.shape[-1] != out_ch:
            x = nn.avg_pool(x, (self.stride, self.stride), (self.stride, self.stride)) if self.stride > 1 else x
            x = FrozenBatchNorm(out_ch, name="downsample_bn")(
                _conv(out_ch, 1, name="downsample_conv")(x)
            )
        return nn.relu(y + x)


class AttentionPool2d(nn.Module):
    """CLIP's attention-pool readout: mean token as query over grid+mean
    tokens with a learned positional embedding."""

    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int = 7

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c)
        mean_tok = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # (N, 1+HW, C)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(1.0 / c**0.5),
            (self.spacial_dim**2 + 1, c),
        )
        tokens = tokens + pos[None].astype(tokens.dtype)
        q = nn.Dense(self.embed_dim, name="q_proj", dtype=jnp.bfloat16)(tokens[:, :1])
        k = nn.Dense(self.embed_dim, name="k_proj", dtype=jnp.bfloat16)(tokens)
        v = nn.Dense(self.embed_dim, name="v_proj", dtype=jnp.bfloat16)(tokens)
        hd = self.embed_dim // self.num_heads
        q = q.reshape(n, 1, self.num_heads, hd)
        k = k.reshape(n, -1, self.num_heads, hd)
        v = v.reshape(n, -1, self.num_heads, hd)
        att = jnp.einsum("nqhd,nkhd->nhqk", q, k).astype(jnp.float32) / hd**0.5
        att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(n, self.embed_dim)
        return nn.Dense(self.output_dim, name="c_proj", dtype=jnp.bfloat16)(out)


class CLIPResNet(nn.Module):
    """The CLIP modified-ResNet visual trunk (RN50: layers (3,4,6,3))."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    embed_dim: int = 1024
    pooling: str = "attnpool"  # attnpool | avgpool | none

    @nn.compact
    def __call__(self, x):  # (N, 224, 224, 3) normalized float
        x = x.astype(jnp.bfloat16)
        w = self.width
        x = nn.relu(FrozenBatchNorm(w // 2, name="bn1")(_conv(w // 2, 3, 2, name="conv1")(x)))
        x = nn.relu(FrozenBatchNorm(w // 2, name="bn2")(_conv(w // 2, 3, 1, name="conv2")(x)))
        x = nn.relu(FrozenBatchNorm(w, name="bn3")(_conv(w, 3, 1, name="conv3")(x)))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        planes = w
        for stage, depth in enumerate(self.layers):
            for block in range(depth):
                stride = 2 if (block == 0 and stage > 0) else 1
                x = CLIPBottleneck(
                    planes, stride=stride, name=f"layer{stage + 1}_{block}"
                )(x)
            planes *= 2
        # final grid: 224 / 32 = 7
        if self.pooling == "attnpool":
            x = AttentionPool2d(
                embed_dim=x.shape[-1],
                num_heads=32,
                output_dim=self.embed_dim,
                spacial_dim=x.shape[1],
                name="attnpool",
            )(x)
        elif self.pooling == "avgpool":
            x = x.mean(axis=(1, 2))
        return x.astype(jnp.float32)


def clip_preprocess(img: jnp.ndarray) -> jnp.ndarray:
    """uint8/float (N,H,W,3) -> CLIP-normalized (N,224,224,3) float32.

    Mirrors the reference's torchvision pipeline (resnet_policy.py:310-321):
    resize shortest edge to 224, center crop 224, scale to [0,1], normalize
    with CLIP mean/std. Static shapes; bilinear resize on device.
    """
    x = img.astype(jnp.float32)
    if img.dtype == jnp.uint8:
        x = x / 255.0
    n, h, w, c = x.shape
    if (h, w) != (CLIP_RESOLUTION, CLIP_RESOLUTION):
        scale = CLIP_RESOLUTION / min(h, w)
        nh, nw = max(CLIP_RESOLUTION, round(h * scale)), max(
            CLIP_RESOLUTION, round(w * scale)
        )
        x = jax.image.resize(x, (n, nh, nw, c), method="bilinear")
        top, left = (nh - CLIP_RESOLUTION) // 2, (nw - CLIP_RESOLUTION) // 2
        x = x[:, top : top + CLIP_RESOLUTION, left : left + CLIP_RESOLUTION]
    return (x - CLIP_MEAN) / CLIP_STD


class ResNetCLIPEncoder(nn.Module):
    """Frozen CLIP-RN50 observation encoder (reference resnet_policy.py:279).

    pooling: "attnpool" -> (1024,), "avgpool" -> (2048,), "none" -> 7*7*2048.
    rgb+depth together: per-modality (2048,7,7) feature maps are SUMMED then
    average-pooled to (2048,) (reference :385-387). Depth is replicated to
    3 channels and pushed through the same trunk (reference :369-383).
    The trunk runs under stop_gradient — features only, never finetuned
    (reference :341-345).
    """

    pooling: str = "attnpool"

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        has_rgb = "rgb" in obs
        has_depth = "depth" in obs
        both = has_rgb and has_depth
        pooling = "none" if both else self.pooling
        trunk = CLIPResNet(pooling=pooling, name="backbone")

        feats = []
        if has_rgb:
            feats.append(trunk(clip_preprocess(obs["rgb"])))
        if has_depth:
            d = jnp.clip(obs["depth"][..., 0:1], 0.0, 1.0)
            d3 = jnp.repeat(d, 3, axis=-1)
            feats.append(trunk(clip_preprocess(d3)))
        if not feats:
            raise ValueError("ResNetCLIPEncoder requires rgb and/or depth")

        if both:
            x = (feats[0] + feats[1]).mean(axis=(1, 2))  # (N, 2048)
        elif pooling == "none":
            x = feats[0].reshape(feats[0].shape[0], -1)
        else:
            x = feats[0]
        return jax.lax.stop_gradient(x)

    @staticmethod
    def output_dim(obs_keys, pooling: str = "attnpool") -> int:
        both = "rgb" in obs_keys and "depth" in obs_keys
        if both or pooling == "avgpool":
            return 2048
        if pooling == "none":
            return 2048 * 7 * 7
        return 1024


def load_clip_rn50_weights(
    params: dict, path: str, prefix: Tuple[str, ...] = ("params",)
) -> dict:
    """Import CLIP RN50 visual weights from a LOCAL checkpoint into a flax
    params pytree produced by CLIPResNet.init.

    Accepts a .npz of numpy arrays keyed by the torch state-dict names
    (`visual.conv1.weight`, ...) or a torch .pt state dict if torch can read
    it. Zero-egress environment: never downloads; raises FileNotFoundError
    if the file is absent so callers can gate on availability.
    """
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        raw = torch.load(path, map_location="cpu")
        sd = {
            k: v.float().numpy()
            for k, v in (raw.state_dict() if hasattr(raw, "state_dict") else raw).items()
        }
    sd = {k[len("visual.") :]: v for k, v in sd.items() if k.startswith("visual.")} or sd

    import copy

    out = copy.deepcopy(params)

    def node(tree, keys):
        for k in keys:
            tree = tree[k]
        return tree

    trunk = node(out, prefix)
    if "backbone" in trunk:
        trunk = trunk["backbone"]

    def put_conv(dst, name):
        w = sd[name + ".weight"]  # (O, I, kh, kw) torch
        dst["kernel"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))

    def put_bn(dst, name):
        dst["scale"] = jnp.asarray(sd[name + ".weight"])
        dst["bias"] = jnp.asarray(sd[name + ".bias"])
        dst["mean"] = jnp.asarray(sd[name + ".running_mean"])
        dst["var"] = jnp.asarray(sd[name + ".running_var"])

    for i in (1, 2, 3):
        put_conv(trunk[f"conv{i}"], f"conv{i}")
        put_bn(trunk[f"bn{i}"], f"bn{i}")
    layer_depths = (3, 4, 6, 3)
    for stage, depth in enumerate(layer_depths):
        for b in range(depth):
            src = f"layer{stage + 1}.{b}"
            dst = trunk[f"layer{stage + 1}_{b}"]
            for i in (1, 2, 3):
                put_conv(dst[f"conv{i}"], f"{src}.conv{i}")
                put_bn(dst[f"bn{i}"], f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                # torch order: (avgpool, conv, bn) -> indices 0=conv? CLIP uses
                # Sequential(avgpool, conv, bn): 0 is avgpool (no params), so
                # conv=1 ("-1.weight" style differs across dumps); handle both.
                cidx = "0" if f"{src}.downsample.0.weight" in sd else "1"
                dst["downsample_conv"]["kernel"] = jnp.asarray(
                    np.transpose(sd[f"{src}.downsample.{cidx}.weight"], (2, 3, 1, 0))
                )
                put_bn(dst["downsample_bn"], f"{src}.downsample.{int(cidx) + 1}")
    if "attnpool" in trunk and "attnpool.positional_embedding" in sd:
        ap = trunk["attnpool"]
        ap["positional_embedding"] = jnp.asarray(sd["attnpool.positional_embedding"])
        for p in ("q_proj", "k_proj", "v_proj", "c_proj"):
            ap[p]["kernel"] = jnp.asarray(sd[f"attnpool.{p}.weight"].T)
            ap[p]["bias"] = jnp.asarray(sd[f"attnpool.{p}.bias"])
    return out
