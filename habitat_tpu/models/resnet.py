"""GroupNorm ResNet family for visual encoding (Flax linen).

Counterpart of the reference's torch ResNet zoo
(habitat-baselines/habitat_baselines/rl/ddppo/policy/resnet.py: resnet18/50,
SE-ResNeXt variants with GroupNorm since batch statistics are invalid under
on-policy RL). Re-designed for TPU: NHWC layout, bfloat16 compute with fp32
params/norms, channels padded to lane width where it matters, all convs lower
onto the MXU.

Provides: resnet9, resnet18, resnet50, se_resnext50, se_resnext101 builders
(reference rl/ddppo/README.md:35-45 model table).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp
from jax import lax
from flax import linen as nn


class StemConv(nn.Module):
    """7x7/stride-2 stem conv, computed as an EXACT space-to-depth-4 3x3 conv.

    Why: with RGBD input the stem has Cin=4, and XLA's TPU conv emitter turns
    its weight-gradient into a degenerate (batch*spatial)-contraction that
    measured ~7 TF/s (29.7 ms of the headline update; PROGRESS.md round-2
    trace). Packing 4x4 input pixels into channels (Cin=64) and 2x2 output
    pixels into channels (Cout=4*features) re-expresses the same arithmetic
    as a 3x3 stride-1 conv with layer3-like shapes, which the emitter runs at
    >200 TF/s here. The weight tensor keeps the reference (7,7,Cin,features)
    shape/init; the packed kernel is an index-shuffle of it (plus structural
    zeros), so the module is numerically the original conv (same products,
    f32 accumulation) and gradients flow to the same parameter.

    Padding matches flax nn.Conv "SAME" for k=7,s=2 (lo=2, hi=3). Falls back
    to a plain conv when H or W is not divisible by 4. No bias (reference
    rl/ddppo/policy/resnet.py stem uses bias=False).

    MEASURED NEGATIVE at the headline bench (kept as a recorded experiment,
    equivalence-tested in tests/test_stem_conv.py): the full train step went
    14.1k -> 11.7k sps — the 268MB space-to-depth pack/unpack transposes and
    their transposed counterparts in the backward pass cost more than the
    30ms wgrad win.

    ROUND-3 FOLLOW-UP, ALSO NEGATIVE (scripts/exp_stem_packed.py): packing
    obs once at render time (fwd-only, 10.3 ms @ B=4096) and consuming the
    packed layout directly — packed 3x3 conv + PACKED maxpool (max over 9
    lane-sliced shifted views, no depth-to-space round trip) — measured
    36.6 ms fwd+bwd vs 20.5 ms for the plain conv1+pool at B=4096. The
    emitter's packed conv + the 9-view pool backward cost more than the
    Cin=4 degeneracy they remove. With the 5 round-2 Pallas formulations
    (Mosaic relayout costs) this closes the whole shifted/packed stem
    family; conv1 stays on the plain XLA conv.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @staticmethod
    def _pack_plan():
        # k = 4*d + p - 2*q - 2 for each (d in 0..2, p in 0..3, q in 0..1);
        # valid taps land in [0, 7) of the original kernel.
        d = np.arange(3)[:, None, None]
        p = np.arange(4)[None, :, None]
        q = np.arange(2)[None, None, :]
        k = 4 * d + p - 2 * q - 2  # (3,4,2)
        valid = (k >= 0) & (k < 7)
        return np.clip(k, 0, 7), valid

    @nn.compact
    def __call__(self, x):  # (B,H,W,C)
        B, H, W, C = x.shape
        f = self.features
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, C, f), jnp.float32
        )
        x = x.astype(self.dtype)
        if H % 4 or W % 4:
            return lax.conv_general_dilated(
                x,
                w.astype(self.dtype),
                (2, 2),
                padding=[(2, 3), (2, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        ky, vy = self._pack_plan()
        # wp[7,:]/[:,7] = 0 absorbs clipped out-of-range taps
        wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        iy = ky.reshape(3, 4, 2, 1, 1, 1)
        ix = ky.reshape(1, 1, 1, 3, 4, 2)
        mask = (vy.reshape(3, 4, 2, 1, 1, 1) & vy.reshape(1, 1, 1, 3, 4, 2))
        ws = wp[iy, ix] * mask[..., None, None]  # (dy,py,qy,dx,px,qx,C,f)
        ws = ws.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(3, 3, 16 * C, 4 * f)
        # space-to-depth 4: feature index = (py*4+px)*C + ci
        xs = x.reshape(B, H // 4, 4, W // 4, 4, C)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, W // 4, 16 * C)
        y = lax.conv_general_dilated(
            xs,
            ws.astype(self.dtype),
            (1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, H/4, W/4, 4f); feature index = (qy*2+qx)*f + co
        y = y.reshape(B, H // 4, W // 4, 2, 2, f)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, f)
        return y


def _gn(num_groups: int = 32, dtype=jnp.float32):
    return partial(nn.GroupNorm, num_groups=num_groups, epsilon=1e-5, dtype=dtype)


class SEBlock(nn.Module):
    """Squeeze-excitation (for SE-ResNeXt variants)."""

    channels: int
    reduction: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))  # (N,C)
        s = nn.Dense(max(self.channels // self.reduction, 4), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    ngroups: int = 32
    use_se: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # GN in the conv dtype (bf16): flax computes the group statistics in
        # f32 internally regardless, so this only moves the normalize/affine
        # arithmetic to bf16 and deletes the cast pair around every conv
        gn = _gn(self.ngroups, dtype=self.dtype)
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride), use_bias=False, dtype=self.dtype)(x)
        y = gn()(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), use_bias=False, dtype=self.dtype)(y)
        y = gn()(y)
        if self.use_se:
            y = SEBlock(self.planes, dtype=self.dtype)(y)
        if x.shape[-1] != self.planes or self.stride != 1:
            x = nn.Conv(
                self.planes, (1, 1), (self.stride, self.stride), use_bias=False, dtype=self.dtype
            )(x)
            x = gn()(x)
        return nn.relu(x + y)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    ngroups: int = 32
    cardinality: int = 1  # >1 = ResNeXt grouped conv
    use_se: bool = False
    expansion: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        gn = _gn(self.ngroups, dtype=self.dtype)
        out_ch = self.planes * self.expansion
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = gn()(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes,
            (3, 3),
            (self.stride, self.stride),
            feature_group_count=self.cardinality,
            use_bias=False,
            dtype=self.dtype,
        )(y)
        y = gn()(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = gn()(y)
        if self.use_se:
            y = SEBlock(out_ch, dtype=self.dtype)(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), (self.stride, self.stride), use_bias=False, dtype=self.dtype)(x)
            x = gn()(x)
        return nn.relu(x + y)


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    block: str  # "basic" | "bottleneck"
    layers: Tuple[int, ...]
    base_planes: int = 32
    ngroups: int = 16
    cardinality: int = 1
    use_se: bool = False
    expansion: int = 1


SPECS = {
    "resnet9": ResNetSpec("basic", (1, 1, 1, 1)),
    "resnet18": ResNetSpec("basic", (2, 2, 2, 2)),
    "resnet50": ResNetSpec("bottleneck", (3, 4, 6, 3), expansion=4),
    "resneXt50": ResNetSpec(
        "bottleneck", (3, 4, 6, 3), cardinality=32, expansion=2
    ),
    "se_resnet50": ResNetSpec("bottleneck", (3, 4, 6, 3), use_se=True, expansion=4),
    "se_resneXt50": ResNetSpec(
        "bottleneck", (3, 4, 6, 3), cardinality=32, use_se=True, expansion=2
    ),
    "se_resneXt101": ResNetSpec(
        "bottleneck", (3, 4, 23, 3), cardinality=32, use_se=True, expansion=2
    ),
}


class ResNet(nn.Module):
    """Backbone: stem (7x7/2 + maxpool/2) + 4 stages. Returns final feature map.

    The reference narrows base_planes to input_channels-scaled widths
    (resnet_policy.py ResNetEncoder:165 passes baseplanes=32, ngroups=16).
    """

    spec: ResNetSpec
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (N,H,W,C) float
        s = self.spec
        gn = _gn(s.ngroups, dtype=self.dtype)
        x = x.astype(self.dtype)
        # Stem stays on the plain conv: the StemConv space-to-depth-4 packing
        # above fixes the degenerate Cin=4 weight-gradient (7 TF/s, 29.7 ms
        # of the update) but its 268MB pack/unpack transposes + their bwd
        # counterparts cost more than the wgrad win at the headline shapes
        # (full step 14.1k -> 11.7k sps measured; PROGRESS.md round-2 cont.).
        x = nn.Conv(s.base_planes, (7, 7), (2, 2), use_bias=False, dtype=self.dtype)(x)
        x = gn()(x)
        x = nn.relu(x)
        # maxpool bwd stays on XLA's select-and-scatter: every custom-VJP
        # formulation measured SLOWER at the bench minibatch (9-offset
        # strided-scatter 36 ms, gather-form 34 ms, Pallas (H,W,C,B) kernel
        # 13.9 vs XLA's 10.5 ms fwd+bwd — the B<->HWC transposes around the
        # kernel eat the win; see ops/pool.py and PROGRESS.md)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        planes = s.base_planes
        for i, n_blocks in enumerate(s.layers):
            stride = 1 if i == 0 else 2
            for b in range(n_blocks):
                st = stride if b == 0 else 1
                if s.block == "basic":
                    x = BasicBlock(
                        planes, st, s.ngroups, use_se=s.use_se, dtype=self.dtype
                    )(x)
                else:
                    x = Bottleneck(
                        planes,
                        st,
                        s.ngroups,
                        cardinality=s.cardinality,
                        use_se=s.use_se,
                        expansion=s.expansion,
                        dtype=self.dtype,
                    )(x)
            planes *= 2
        return x

    @property
    def final_channels(self) -> int:
        s = self.spec
        mult = s.expansion if s.block == "bottleneck" else 1
        return s.base_planes * (2 ** (len(s.layers) - 1)) * mult


class ResNetEncoder(nn.Module):
    """Visual encoder: normalize -> resnet -> 3x3 compression conv -> flatten.

    Matches the reference encoder's contract (resnet_policy.py:165-240):
    output is a flat vector of ~``output_size`` (they compress spatial output
    to 2048 flat with a 3x3 conv + GroupNorm + ReLU).
    """

    backbone: str = "resnet18"
    base_planes: int = 32
    ngroups: int = 16
    output_size: int = 2048
    normalize_visual_inputs: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: dict) -> jnp.ndarray:
        imgs = []
        if "rgb" in obs:
            imgs.append(obs["rgb"].astype(jnp.float32) / 255.0)
        if "depth" in obs:
            imgs.append(obs["depth"].astype(jnp.float32))
        assert imgs, "ResNetEncoder requires rgb and/or depth in obs"
        x = jnp.concatenate(imgs, axis=-1)
        if self.normalize_visual_inputs:
            # per-image standardization stands in for the reference's
            # RunningMeanAndVar (rl/ddppo/policy/running_mean_and_var.py,
            # used for RGB; depth is already [0,1])
            mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
            x = (x - mean) / jnp.sqrt(var + 1e-5)

        spec = dataclasses.replace(
            SPECS[self.backbone], base_planes=self.base_planes, ngroups=self.ngroups
        )
        feat = ResNet(spec, dtype=self.dtype)(x)  # (N,h,w,c)
        h, w = feat.shape[1], feat.shape[2]
        # compression conv to ~output_size flat (reference :217-240)
        comp_ch = max(self.output_size // (h * w), 1)
        # round to fp32 lane-friendly multiple of 8
        comp_ch = ((comp_ch + 7) // 8) * 8
        y = nn.Conv(comp_ch, (3, 3), use_bias=False, dtype=self.dtype)(feat)
        y = nn.GroupNorm(num_groups=min(self.ngroups, comp_ch), epsilon=1e-5)(y)
        y = nn.relu(y)
        return y.reshape(y.shape[0], -1).astype(jnp.float32)
