"""Actor-critic policies (Flax linen).

Counterparts of the reference policy stack:
- Policy/NetPolicy + CategoricalNet/GaussianNet heads + CriticHead
  (habitat-baselines/habitat_baselines/rl/ppo/policy.py:99-428)
- PointNavResNetPolicy / PointNavResNetNet (rl/ddppo/policy/resnet_policy.py:50,
  :394 — per-goal-sensor embedding fusion :434-549, prev-action embed :747-759,
  RNN :762)
- PointNavBaselinePolicy with SimpleCNN (rl/ppo/policy.py:428 + simple_cnn.py)

Functional act/evaluate: ``apply`` returns distributions' parameters; sampling
uses explicit rng keys (no hidden state, fits inside the jitted rollout scan).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from habitat_tpu.core.registry import registry
from habitat_tpu.models.resnet import ResNetEncoder
from habitat_tpu.models.rnn_state_encoder import (
    RNNStateEncoder,
    initial_hidden_state,
)

PointGoalKeys = (
    "pointgoal_with_gps_compass",
    "pointgoal",
    "imagegoal_features",
)


class CategoricalHead(nn.Module):
    """Action logits head (reference CategoricalNet, policy.py)."""

    num_actions: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.num_actions,
            kernel_init=nn.initializers.orthogonal(0.01),
            bias_init=nn.initializers.zeros,
        )(x)


class CriticHead(nn.Module):
    """State-value head (reference policy.py:416)."""

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            1,
            kernel_init=nn.initializers.orthogonal(1.0),
            bias_init=nn.initializers.zeros,
        )(x)[..., 0]


class SimpleCNN(nn.Module):
    """3-conv baseline encoder (reference rl/models/simple_cnn.py)."""

    output_size: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        imgs = []
        if "rgb" in obs:
            imgs.append(obs["rgb"].astype(jnp.float32) / 255.0)
        if "depth" in obs:
            imgs.append(obs["depth"].astype(jnp.float32))
        x = jnp.concatenate(imgs, axis=-1).astype(self.dtype)
        x = nn.Conv(32, (8, 8), (4, 4), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (4, 4), (2, 2), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), (1, 1), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return nn.relu(nn.Dense(self.output_size)(x))


class PointNavResNetNet(nn.Module):
    """Visual encoder + goal/prev-action fusion + RNN
    (reference resnet_policy.py:394-762)."""

    num_actions: int
    backbone: str = "resnet18"
    hidden_size: int = 512
    rnn_type: str = "LSTM"
    num_recurrent_layers: int = 1
    base_planes: int = 32
    ngroups: int = 16
    normalize_visual_inputs: bool = False
    has_visual: bool = True
    goal_keys: Tuple[str, ...] = ("pointgoal_with_gps_compass",)
    discrete_actions: bool = True

    def rnn(self) -> RNNStateEncoder:
        return RNNStateEncoder(
            hidden_size=self.hidden_size,
            num_layers=self.num_recurrent_layers,
            rnn_type=self.rnn_type,
        )

    @nn.compact
    def __call__(
        self,
        obs: Dict[str, jnp.ndarray],
        hidden: jnp.ndarray,
        prev_actions: jnp.ndarray,
        masks: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """obs leaves: (N, ...) or (T, N, ...) matching masks (N,)/(T, N).
        Returns (features (.., H), new_hidden)."""
        seq_mode = masks.ndim == 2

        def flat(v):
            return v.reshape((-1,) + v.shape[2:]) if seq_mode else v

        parts = []
        if self.has_visual:
            visual_obs = {}
            for k in ("rgb", "depth", "semantic"):
                if k in obs:
                    visual_obs[k] = flat(obs[k])
            # rearrange head cameras (reference robot_head_* uuids)
            for k in ("robot_head_rgb", "robot_head_depth"):
                if k in obs:
                    visual_obs[k.split("_")[-1]] = flat(obs[k])
            if self.backbone.startswith("resnet50_clip"):
                # frozen CLIP-RN50 features (reference resnet_policy.py:81-82,
                # 279-391: backbones resnet50_clip_{avgpool,attnpool})
                from habitat_tpu.models.clip_resnet import ResNetCLIPEncoder

                enc = ResNetCLIPEncoder(
                    pooling=self.backbone.split("_")[-1], name="clip_encoder"
                )(visual_obs)
            else:
                enc = ResNetEncoder(
                    backbone=self.backbone,
                    base_planes=self.base_planes,
                    ngroups=self.ngroups,
                    normalize_visual_inputs=self.normalize_visual_inputs,
                )(visual_obs)
            visual_fc = nn.relu(nn.Dense(self.hidden_size)(enc))
            # expose the visual embedding for auxiliary losses (CPC|A targets,
            # reference cpc_aux_loss.py) without changing the call signature
            self.sow("intermediates", "visual_feats", visual_fc)
            parts.append(visual_fc)

        # image goals: a SECOND visual encoder over the goal view (reference
        # resnet_policy.py:523-539 goal_visual_encoder + goal_visual_fc)
        for k in ("imagegoal", "instance_imagegoal"):
            if k in obs:
                genc = ResNetEncoder(
                    backbone=self.backbone,
                    base_planes=self.base_planes,
                    ngroups=self.ngroups,
                    normalize_visual_inputs=self.normalize_visual_inputs,
                    name=f"goal_encoder_{k}",
                )({"rgb": flat(obs[k])})
                parts.append(
                    nn.relu(
                        nn.Dense(self.hidden_size, name=f"goal_visual_fc_{k}")(genc)
                    )
                )

        # goal embeddings (reference fuses each goal sensor through a 32-dim
        # embedding, resnet_policy.py:434-549); pointgoal polar form is
        # converted to (d, cos, sin) for continuity
        for k in self.goal_keys:
            if k not in obs:
                continue
            g = flat(obs[k]).astype(jnp.float32)
            if k in ("pointgoal_with_gps_compass", "pointgoal") and g.shape[-1] == 2:
                g = jnp.stack(
                    [g[..., 0], jnp.cos(-g[..., 1]), jnp.sin(-g[..., 1])], axis=-1
                )
            parts.append(nn.Dense(32, name=f"goal_fc_{k}")(g))
        for k in (
            "gps",
            "compass",
            "heading",
            "proximity",
            # rearrange state sensors (reference rearrange_sensors.py:51-468)
            "obj_start_sensor",
            "obj_goal_sensor",
            "joint",
            "is_holding",
            "ee_pos",
            "relative_resting_position",
            # referent-VLN candidate table (tasks/vln.py, round 5)
            "vln_candidates",
            # referent-EQA object table (tasks/eqa.py, round 5)
            "eqa_objects",
        ):
            if k in obs:
                parts.append(
                    nn.Dense(32, name=f"state_fc_{k}")(flat(obs[k]).astype(jnp.float32))
                )
        if "objectgoal" in obs:
            emb = nn.Embed(64, 32, name="objectgoal_embed")(
                flat(obs["objectgoal"])[..., 0].astype(jnp.int32)
            )
            parts.append(emb)

        # VLN instruction encoder (reference R2R seq2seq baseline: embedded
        # tokens -> LSTM, final hidden state conditions the policy; here an
        # LSTM scan over the padded token sequence with the last VALID state
        # selected by length)
        if "instruction" in obs or "question" in obs:
            # same encoder serves the EQA question tokens (round 5)
            toks = flat(
                obs["instruction"] if "instruction" in obs else obs["question"]
            ).astype(jnp.int32)  # (B, L)
            temb = nn.Embed(128, 32, name="instruction_embed")(toks)
            ScanLSTM = nn.scan(
                nn.OptimizedLSTMCell,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )
            cell = ScanLSTM(128, name="instruction_lstm")
            carry0 = cell.initialize_carry(
                jax.random.PRNGKey(0), temb[:, 0].shape
            )
            _, hs = cell(carry0, temb)  # (B, L, 128)
            lengths = jnp.maximum(jnp.sum((toks > 0).astype(jnp.int32), -1), 1)
            last = jnp.take_along_axis(
                hs, (lengths - 1)[:, None, None], axis=1
            )[:, 0]
            parts.append(last)

        # prev action embedding (reference :747-759: index 0 = "start")
        pa = flat(prev_actions)
        if self.discrete_actions:
            pa_idx = jnp.where(flat(masks) > 0, pa.astype(jnp.int32) + 1, 0)
            parts.append(nn.Embed(self.num_actions + 1, 32, name="prev_action_embed")(pa_idx))
        else:
            parts.append(nn.Dense(32, name="prev_action_fc")(pa))

        x = jnp.concatenate(parts, axis=-1)
        if seq_mode:
            T, N = masks.shape
            x = x.reshape(T, N, -1)
        feats, new_hidden = self.rnn()(x, hidden, masks)
        # expose the RNN belief for auxiliary losses (CPC|A beliefs — the
        # reference contrasts the RNN belief against the future *visual*
        # embedding, rl/ppo/cpc_aux_loss.py)
        self.sow("intermediates", "rnn_feats", feats)
        return feats, new_hidden


@dataclasses.dataclass
class PolicyActionData:
    """act() outputs (reference rl/ppo/policy.py:48-97)."""

    actions: jnp.ndarray
    values: jnp.ndarray
    action_log_probs: jnp.ndarray
    rnn_hidden_states: jnp.ndarray


class ActorCritic(nn.Module):
    """NetPolicy equivalent: net -> (logits, value) with act/evaluate_actions.

    Methods (invoked via .apply(..., method=...)):
      - __call__(obs, hidden, prev_actions, masks) -> (logits, values, hidden)
      - act(...) sampling handled functionally by the caller with the logits.
    """

    net: PointNavResNetNet

    def setup(self):
        self.action_head = CategoricalHead(self.net.num_actions)
        self.critic = CriticHead()

    def __call__(self, obs, hidden, prev_actions, masks):
        feats, new_hidden = self.net(obs, hidden, prev_actions, masks)
        logits = self.action_head(feats)
        values = self.critic(feats)
        return logits, values, new_hidden

    def initial_hidden(self, batch: int) -> jnp.ndarray:
        return initial_hidden_state(
            batch,
            self.net.hidden_size,
            self.net.num_recurrent_layers,
            self.net.rnn_type,
        )


def sample_action(logits: jnp.ndarray, key: jax.Array, deterministic: bool = False):
    """Categorical sample + log prob."""
    if deterministic:
        act = jnp.argmax(logits, axis=-1)
    else:
        act = jax.random.categorical(key, logits, axis=-1)
    logp = jax.nn.log_softmax(logits)
    act_logp = jnp.take_along_axis(logp, act[..., None], axis=-1)[..., 0]
    return act.astype(jnp.int32), act_logp


def evaluate_actions_stats(logits: jnp.ndarray, actions: jnp.ndarray):
    """(log_prob(actions), entropy) from logits (reference evaluate_actions)."""
    logp = jax.nn.log_softmax(logits)
    act_logp = jnp.take_along_axis(logp, actions[..., None].astype(jnp.int32), axis=-1)[..., 0]
    p = jnp.exp(logp)
    entropy = -jnp.sum(p * logp, axis=-1)
    return act_logp, entropy


@registry.register_policy(name="PointNavResNetPolicy")
def make_pointnav_resnet_policy(
    num_actions: int,
    *,
    backbone: str = "resnet18",
    hidden_size: int = 512,
    rnn_type: str = "LSTM",
    num_recurrent_layers: int = 1,
    normalize_visual_inputs: bool = False,
    has_visual: bool = True,
    goal_keys: Sequence[str] = ("pointgoal_with_gps_compass",),
) -> ActorCritic:
    """Builder registered under the reference's policy name
    (resnet_policy.py:50)."""
    return ActorCritic(
        net=PointNavResNetNet(
            num_actions=num_actions,
            backbone=backbone,
            hidden_size=hidden_size,
            rnn_type=rnn_type,
            num_recurrent_layers=num_recurrent_layers,
            normalize_visual_inputs=normalize_visual_inputs,
            has_visual=has_visual,
            goal_keys=tuple(goal_keys),
        )
    )


@registry.register_policy(name="PointNavBaselinePolicy")
def make_pointnav_baseline_policy(num_actions: int, hidden_size: int = 512, **kw):
    """SimpleCNN baseline (reference policy.py:428). Shares the ActorCritic
    scaffold with has_visual resnet swapped for SimpleCNN in a later pass;
    currently aliases the resnet9 variant."""
    return make_pointnav_resnet_policy(
        num_actions, backbone="resnet9", hidden_size=hidden_size, **kw
    )


class GaussianHead(nn.Module):
    """Continuous action head (reference GaussianNet, rl/ppo/policy.py —
    action_distribution_type 'gaussian' with state-independent log std,
    config action_dist.use_log_std/std_init)."""

    num_outputs: int
    std_init: float = 0.0
    min_log_std: float = -5.0
    max_log_std: float = 2.0

    @nn.compact
    def __call__(self, x):
        mu = nn.Dense(
            self.num_outputs,
            kernel_init=nn.initializers.orthogonal(0.01),
            bias_init=nn.initializers.zeros,
        )(x)
        log_std = self.param(
            "log_std",
            lambda k, s: jnp.full(s, self.std_init, jnp.float32),
            (self.num_outputs,),
        )
        log_std = jnp.clip(log_std, self.min_log_std, self.max_log_std)
        return mu, jnp.broadcast_to(log_std, mu.shape)


def sample_gaussian_action(mu, log_std, key, deterministic: bool = False):
    """Sample + log prob for the diagonal-Gaussian policy."""
    std = jnp.exp(log_std)
    if deterministic:
        act = mu
    else:
        act = mu + std * jax.random.normal(key, mu.shape)
    logp = -0.5 * jnp.sum(
        ((act - mu) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi), axis=-1
    )
    return act, logp


def evaluate_gaussian_actions(mu, log_std, actions):
    """(log_prob, entropy) for stored continuous actions."""
    std = jnp.exp(log_std)
    logp = -0.5 * jnp.sum(
        ((actions - mu) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi), axis=-1
    )
    entropy = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)
    return logp, entropy


class GaussianActorCritic(nn.Module):
    """Continuous-control actor-critic (rearrange arm/base velocity control —
    reference uses action_distribution_type='gaussian' for those tasks)."""

    net: PointNavResNetNet
    num_outputs: int = 10
    std_init: float = 0.0

    def setup(self):
        self.action_head = GaussianHead(self.num_outputs, std_init=self.std_init)
        self.critic = CriticHead()

    def __call__(self, obs, hidden, prev_actions, masks):
        feats, new_hidden = self.net(obs, hidden, prev_actions, masks)
        mu, log_std = self.action_head(feats)
        values = self.critic(feats)
        return (mu, log_std), values, new_hidden


@registry.register_policy(name="GaussianResNetPolicy")
def make_gaussian_resnet_policy(
    num_outputs: int,
    *,
    backbone: str = "resnet18",
    hidden_size: int = 512,
    rnn_type: str = "LSTM",
    num_recurrent_layers: int = 1,
    has_visual: bool = True,
    goal_keys: Sequence[str] = (),
    std_init: float = 0.0,
) -> GaussianActorCritic:
    return GaussianActorCritic(
        net=PointNavResNetNet(
            num_actions=1,  # prev-action embed unused for continuous
            backbone=backbone,
            hidden_size=hidden_size,
            rnn_type=rnn_type,
            num_recurrent_layers=num_recurrent_layers,
            has_visual=has_visual,
            goal_keys=tuple(goal_keys),
            discrete_actions=False,
        ),
        num_outputs=num_outputs,
        std_init=std_init,
    )
