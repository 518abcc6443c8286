"""Auxiliary losses: CPC|A — action-conditional contrastive predictive coding.

Counterpart of reference habitat-baselines/habitat_baselines/rl/ppo/
cpc_aux_loss.py (355 LoC): from each rollout step's belief (RNN feature),
roll a GRU forward conditioned on the taken actions and classify the true
future visual embedding against time-shuffled negatives, k = 1..K steps ahead.
Episode boundaries mask the targets (same role as the reference's
subsampled-step masking).

Functional: module params live next to the policy params; the learner adds
``aux_loss_coef * cpca_loss`` inside the same jitted update.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from habitat_tpu.core.registry import registry


@registry.register_auxiliary_loss(name="cpca")
class CPCA(nn.Module):
    """k-step action-conditional CPC."""

    num_steps: int = 4  # K lookahead
    action_embed: int = 32
    hidden: int = 128
    num_actions: int = 4
    loss_scale: float = 0.1

    @nn.compact
    def __call__(
        self,
        beliefs: jnp.ndarray,  # (T, N, H) RNN features
        visual_feats: jnp.ndarray,  # (T, N, F) visual embeddings (targets)
        actions: jnp.ndarray,  # (T, N) int32
        masks: jnp.ndarray,  # (T, N) 1.0 = episode continues into this step
        rng: jax.Array,
    ) -> jnp.ndarray:
        T, N, H = beliefs.shape
        F = visual_feats.shape[-1]
        a_emb = nn.Embed(self.num_actions + 1, self.action_embed)(
            actions.astype(jnp.int32)
        )
        gru = nn.GRUCell(self.hidden)
        proj_in = nn.Dense(self.hidden)
        target_proj = nn.Dense(self.hidden)
        cls = nn.Dense(1)

        tgt = target_proj(jax.lax.stop_gradient(visual_feats))  # (T,N,hid)
        # negatives: shuffle targets over time per env
        perm = jax.random.permutation(rng, T)
        neg = tgt[perm]

        total = jnp.float32(0.0)
        denom = jnp.float32(0.0)
        h = proj_in(beliefs)  # (T,N,hid) start states
        valid = jnp.ones((T, N), jnp.float32)
        for k in range(1, self.num_steps + 1):
            idx = jnp.arange(T - k)
            # step the GRU with the action taken at t+k-1
            a_k = a_emb[idx + k - 1]  # (T-k, N, A)
            # chain: k=1 starts from the belief; k>1 continues last k's state
            h_prev = h[idx] if k == 1 else h_step[:-1]  # noqa: F821
            h_flat = h_prev.reshape(-1, self.hidden)
            a_flat = a_k.reshape(-1, self.action_embed)
            h_new, _ = gru(h_flat, a_flat)
            h_step = h_new.reshape(T - k, N, self.hidden)
            # masks: chain of not-done from t+1..t+k
            valid = valid[: T - k] * masks[idx + k] if k == 1 else valid[:-1] * masks[idx + k]
            pos_logit = cls(h_step * tgt[idx + k])[..., 0]
            neg_logit = cls(h_step * neg[idx + k])[..., 0]
            # binary NCE
            loss_k = (
                -jax.nn.log_sigmoid(pos_logit) - jax.nn.log_sigmoid(-neg_logit)
            )
            total = total + jnp.sum(loss_k * valid)
            denom = denom + jnp.sum(valid)
        return self.loss_scale * total / jnp.maximum(denom, 1.0)
