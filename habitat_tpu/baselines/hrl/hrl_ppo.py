"""HRL-PPO: train a NEURAL high-level skill-selection policy with PPO.

Counterpart of the reference's neural high-level policy + HRL updater
(habitat-baselines/habitat_baselines/rl/hrl/hl/neural_policy.py:24 and the
HRL PPO wiring in rl/hrl/hierarchical_policy.py + rl/ppo/ppo.py via
HrlRolloutStorage rollout_storage.py). The reference records a transition
only when a skill terminates (variable-length macro-steps, masked storage);
that data-dependent storage layout doesn't compile to static shapes, so the
TPU-native design uses FIXED-INTERVAL macro-steps: the HL policy picks a
skill every `hl_interval` env steps, the window reward is gamma-discounted
into one macro reward, and PPO runs on the (T_hl,) macro transitions with an
effective discount gamma**hl_interval. Skills execute exactly as in
hierarchical.py: every skill computes its batched action, one jnp.select
per lane — the whole rollout+update is ONE jitted program.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from habitat_tpu.baselines.ppo import compute_gae
from habitat_tpu.core.registry import registry


class HrlPPOConfig(NamedTuple):
    """HL-PPO hyperparameters (PPO defaults per reference ppo.yaml; the HL
    policy's hidden size per neural_policy.py's MLP)."""

    num_macro_steps: int = 16  # HL decisions per rollout
    hl_interval: int = 8  # env steps per HL decision
    hidden_size: int = 128
    lr: float = 2.5e-4
    gamma: float = 0.99
    tau: float = 0.95
    clip_param: float = 0.2
    ppo_epoch: int = 2
    num_mini_batch: int = 2
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.01
    max_grad_norm: float = 0.2


class HighLevelNet(nn.Module):
    """MLP actor-critic over the flattened state-sensor vector (reference
    neural_policy.py:24 builds the same state-only MLP head)."""

    num_skills: int
    hidden_size: int = 128

    @nn.compact
    def __call__(self, feat):  # (..., F)
        x = nn.tanh(nn.Dense(self.hidden_size)(feat))
        x = nn.tanh(nn.Dense(self.hidden_size)(x))
        logits = nn.Dense(self.num_skills, name="actor")(x)
        value = nn.Dense(1, name="critic")(x)[..., 0]
        return logits, value


class HrlTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    env_state: object
    key: jax.Array
    update_idx: jnp.ndarray


class HrlPPOLearner:
    """Fused HL rollout + PPO update, one jitted step (mirrors ppo.py's
    PPOLearner structure for the low-level case)."""

    def __init__(self, env, skills: Sequence, config: HrlPPOConfig = HrlPPOConfig()):
        self.env = env
        self.skills = list(skills)
        self.cfg = config
        self.net = HighLevelNet(len(self.skills), config.hidden_size)
        self.optim = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(config.lr, eps=1e-5),
        )

    # -- featurization: state sensors only, flattened+concatenated ----------
    def _features(self, state) -> jnp.ndarray:
        obs = self.env._observations(state)
        n = self.env.num_envs
        parts = []
        for k in sorted(obs):
            v = obs[k]
            if v.ndim > 2 or v.dtype == jnp.uint8:  # skip visual sensors
                continue
            parts.append(v.reshape(n, -1).astype(jnp.float32))
        # skill progress signals: which skills report done right now
        dones = jnp.stack(
            [s.is_done(self.env, state) for s in self.skills], axis=-1
        ).astype(jnp.float32)
        parts.append(dones)
        return jnp.concatenate(parts, axis=-1)

    def _skill_actions(self, state, skill_idx) -> jnp.ndarray:
        acts = jnp.stack([s.act(self.env, state) for s in self.skills])  # (K,N)
        return jnp.take_along_axis(acts, skill_idx[None], axis=0)[0]

    def init_fn(self, key) -> HrlTrainState:
        k_env, k_net, k = jax.random.split(key, 3)
        env_state, _ = self.env.reset_fn(k_env)
        feat = self._features(env_state)
        params = self.net.init(k_net, feat)
        return HrlTrainState(
            params=params,
            opt_state=self.optim.init(params),
            env_state=env_state,
            key=k,
            update_idx=jnp.zeros((), jnp.int32),
        )

    # -- fused rollout + update ---------------------------------------------
    def train_step(self, ts: HrlTrainState) -> Tuple[HrlTrainState, Dict]:
        cfg = self.cfg
        env = self.env
        n = env.num_envs

        def macro_step(carry, _):
            env_state, key = carry
            key, k_act = jax.random.split(key)
            feat = self._features(env_state)
            logits, value = self.net.apply(ts.params, feat)
            skill = jax.random.categorical(k_act, logits)
            logp = jax.nn.log_softmax(logits)[jnp.arange(n), skill]

            def env_step(inner, t):
                env_state, rew_acc, done_any = inner
                act = self._skill_actions(env_state, skill)
                env_state, _, r, done, info = env.step_fn(env_state, act)
                rew_acc = rew_acc + (cfg.gamma**t) * r * (1.0 - done_any)
                done_any = jnp.maximum(done_any, done.astype(jnp.float32))
                # episode accounting at DONE steps (success is momentary:
                # the auto-reset wipes it next step, so sampling any single
                # substep undercounts)
                df = done.astype(jnp.float32)
                return (env_state, rew_acc, done_any), (
                    info["success"] * df,
                    df,
                )

            (env_state, macro_rew, done_any), (succ_d, done_f) = jax.lax.scan(
                env_step,
                (env_state, jnp.zeros((n,)), jnp.zeros((n,))),
                jnp.arange(cfg.hl_interval),
            )
            out = (
                feat, skill, logp, value, macro_rew, done_any,
                succ_d.sum(0), done_f.sum(0),
            )
            return (env_state, key), out

        (env_state, key), (
            feats, skills, logps, values, rews, dones, succ_d, done_f
        ) = jax.lax.scan(
            macro_step, (ts.env_state, ts.key), None, length=cfg.num_macro_steps
        )
        _, last_value = self.net.apply(ts.params, self._features(env_state))
        gamma_eff = cfg.gamma**cfg.hl_interval
        advantages, returns = compute_gae(
            rews, values, dones, last_value, gamma_eff, cfg.tau
        )
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-5)

        # flatten macro transitions; feed-forward HL net -> any ordering works
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        b_feat, b_skill, b_logp, b_adv, b_ret = map(
            flat, (feats, skills, logps, advantages, returns)
        )
        total = b_feat.shape[0]
        mb = total // cfg.num_mini_batch

        def loss_fn(params, idx):
            f, a, old_lp, adv, ret = (
                jax.lax.dynamic_slice_in_dim(x, idx * mb, mb)
                for x in (b_feat, b_skill, b_logp, b_adv, b_ret)
            )
            logits, value = self.net.apply(params, f)
            lp_all = jax.nn.log_softmax(logits)
            lp = lp_all[jnp.arange(mb), a]
            ratio = jnp.exp(lp - old_lp)
            surr = jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * adv,
            )
            entropy = -(jnp.exp(lp_all) * lp_all).sum(-1).mean()
            v_loss = 0.5 * jnp.square(value - ret).mean()
            loss = (
                -surr.mean()
                + cfg.value_loss_coef * v_loss
                - cfg.entropy_coef * entropy
            )
            return loss, (v_loss, entropy)

        def epoch(carry, _):
            params, opt_state = carry

            def minibatch(carry, idx):
                params, opt_state = carry
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, idx
                )
                updates, opt_state = self.optim.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, *aux)

            return jax.lax.scan(
                minibatch, carry, jnp.arange(cfg.num_mini_batch)
            )

        (params, opt_state), (losses, v_losses, entropies) = jax.lax.scan(
            epoch, (ts.params, ts.opt_state), None, length=cfg.ppo_epoch
        )
        metrics = {
            "losses/hl_loss": losses.mean(),
            "losses/hl_value_loss": v_losses.mean(),
            "losses/hl_entropy": entropies.mean(),
            "reward": rews.sum(0).mean(),
            # fraction of COMPLETED episodes this update that succeeded
            "success": succ_d.sum() / jnp.maximum(done_f.sum(), 1.0),
            "done_count": done_f.sum(),
        }
        return (
            HrlTrainState(
                params=params,
                opt_state=opt_state,
                env_state=env_state,
                key=key,
                update_idx=ts.update_idx + 1,
            ),
            metrics,
        )


registry.register_updater(HrlPPOLearner, name="hrl_ppo")


class HrlTrainer:
    """Thin trainer facade over HrlPPOLearner with the PPOTrainer CLI
    surface (_init/_train_step/train), so hierarchical experiment YAMLs
    (reference rl_hierarchical.yaml, updater_name HRLPPO) run through
    run.py / trainer_from_config like flat ones."""

    def __init__(self, learner: HrlPPOLearner, *, total_num_steps: float = 1e6,
                 log_interval: int = 10):
        self.learner = learner
        self.env = learner.env
        self.total_num_steps = total_num_steps
        self.log_interval = log_interval
        self._env_data = None
        self._init = jax.jit(lambda key, data=None: learner.init_fn(key))
        self._train_step = jax.jit(
            lambda ts, data=None: learner.train_step(ts)
        )

    def train(self, seed: int = 0):
        from habitat_tpu.core.logging import logger

        cfg = self.learner.cfg
        steps_per_update = (
            self.env.num_envs * cfg.num_macro_steps * cfg.hl_interval
        )
        ts = self._init(jax.random.PRNGKey(seed))
        steps = 0
        u = 0
        m = {}
        while steps < self.total_num_steps:
            ts, m = self._train_step(ts)
            steps += steps_per_update
            u += 1
            if u % self.log_interval == 0:
                logger.info(
                    f"hrl update {u} steps {steps}: "
                    + " ".join(
                        f"{k}={float(v):.4f}" for k, v in sorted(m.items())
                        if getattr(v, 'ndim', 1) == 0
                    )
                )
        return {k: float(v) for k, v in m.items() if getattr(v, "ndim", 1) == 0}
