"""PPO / DD-PPO as one fused jitted train step.

Re-architecture of the reference training loop (SURVEY §3.1):
PPOTrainer.train (rl/ppo/ppo_trainer.py:656) split rollout collection across
worker processes, staged observations CPU->GPU, and ran PPO epochs in torch
with DDP gradient all-reduce (rl/ddppo/algo/ddppo.py:105-157). Here the whole
update — rollout unroll (lax.scan over env.step_fn + policy act), GAE
(reference common/rollout_storage.py:174-205), and the clipped-surrogate PPO
epochs (reference rl/ppo/ppo.py:165-300) — is ONE jit. Sharding over the
``data`` mesh axis replaces DDP: env state lives sharded in HBM, params are
replicated, and XLA inserts the gradient all-reduce (the ddp_utils TCPStore/
NCCL machinery, ddp_utils.py:271-309, has no equivalent because SPMD is
lock-step by construction).

Math parity notes:
- GAE: delta = r + gamma*V'*nd - V;  A = delta + gamma*tau*nd*A'   (:174-205)
- policy loss: -min(ratio*A, clip(ratio)*A)                        (ppo.py:165+)
- value loss: 0.5*max((v-R)^2, (v_clip-R)^2) when clipped          (ppo.py)
- entropy bonus, grad-norm clip, Adam(eps)                         (ppo.py:301)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from habitat_tpu.core.batched_env import BatchedEnv, EnvState
from habitat_tpu.core.registry import registry
from habitat_tpu.models.policy import (
    ActorCritic,
    evaluate_actions_stats,
    evaluate_gaussian_actions,
    sample_action,
    sample_gaussian_action,
)
from habitat_tpu.models.rnn_state_encoder import initial_hidden_state


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Defaults mirror the reference structured config
    (habitat-baselines/habitat_baselines/config/default_structured_configs.py
    HabitatBaselinesRLConfig.rl.ppo)."""

    clip_param: float = 0.2
    ppo_epoch: int = 4
    num_mini_batch: int = 2
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.01
    lr: float = 2.5e-4
    eps: float = 1e-5
    max_grad_norm: float = 0.2
    num_steps: int = 128
    use_gae: bool = True
    gamma: float = 0.99
    tau: float = 0.95
    use_linear_lr_decay: bool = False
    use_linear_clip_decay: bool = False
    use_clipped_value_loss: bool = True
    use_normalized_advantage: bool = False
    reward_window_size: int = 50
    # Lagrangian-adaptive entropy coefficient (reference rl/ppo/ppo.py:87-101
    # + LagrangeInequalityCoefficient, utils/common.py:749): gaussian
    # policies only; alpha keeps mean entropy above
    # -entropy_target_factor * num_actions, clamped to [1e-4, 1.0]
    use_adaptive_entropy_pen: bool = False
    entropy_target_factor: float = 0.0
    # store float visual observations (rank>=4 leaves) in the rollout as
    # bfloat16 — the policy consumes them in bf16 anyway, and the (T,N,H,W,C)
    # depth tensor dominates rollout HBM traffic (no reference counterpart;
    # torch stores fp32)
    obs_store_bf16: bool = True


def _find_sow(tree, name):
    """Extract a sow'd intermediate by name from flax's mutable-state dict
    (values are stored as 1-tuples at arbitrary module depth)."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == name:
                return v[0] if isinstance(v, tuple) else v
            found = _find_sow(v, name)
            if found is not None:
                return found
    return None


class RolloutBatch(NamedTuple):
    """On-device rollout storage (counterpart of common/rollout_storage.py:112
    insert — but produced wholesale by the rollout scan, never staged via host)."""

    obs: Dict[str, jnp.ndarray]  # (T, N, ...)
    actions: jnp.ndarray  # (T, N)
    log_probs: jnp.ndarray  # (T, N)
    values: jnp.ndarray  # (T, N)
    rewards: jnp.ndarray  # (T, N)
    dones: jnp.ndarray  # (T, N) — done AFTER step t
    masks: jnp.ndarray  # (T, N) — 1 - done BEFORE step t ("not done" input mask)
    prev_actions: jnp.ndarray  # (T, N)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    env_state: EnvState
    obs: Dict[str, jnp.ndarray]
    hidden: jnp.ndarray
    prev_action: jnp.ndarray  # (N,)
    not_done: jnp.ndarray  # (N,) float 1.0 = episode continues
    key: jax.Array
    update_idx: jnp.ndarray  # scalar i32
    # windowed episode accounting (device-side, replaces the host deque in
    # ppo_trainer._coalesce_post_step :524)
    ep_return_acc: jnp.ndarray  # (N,) running return of current episode
    ep_len_acc: jnp.ndarray  # (N,)
    # Lagrangian-adaptive entropy coefficient state (log alpha; only read
    # when use_adaptive_entropy_pen, see PPOConfig)
    log_alpha: Any = 0.0


def compute_gae(rewards, values, dones, last_value, gamma, tau):
    """(T,N) arrays -> (advantages, returns), reference rollout_storage.py:174."""
    nd = 1.0 - dones.astype(jnp.float32)

    def scan_fn(carry, xs):
        adv_next, v_next, nd_t = carry
        r_t, v_t, nd_after = xs
        delta = r_t + gamma * v_next * nd_after - v_t
        adv = delta + gamma * tau * nd_after * adv_next
        return (adv, v_t, nd_after), adv

    (_, _, _), advs = jax.lax.scan(
        scan_fn,
        (jnp.zeros_like(last_value), last_value, jnp.ones_like(last_value)),
        (rewards, values, nd),
        reverse=True,
    )
    returns = advs + values
    return advs, returns


def make_optimizer(
    cfg: PPOConfig, total_updates: Optional[int] = None
) -> optax.GradientTransformation:
    """Adam + grad clip; linear LR decay over the run when enabled
    (reference use_linear_lr_decay, ppo_trainer lr_scheduler)."""
    if cfg.use_linear_lr_decay and total_updates:
        steps = total_updates * cfg.ppo_epoch * cfg.num_mini_batch
        lr = optax.linear_schedule(cfg.lr, 0.0, steps)
    else:
        lr = cfg.lr
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(lr, eps=cfg.eps),
    )


class PPOLearner:
    """Builds the fused (init_fn, train_step) pair for a BatchedEnv + policy.

    Registered under both 'ppo' and 'ddppo' like the reference
    (ppo_trainer.py:70-71) — on TPU they are the same program; 'ddppo' just
    runs it over a multi-device mesh.
    """

    def __init__(
        self,
        env: BatchedEnv,
        policy: ActorCritic,
        cfg: PPOConfig = PPOConfig(),
        *,
        measure_keys: Tuple[str, ...] = ("success", "spl", "distance_to_goal"),
        total_updates: Optional[int] = None,
        action_type: str = "categorical",  # "categorical" | "gaussian"
        aux_loss: Optional[Any] = None,  # e.g. aux_losses.CPCA instance
        aux_loss_coef: float = 1.0,
    ):
        self.env = env
        self.policy = policy
        self.cfg = cfg
        self.optimizer = make_optimizer(cfg, total_updates)
        self.measure_keys = measure_keys
        self.action_type = action_type
        self.aux_loss = aux_loss
        self.aux_loss_coef = aux_loss_coef
        n = env.num_envs
        assert n % cfg.num_mini_batch == 0, (n, cfg.num_mini_batch)
        # adaptive entropy: gaussian-only, like the reference gate
        self.adaptive_ent = (
            cfg.use_adaptive_entropy_pen and action_type == "gaussian"
        )
        if self.adaptive_ent:
            import numpy as _np

            num_actions = int(_np.prod(env.action_space.shape))
            self.ent_threshold = -float(cfg.entropy_target_factor) * num_actions

    def _apply_policy(self, params, *args, with_feats: bool = False):
        p = params["policy"] if self.aux_loss is not None else params
        if with_feats:
            (out), inter = self.policy.apply(
                p, *args, mutable=["intermediates"]
            )
            visual = _find_sow(inter, "visual_feats")
            beliefs = _find_sow(inter, "rnn_feats")
            return out + (visual, beliefs)
        return self.policy.apply(p, *args)

    def _zero_action(self, n):
        if self.action_type == "gaussian":
            import numpy as _np

            dim = int(_np.prod(self.env.action_space.shape))
            return jnp.zeros((n, dim), jnp.float32)
        return jnp.zeros((n,), jnp.int32)

    def _sample(self, dist_params, key):
        if self.action_type == "gaussian":
            mu, log_std = dist_params
            return sample_gaussian_action(mu, log_std, key)
        return sample_action(dist_params, key)

    def _evaluate(self, dist_params, actions):
        if self.action_type == "gaussian":
            mu, log_std = dist_params
            return evaluate_gaussian_actions(mu, log_std, actions)
        return evaluate_actions_stats(dist_params, actions)

    # -- init ---------------------------------------------------------
    def init_fn(self, key: jax.Array, env_data=None) -> TrainState:
        k_env, k_param = jax.random.split(key)
        env_state, obs = self.env.reset_fn(k_env, env_data=env_data)
        n = self.env.num_envs
        net = self.policy.net
        hidden = initial_hidden_state(
            n, net.hidden_size, net.num_recurrent_layers, net.rnn_type
        )
        prev_action = self._zero_action(n)
        not_done = jnp.zeros((n,), jnp.float32)  # start of episode -> mask 0
        params = self.policy.init(k_param, obs, hidden, prev_action, not_done)
        if self.aux_loss is not None:
            # aux params live under their own top-level key in the pytree
            n_ = self.env.num_envs
            T_ = self.cfg.num_steps
            H_ = net.hidden_size
            dummy_b = jnp.zeros((T_, n_, H_))
            dummy_a = jnp.zeros((T_, n_), jnp.int32)
            dummy_m = jnp.ones((T_, n_))
            aux_params = self.aux_loss.init(
                jax.random.fold_in(k_param, 1), dummy_b, dummy_b, dummy_a, dummy_m, key
            )
            params = {"policy": params, "aux": aux_params}
        opt_state = self.optimizer.init(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            obs=obs,
            hidden=hidden,
            prev_action=prev_action,
            not_done=not_done,
            key=key,
            update_idx=jnp.int32(0),
            ep_return_acc=jnp.zeros((n,), jnp.float32),
            ep_len_acc=jnp.zeros((n,), jnp.float32),
            log_alpha=jnp.float32(np.log(self.cfg.entropy_coef)),
        )

    # -- rollout ------------------------------------------------------
    def _collect_rollout(self, ts: TrainState, env_data=None):
        """lax.scan of T steps: act -> env.step (reference double-buffered
        _compute_actions_and_step_envs / _collect_environment_result,
        ppo_trainer.py:343-487 — no buffering needed, it is one fused scan)."""
        cfg = self.cfg

        def step(carry, _):
            env_state, obs, hidden, prev_action, not_done, key, ep_ret, ep_len = carry
            key, k_act = jax.random.split(key)
            dist_params, value, new_hidden = self._apply_policy(
                ts.params, obs, hidden, prev_action, not_done
            )
            action, logp = self._sample(dist_params, k_act)
            new_env_state, new_obs, reward, done, info = self.env.step_fn(
                env_state, action, env_data=env_data
            )
            ep_ret = ep_ret + reward
            ep_len = ep_len + 1.0
            done_f = done.astype(jnp.float32)
            if cfg.obs_store_bf16:
                store_obs = {
                    k: v.astype(jnp.bfloat16)
                    if v.dtype == jnp.float32 and v.ndim >= 4
                    else v
                    for k, v in obs.items()
                }
            else:
                store_obs = obs
            stats = {
                "reward_sum": jnp.sum(ep_ret * done_f),
                "len_sum": jnp.sum(ep_len * done_f),
                "done_count": jnp.sum(done_f),
            }
            for k in self.measure_keys:
                if k in info:
                    stats[f"m_{k}"] = jnp.sum(info[k] * done_f)
            out = (
                store_obs,
                action,
                logp,
                value,
                reward,
                done_f,
                not_done,
                prev_action,
                stats,
            )
            ep_ret = ep_ret * (1.0 - done_f)
            ep_len = ep_len * (1.0 - done_f)
            new_carry = (
                new_env_state,
                new_obs,
                new_hidden,
                action,
                1.0 - done_f,
                key,
                ep_ret,
                ep_len,
            )
            return new_carry, out

        carry0 = (
            ts.env_state,
            ts.obs,
            ts.hidden,
            ts.prev_action,
            ts.not_done,
            ts.key,
            ts.ep_return_acc,
            ts.ep_len_acc,
        )
        carry, outs = jax.lax.scan(step, carry0, None, length=cfg.num_steps)
        (env_state, obs, hidden, prev_action, not_done, key, ep_ret, ep_len) = carry
        (o, a, lp, v, r, d, m, pa, stats) = outs
        batch = RolloutBatch(
            obs=o,
            actions=a,
            log_probs=lp,
            values=v,
            rewards=r,
            dones=d,
            masks=m,
            prev_actions=pa,
        )
        # bootstrap value (reference get_value at rollout end,
        # ppo_trainer.py:489-506)
        _, last_value, _ = self._apply_policy(
            ts.params, obs, hidden, prev_action, not_done
        )
        rollout_stats = jax.tree.map(lambda x: jnp.sum(x, axis=0), stats)
        new_ts = ts._replace(
            env_state=env_state,
            obs=obs,
            hidden=hidden,
            prev_action=prev_action,
            not_done=not_done,
            key=key,
            ep_return_acc=ep_ret,
            ep_len_acc=ep_len,
        )
        return new_ts, batch, last_value, ts.hidden, rollout_stats

    # -- update -------------------------------------------------------
    def _loss_fn(self, params, mb, h0_mb, clip_param, key, ent_coef=None):
        cfg = self.cfg
        if ent_coef is None:
            ent_coef = cfg.entropy_coef
        if self.aux_loss is not None:
            dist_params, values, _, visual_feats, beliefs = self._apply_policy(
                params, mb["obs"], h0_mb, mb["prev_actions"], mb["masks"],
                with_feats=True,
            )
        else:
            dist_params, values, _ = self._apply_policy(
                params, mb["obs"], h0_mb, mb["prev_actions"], mb["masks"]
            )
        logp, entropy = self._evaluate(dist_params, mb["actions"])
        ratio = jnp.exp(logp - mb["log_probs"])
        adv = mb["advantages"]
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - clip_param, 1.0 + clip_param) * adv
        action_loss = -jnp.mean(jnp.minimum(surr1, surr2))
        if cfg.use_clipped_value_loss:
            v_clip = mb["values"] + jnp.clip(
                values - mb["values"], -clip_param, clip_param
            )
            vl = jnp.maximum(
                (values - mb["returns"]) ** 2, (v_clip - mb["returns"]) ** 2
            )
            value_loss = 0.5 * jnp.mean(vl)
        else:
            value_loss = 0.5 * jnp.mean((values - mb["returns"]) ** 2)
        ent = jnp.mean(entropy)
        total = (
            action_loss
            + cfg.value_loss_coef * value_loss
            - ent_coef * ent
        )
        aux = {
            "losses/learner_loss": total,
            "losses/action_loss": action_loss,
            "losses/value_loss": value_loss,
            "losses/entropy": ent,
        }
        if self.aux_loss is not None and beliefs is not None:
            # CPC|A over the minibatch sequence: beliefs = RNN output, targets
            # = the visual embedding — DIFFERENT tensors, matching reference
            # rl/ppo/cpc_aux_loss.py (belief predicts future visual features).
            T, Nmb = mb["masks"].shape
            b = beliefs.reshape(T, Nmb, -1)
            v = visual_feats.reshape(T, Nmb, -1)
            cpca = self.aux_loss.apply(
                params["aux"],
                b,
                v,
                mb["actions"].astype(jnp.int32)
                if mb["actions"].ndim == 2
                else jnp.zeros((T, Nmb), jnp.int32),
                mb["masks"],
                key,
            )
            total = total + self.aux_loss_coef * cpca
            aux["losses/learner_loss"] = total
            aux["losses/cpca"] = cpca
        return total, aux

    def _update(self, ts: TrainState, batch: RolloutBatch, last_value, h0):
        cfg = self.cfg
        advantages, returns = compute_gae(
            batch.rewards,
            batch.values,
            batch.dones,
            last_value,
            cfg.gamma,
            cfg.tau,
        )
        if cfg.use_normalized_advantage:
            mean = jnp.mean(advantages)
            std = jnp.std(advantages) + 1e-5
            advantages = (advantages - mean) / std

        n = self.env.num_envs
        mb_size = n // cfg.num_mini_batch
        data = {
            "obs": batch.obs,
            "actions": batch.actions,
            "log_probs": batch.log_probs,
            "values": batch.values,
            "prev_actions": batch.prev_actions,
            "masks": batch.masks,
            "advantages": advantages,
            "returns": returns,
        }

        def epoch_body(carry, ep_i):
            params, opt_state, log_alpha = carry
            # per-epoch env-index permutation (reference randomizes env order
            # in data_generator, rollout_storage.py:207-257); key derives from
            # the train-state key + update/epoch counters so single-device and
            # mesh-sharded programs compute the SAME permutation
            kperm = jax.random.fold_in(
                jax.random.fold_in(ts.key, ts.update_idx), ep_i
            )
            perm = jax.random.permutation(kperm, n)

            def mb_body(carry, i):
                params, opt_state, log_alpha = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb_size, mb_size)
                # big leaves (obs frames) ride the MXU as a one-hot dot:
                # XLA's row gather over axis 1 of (T,N,H,W,C) scalarizes
                # (~17 ms/update at bench shape, r2 trace ppo.py:464-465);
                # (mb,N)@(T,N,F) with exactly one 1 per row is bit-exact for
                # bf16/u8 values (ints <= 256 are representable) and runs in
                # ~2 ms. Small leaves keep the plain take.
                oh = (idx[:, None] == jnp.arange(n)[None, :]).astype(jnp.bfloat16)

                def take_mb(x):
                    if x.ndim >= 3 and x.size >= (1 << 21):
                        if jnp.issubdtype(x.dtype, jnp.integer):
                            ohx, xf = oh, x.astype(jnp.bfloat16)
                        else:
                            # float leaves: dot in the leaf's own dtype (an
                            # f32 dot runs as bf16x3 passes and stays exact
                            # for a single-term one-hot sum)
                            ohx, xf = oh.astype(x.dtype), x
                        out = jnp.einsum(
                            "mn,tnf->tmf", ohx, xf.reshape(x.shape[0], n, -1)
                        )
                        if jnp.issubdtype(x.dtype, jnp.integer):
                            out = jnp.round(out)
                        return out.astype(x.dtype).reshape(
                            (x.shape[0], mb_size) + x.shape[2:]
                        )
                    return jnp.take(x, idx, axis=1)

                mb = jax.tree.map(take_mb, data)
                h0_mb = jnp.take(h0, idx, axis=0)
                ent_coef = (
                    jnp.exp(log_alpha) if self.adaptive_ent else cfg.entropy_coef
                )
                (loss, aux), grads = jax.value_and_grad(
                    self._loss_fn, has_aux=True
                )(
                    params,
                    mb,
                    h0_mb,
                    cfg.clip_param,
                    jax.random.fold_in(kperm, i),
                    ent_coef,
                )
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                aux["grad_norm"] = optax.global_norm(grads)
                if self.adaptive_ent:
                    # dual ascent (reference lagrangian_loss over
                    # LagrangeInequalityCoefficient, greater_than=True: keep
                    # entropy >= threshold), same lr as the main optimizer,
                    # log-alpha clamped to the reference bounds [1e-4, 1.0]
                    log_alpha = jnp.clip(
                        log_alpha
                        + cfg.lr * (self.ent_threshold - aux["losses/entropy"]),
                        np.log(1e-4),
                        0.0,
                    )
                    aux["losses/entropy_coef"] = ent_coef
                return (params, opt_state, log_alpha), aux

            (params, opt_state, log_alpha), auxs = jax.lax.scan(
                mb_body,
                (params, opt_state, log_alpha),
                jnp.arange(cfg.num_mini_batch),
            )
            return (params, opt_state, log_alpha), jax.tree.map(jnp.mean, auxs)

        (params, opt_state, log_alpha), auxs = jax.lax.scan(
            epoch_body,
            (ts.params, ts.opt_state, ts.log_alpha),
            jnp.arange(cfg.ppo_epoch),
        )
        metrics = jax.tree.map(jnp.mean, auxs)
        return ts._replace(
            params=params,
            opt_state=opt_state,
            update_idx=ts.update_idx + 1,
            log_alpha=log_alpha,
        ), metrics

    # -- full step ------------------------------------------------------
    def train_step(
        self, ts: TrainState, env_data=None
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """One update. Pass env_data=env.env_data when jitting at scale so the
        scene/episode tables are XLA parameters, not embedded constants."""
        ts, batch, last_value, h0, rollout_stats = self._collect_rollout(ts, env_data)
        ts, metrics = self._update(ts, batch, last_value, h0)
        metrics.update(rollout_stats)
        metrics["reward_step_mean"] = jnp.mean(batch.rewards)
        return ts, metrics
