"""Multi-agent / population-play machinery.

Counterpart of reference habitat-baselines/habitat_baselines/rl/multi_agent/:
MultiAgentAccessMgr (multi_agent_access_mgr.py:35 — population sampling
:36-44), MultiPolicy/MultiStorage/MultiUpdater splitters (pop_play_wrappers.py)
and the self-play wrappers.

TPU-native population play: the population is ONE stacked pytree of K
parameter sets in HBM. Sampling an opponent per env lane is a gather over the
stacked leaves, and a policy forward for a mixed batch is `vmap` over the
per-lane parameters — no process pools, no parameter server. The scripted
humanoid in tasks/rearrange/social_nav.py is the round-1 opponent; frozen
policy opponents plug in through `apply_population`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def stack_params(param_sets: Sequence[Any]) -> Any:
    """K pytrees -> one pytree with a leading population axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_sets)


def select_params(stacked: Any, idx: jnp.ndarray) -> Any:
    """Gather parameter set(s) by index: scalar idx -> single pytree,
    (N,) idx -> per-lane stacked pytree (for vmapped apply)."""
    return jax.tree.map(lambda x: x[idx], stacked)


def population_size(stacked: Any) -> int:
    return int(jax.tree.leaves(stacked)[0].shape[0])


def apply_population(policy_apply: Callable, stacked: Any, lane_idx: jnp.ndarray, *args):
    """Run a policy forward where each env lane uses its own parameter set
    (reference MultiPolicy splits the batch across agent policies; here it is
    one vmapped call)."""
    per_lane = select_params(stacked, lane_idx)  # leaves (N, ...)
    return jax.vmap(policy_apply)(per_lane, *args)


@dataclasses.dataclass
class AgentSpec:
    name: str
    learner: bool = True


class MultiAgentAccessMgr:
    """Uniform access over (policy, storage, updater) per agent type
    (reference multi_agent_access_mgr.py:35): one learning agent + a frozen
    opponent population refreshed from checkpoints of the learner
    (population play / fictitious self-play)."""

    def __init__(
        self,
        agents: Sequence[AgentSpec],
        num_pool_agents_per_type: Sequence[int] = (1, 1),
        seed: int = 0,
    ):
        self.agents = list(agents)
        self.num_pool = list(num_pool_agents_per_type)
        self._rng = np.random.default_rng(seed)
        self._population: List[Any] = []
        self._stacked: Optional[Any] = None

    @property
    def nagents(self) -> int:
        return len(self.agents)

    # -- population maintenance (reference :36-44 sampling) ---------------
    def push_snapshot(self, params: Any, max_size: int = 8) -> None:
        """Add a frozen copy of the learner to the opponent pool."""
        self._population.append(jax.tree.map(jnp.asarray, params))
        if len(self._population) > max_size:
            self._population.pop(0)
        self._stacked = stack_params(self._population)

    @property
    def population(self) -> Optional[Any]:
        return self._stacked

    def sample_opponents(self, num_envs: int) -> np.ndarray:
        """Per-lane opponent indices for the next rollout."""
        assert self._population, "push_snapshot first"
        return self._rng.integers(0, len(self._population), size=num_envs)

    def on_update_done(self, update_idx: int, params: Any, snapshot_every: int = 50):
        if update_idx % snapshot_every == 0:
            self.push_snapshot(params)


class SelfPlayWrapper:
    """Both sides share the learner's parameters (reference
    self_play_wrappers.py)."""

    def __init__(self, access_mgr: MultiAgentAccessMgr):
        self.mgr = access_mgr

    def opponent_params(self, learner_params: Any, num_envs: int):
        idx = jnp.zeros((num_envs,), jnp.int32)
        return learner_params, idx


class TwoAgentPPOLearner:
    """Joint training of TWO learned agents in one batched env — the TPU
    counterpart of the reference MultiAgentAccessMgr + MultiPolicy /
    MultiStorage / MultiUpdater composition (rl/multi_agent/
    multi_agent_access_mgr.py:35, pop_play_wrappers.py): both policies act
    every step inside ONE rollout scan, and each agent runs its own PPO
    update on its own observations/log-probs against the SHARED cooperative
    reward (reference RearrangeCooperateReward, multi_agent_sensors.py:208).

    Env contract: observation keys prefixed agent_0_/agent_1_ and
    step_fn(state, actions (N,2))."""

    def __init__(self, env, policies, cfg=None):
        from habitat_tpu.baselines.ppo import PPOConfig, compute_gae, make_optimizer
        from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

        self.env = env
        self.policies = list(policies)
        assert len(self.policies) == 2
        self.cfg = cfg or PPOConfig(num_steps=32, num_mini_batch=2, ppo_epoch=2)
        self.optimizers = [make_optimizer(self.cfg) for _ in range(2)]
        self._gae = compute_gae
        self._init_hidden = initial_hidden_state

    def _agent_obs(self, obs, i):
        pre = f"agent_{i}_"
        return {k[len(pre):]: v for k, v in obs.items() if k.startswith(pre)}

    def init_fn(self, key):
        import jax
        import jax.numpy as jnp

        k_env, k0, k1 = jax.random.split(key, 3)
        env_state, obs = self.env.reset_fn(k_env)
        n = self.env.num_envs
        params, hidden, prev_a = [], [], []
        for i, (pol, kp) in enumerate(zip(self.policies, (k0, k1))):
            net = pol.net
            h = self._init_hidden(
                n, net.hidden_size, net.num_recurrent_layers, net.rnn_type
            )
            pa = jnp.zeros((n,), jnp.int32)
            nd = jnp.zeros((n,), jnp.float32)
            params.append(pol.init(kp, self._agent_obs(obs, i), h, pa, nd))
            hidden.append(h)
            prev_a.append(pa)
        opt_states = [
            opt.init(p) for opt, p in zip(self.optimizers, params)
        ]
        return dict(
            params=params,
            opt_states=opt_states,
            env_state=env_state,
            obs=obs,
            hidden=hidden,
            prev_a=prev_a,
            not_done=jnp.zeros((n,), jnp.float32),
            key=key,
            update_idx=jnp.int32(0),
        )

    def train_step(self, ts):
        import jax
        import jax.numpy as jnp
        import optax
        from habitat_tpu.models.policy import evaluate_actions_stats, sample_action

        cfg = self.cfg
        n = self.env.num_envs

        def step(carry, _):
            env_state, obs, h0, h1, pa0, pa1, nd, key = carry
            key, ka0, ka1 = jax.random.split(key, 3)
            acts, logps, vals, hs = [], [], [], []
            for i, (pol, h, pa, ka) in enumerate(
                ((self.policies[0], h0, pa0, ka0), (self.policies[1], h1, pa1, ka1))
            ):
                logits, v, nh = pol.apply(
                    ts["params"][i], self._agent_obs(obs, i), h, pa, nd
                )
                a, lp = sample_action(logits, ka)
                acts.append(a)
                logps.append(lp)
                vals.append(v)
                hs.append(nh)
            joint = jnp.stack(acts, axis=1)  # (N,2)
            env_state, new_obs, rew, done, info = self.env.step_fn(env_state, joint)
            out = (obs, acts[0], acts[1], logps[0], logps[1], vals[0], vals[1],
                   rew, done.astype(jnp.float32), nd, pa0, pa1,
                   info.get("success", jnp.zeros((n,))))
            nd_new = 1.0 - done.astype(jnp.float32)
            return (env_state, new_obs, hs[0], hs[1], acts[0], acts[1], nd_new, key), out

        carry0 = (
            ts["env_state"], ts["obs"], ts["hidden"][0], ts["hidden"][1],
            ts["prev_a"][0], ts["prev_a"][1], ts["not_done"], ts["key"],
        )
        carry, outs = jax.lax.scan(step, carry0, None, length=cfg.num_steps)
        (env_state, obs, h0f, h1f, pa0f, pa1f, ndf, key) = carry
        (o, a0, a1, lp0, lp1, v0, v1, rew, done, masks, pa0s, pa1s, succ) = outs

        metrics = {
            "done_count": jnp.sum(done),
            "m_success": jnp.sum(succ * done),
            "reward_step_mean": jnp.mean(rew),
        }
        h0_start, h1_start = ts["hidden"]
        new_params, new_opts = [], []
        for i, (pol, a_t, lp_t, v_t, h_start, pa_s) in enumerate(
            (
                (self.policies[0], a0, lp0, v0, h0_start, pa0s),
                (self.policies[1], a1, lp1, v1, h1_start, pa1s),
            )
        ):
            _, last_v, _ = pol.apply(
                ts["params"][i],
                self._agent_obs(obs, i),
                (h0f, h1f)[i],
                (pa0f, pa1f)[i],
                ndf,
            )
            adv, ret = self._gae(rew, v_t, done, last_v, cfg.gamma, cfg.tau)

            def loss_fn(p, key_i=i, adv=adv, ret=ret, a_t=a_t, lp_t=lp_t,
                        v_t=v_t, h_start=h_start, pa_s=pa_s):
                pol_i = self.policies[key_i]
                logits, values, _ = pol_i.apply(
                    p, self._agent_obs(o, key_i), h_start, pa_s, masks
                )
                lp, ent = evaluate_actions_stats(logits, a_t)
                ratio = jnp.exp(lp - lp_t)
                s1 = ratio * adv
                s2 = jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * adv
                al = -jnp.mean(jnp.minimum(s1, s2))
                vl = 0.5 * jnp.mean((values - ret) ** 2)
                return al + cfg.value_loss_coef * vl - cfg.entropy_coef * jnp.mean(ent)

            params_i = ts["params"][i]
            opt_i = ts["opt_states"][i]
            for _ in range(cfg.ppo_epoch):
                loss, grads = jax.value_and_grad(loss_fn)(params_i)
                upd, opt_i = self.optimizers[i].update(grads, opt_i, params_i)
                params_i = optax.apply_updates(params_i, upd)
            new_params.append(params_i)
            new_opts.append(opt_i)
            metrics[f"losses/agent{i}_loss"] = loss

        new_ts = dict(
            params=new_params,
            opt_states=new_opts,
            env_state=env_state,
            obs=obs,
            hidden=[h0f, h1f],
            prev_a=[pa0f, pa1f],
            not_done=ndf,
            key=key,
            update_idx=ts["update_idx"] + 1,
        )
        return new_ts, metrics
