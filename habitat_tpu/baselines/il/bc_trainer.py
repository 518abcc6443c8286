"""Imitation learning: behavior cloning from the geodesic-follower oracle.

Counterpart of the reference IL pipeline (habitat-baselines/habitat_baselines/
il/: EQA CNN-pretrain, VQA, PACMAN-nav trainers, SURVEY §2.7). The reference
trains from offline demonstration datasets loaded through torch DataLoaders;
on TPU the demonstrator IS on-device (the greedy geodesic follower over the
distance field), so demonstrations are generated inside the jitted train step
— online DAgger-style cloning with zero host I/O:

    scan T steps: teacher = follower(action), env.step(teacher),
                  loss += CE(policy(obs), teacher)

Registered as trainer "bc"; the PACMAN nav-IL lives in pacman.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from habitat_tpu.core.batched_env import BatchedEnv
from habitat_tpu.core.registry import registry
from habitat_tpu.models.policy import ActorCritic
from habitat_tpu.models.rnn_state_encoder import initial_hidden_state
from habitat_tpu.ops.navgrid import greedy_follower_step


@dataclasses.dataclass(frozen=True)
class BCConfig:
    lr: float = 1e-3
    num_steps: int = 32
    max_grad_norm: float = 1.0
    goal_radius: float = 0.2


class BCState(NamedTuple):
    params: Any
    opt_state: Any
    env_state: Any
    obs: Dict[str, jnp.ndarray]
    hidden: jnp.ndarray
    prev_action: jnp.ndarray
    not_done: jnp.ndarray
    key: jax.Array


@registry.register_trainer(name="bc")
class BCLearner:
    """Online behavior cloning of the shortest-path follower.

    Env must be a nav BatchedEnv with actions (stop, fwd, left, right) — the
    follower's output indices map onto them directly.
    """

    def __init__(self, env: BatchedEnv, policy: ActorCritic, cfg: BCConfig = BCConfig()):
        assert env.action_names[:4] == ("stop", "move_forward", "turn_left", "turn_right")
        self.env = env
        self.policy = policy
        self.cfg = cfg
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr)
        )
        # per-action follower params from the env's action tables
        self._fwd_step = float(env._move_amt[1])
        self._turn = float(env._turn_amt[2])

    def _teacher(self, env_state) -> jnp.ndarray:
        env = self.env
        fields = env.table.dist_field[env_state.ep_idx].astype(jnp.float32)
        sid = env.table.scene_idx[env_state.ep_idx]
        f = functools.partial(
            greedy_follower_step,
            goal_radius=self.cfg.goal_radius,
            forward_step=self._fwd_step,
            turn_angle=self._turn,
        )
        return jax.vmap(lambda s_, fl, p, y: f(env.pack, s_, fl, p, y))(
            sid, fields, env_state.pos, env_state.yaw
        )

    def init_fn(self, key: jax.Array) -> BCState:
        k_env, k_param = jax.random.split(key)
        env_state, obs = self.env.reset_fn(k_env)
        n = self.env.num_envs
        net = self.policy.net
        hidden = initial_hidden_state(
            n, net.hidden_size, net.num_recurrent_layers, net.rnn_type
        )
        prev_action = jnp.zeros((n,), jnp.int32)
        not_done = jnp.zeros((n,), jnp.float32)
        params = self.policy.init(k_param, obs, hidden, prev_action, not_done)
        return BCState(
            params,
            self.optimizer.init(params),
            env_state,
            obs,
            hidden,
            prev_action,
            not_done,
            key,
        )

    def train_step(self, ts: BCState) -> Tuple[BCState, Dict[str, jnp.ndarray]]:
        cfg = self.cfg

        def loss_fn(params, carry0):
            def step(carry, _):
                env_state, obs, hidden, prev_action, not_done = carry
                teacher = self._teacher(env_state)
                logits, _, new_hidden = self.policy.apply(
                    params, obs, hidden, prev_action, not_done
                )
                logp = jax.nn.log_softmax(logits)
                ce = -jnp.take_along_axis(logp, teacher[:, None], axis=-1)[:, 0]
                match = (jnp.argmax(logits, -1) == teacher).astype(jnp.float32)
                env_state, obs, r, done, info = self.env.step_fn(env_state, teacher)
                carry = (env_state, obs, new_hidden, teacher, 1.0 - done.astype(jnp.float32))
                return carry, (ce, match, info.get("success", jnp.zeros_like(ce)))

            carry, (ces, matches, succ) = jax.lax.scan(
                step, carry0, None, length=cfg.num_steps
            )
            return jnp.mean(ces), (carry, jnp.mean(matches), jnp.mean(succ))

        carry0 = (ts.env_state, ts.obs, ts.hidden, ts.prev_action, ts.not_done)
        (loss, (carry, match, succ)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params, carry0)
        updates, opt_state = self.optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        env_state, obs, hidden, prev_action, not_done = carry
        ts = BCState(
            params, opt_state, env_state, obs, hidden, prev_action, not_done, ts.key
        )
        return ts, {
            "losses/bc_loss": loss,
            "teacher_match": match,
            "teacher_success_rate": succ,
        }
