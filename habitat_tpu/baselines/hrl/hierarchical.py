"""Hierarchical policy: high-level skill selection over low-level skills.

Counterpart of the reference HRL stack (habitat-baselines/habitat_baselines/
rl/hrl/: HierarchicalPolicy hierarchical_policy.py:31, FixedHighLevelPolicy
hl/fixed_policy.py, skills/ — nav/pick/place/wait/reset). The reference runs
skills as per-process torch policies with masking; here every skill is a pure
batched function over the rearrange env state, and the hierarchical policy is
a jittable controller: each env carries a skill index, all skills compute
their action, and jnp.select picks per lane — no host dispatch.

Skills here are the ORACLE variants (reference skills/oracle_nav.py etc.);
neural skills plug in through the same (act, is_done) protocol with policy
params in the carry.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, NamedTuple, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from habitat_tpu.ops.navgrid import greedy_follower_step
from habitat_tpu.tasks.rearrange.rearrange_env import (
    A_FWD,
    A_GRAB,
    A_LEFT,
    A_RIGHT,
    A_STOP,
    RearrangeBatchedEnv,
)


class Skill:
    """Low-level skill protocol (reference skills/skill.py:334)."""

    name: str = "skill"

    def act(self, env: RearrangeBatchedEnv, state) -> jnp.ndarray:
        """(env_state) -> (N,) actions."""
        raise NotImplementedError

    def is_done(self, env: RearrangeBatchedEnv, state) -> jnp.ndarray:
        """(env_state) -> (N,) bool skill-termination."""
        raise NotImplementedError


def _rel_to(env, state, world_pos):
    from habitat_tpu.utils.geometry import rotate_world_to_agent

    return rotate_world_to_agent(world_pos - state.pos, state.yaw)


def _steer(rel, near_thresh, near_action):
    """Greedy euclidean steering in the agent frame."""
    dist = jnp.linalg.norm(rel[:, jnp.array([0, 2])], axis=-1)
    ang = jnp.arctan2(-rel[:, 0], -rel[:, 2])
    return jnp.where(
        dist < near_thresh,
        near_action,
        jnp.where(
            jnp.abs(ang) < jnp.deg2rad(12.0),
            A_FWD,
            jnp.where(ang > 0, A_LEFT, A_RIGHT),
        ),
    )


class OracleNavSkill(Skill):
    """Navigate to the pick-target object via the geodesic field (reference
    skills/oracle_nav.py — navmesh path follower)."""

    name = "nav_to_obj"

    def __init__(self, stop_dist: float = 0.8):
        self.stop_dist = stop_dist

    def act(self, env, state):
        fields = env.table.nav.dist_field[state.ep_idx].astype(jnp.float32)
        sid = env.table.nav.scene_idx[state.ep_idx]
        f = functools.partial(
            greedy_follower_step,
            goal_radius=self.stop_dist,
            forward_step=env.fwd,
            turn_angle=env.turn,
        )
        act = jax.vmap(lambda s_, fl, p, y: f(env.pack, s_, fl, p, y))(
            sid, fields, state.pos, state.yaw
        )
        return jnp.where(act == A_STOP, A_FWD, act)  # HL decides termination

    def is_done(self, env, state):
        n_idx = jnp.arange(env.num_envs)
        tgt = env.table.pick_target[state.ep_idx]
        obj = env._obj_world(state)[n_idx, tgt]
        d = jnp.linalg.norm((obj - state.pos)[:, jnp.array([0, 2])], axis=-1)
        return d <= self.stop_dist


class PickSkill(Skill):
    """Approach + magic grasp (reference skills/pick.py + oracle grasp)."""

    name = "pick"

    def __init__(self, grab_dist: float = 0.7):
        self.grab_dist = grab_dist

    def act(self, env, state):
        n_idx = jnp.arange(env.num_envs)
        tgt = env.table.pick_target[state.ep_idx]
        obj = env._obj_world(state)[n_idx, tgt]
        rel = _rel_to(env, state, obj)
        return _steer(rel, self.grab_dist, A_GRAB)

    def is_done(self, env, state):
        return state.held == env.table.pick_target[state.ep_idx]


class NavToGoalSkill(Skill):
    """Navigate (holding) toward the target's goal position."""

    name = "nav_to_goal"

    def __init__(self, stop_dist: float = 0.5):
        self.stop_dist = stop_dist

    def act(self, env, state):
        n_idx = jnp.arange(env.num_envs)
        tgt = env.table.pick_target[state.ep_idx]
        goal = env.table.target_pos[state.ep_idx, tgt]
        rel = _rel_to(env, state, goal)
        # keep moving; placement handled by PlaceSkill
        act = _steer(rel, self.stop_dist, A_FWD)
        return act

    def is_done(self, env, state):
        n_idx = jnp.arange(env.num_envs)
        tgt = env.table.pick_target[state.ep_idx]
        goal = env.table.target_pos[state.ep_idx, tgt]
        d = jnp.linalg.norm((goal - state.pos)[:, jnp.array([0, 2])], axis=-1)
        return d <= self.stop_dist + 0.2


class PlaceSkill(Skill):
    """Release at the goal (reference skills/place.py): steer while holding
    until the END-EFFECTOR is over the goal, then release; if the object got
    dropped early, recover by re-picking it."""

    name = "place"

    def __init__(self, ee_release_dist: float = 0.1):
        self.ee_release_dist = ee_release_dist

    def act(self, env, state):
        n_idx = jnp.arange(env.num_envs)
        tgt = env.table.pick_target[state.ep_idx]
        goal = env.table.target_pos[state.ep_idx, tgt]
        obj = env._obj_world(state)[n_idx, tgt]
        ee = env._ee_pos(state)
        holding = state.held == tgt
        placed = self.is_done(env, state)

        ee_goal = jnp.linalg.norm((ee - goal)[:, jnp.array([0, 2])], axis=-1)
        # holding: steer so the EE lands on the goal, release when it does
        rel_goal = _rel_to(env, state, goal)
        act_hold = jnp.where(
            ee_goal < self.ee_release_dist,
            A_GRAB,
            _steer(rel_goal, 0.0, A_FWD),
        )
        # dropped early: go re-pick the object
        rel_obj = _rel_to(env, state, obj)
        act_recover = _steer(rel_obj, 0.7, A_GRAB)
        act = jnp.where(holding, act_hold, act_recover)
        return jnp.where(placed, jnp.int32(A_LEFT), act)

    def is_done(self, env, state):
        n_idx = jnp.arange(env.num_envs)
        tgt = env.table.pick_target[state.ep_idx]
        goal = env.table.target_pos[state.ep_idx, tgt]
        obj = env._obj_world(state)[n_idx, tgt]
        placed = jnp.linalg.norm(obj - goal, axis=-1) < env.at_goal_thresh
        return placed & (state.held < 0)


class ArtObjSkill(Skill):
    """Open/close an articulated object (reference skills/art_obj.py): steer
    to the handle, then GRAB to slide the prismatic joint toward its goal
    state; done when the joint reaches the episode's art_goal_q. Only
    meaningful in art-task envs (task in open/close) where GRAB interacts
    with the joint."""

    name = "art_obj"

    def act(self, env, state):
        handle = env._handle_pos(state)
        rel = _rel_to(env, state, handle)
        return _steer(rel, env.grasp_distance * 0.9, A_GRAB)

    def is_done(self, env, state):
        n_idx = jnp.arange(env.num_envs)
        art_t = env.table.art_target[state.ep_idx]
        q = state.art_q[n_idx, art_t]
        return jnp.abs(q - env.table.art_goal_q[state.ep_idx]) < 0.05


class WaitSkill(Skill):
    """reference skills/wait.py."""

    name = "wait"

    def act(self, env, state):
        return jnp.full((env.num_envs,), A_LEFT, jnp.int32)

    def is_done(self, env, state):
        return jnp.ones((env.num_envs,), bool)


class HLState(NamedTuple):
    skill_idx: jnp.ndarray  # (N,) current position in the plan


class FixedHighLevelPolicy:
    """Fixed skill sequence (reference hl/fixed_policy.py:158 — follows the
    PDDL plan's skill list)."""

    def __init__(self, env: RearrangeBatchedEnv, plan: Sequence[Skill]):
        self.env = env
        self.plan = list(plan)

    def init_state(self) -> HLState:
        return HLState(skill_idx=jnp.zeros((self.env.num_envs,), jnp.int32))

    def act(self, hl: HLState, env_state) -> Tuple[jnp.ndarray, HLState]:
        env = self.env
        # advance plan pointer while the current skill reports done
        idx = hl.skill_idx
        for _ in range(len(self.plan)):  # fixed-point (static unroll)
            dones = jnp.stack([s.is_done(env, env_state) for s in self.plan])  # (K,N)
            cur_done = jnp.take_along_axis(dones, idx[None], axis=0)[0]
            idx = jnp.where(
                cur_done & (idx < len(self.plan) - 1), idx + 1, idx
            )
        actions = jnp.stack([s.act(env, env_state) for s in self.plan])  # (K,N)
        act = jnp.take_along_axis(actions, idx[None], axis=0)[0]
        return act, HLState(skill_idx=idx)


class HierarchicalPolicy:
    """HL policy + skills as one batched controller (reference
    hierarchical_policy.py:31). Jittable: step through the env with
    per-lane skill selection."""

    def __init__(self, env: RearrangeBatchedEnv, hl_policy: FixedHighLevelPolicy):
        self.env = env
        self.hl = hl_policy

    def init_state(self) -> HLState:
        return self.hl.init_state()

    def act(self, hl_state, env_state):
        return self.hl.act(hl_state, env_state)

    def rollout(self, env_state, hl_state, num_steps: int):
        """Scan the hierarchy through the env (eval utility)."""

        def step(carry, _):
            env_state, hl_state = carry
            act, hl_state = self.act(hl_state, env_state)
            env_state, obs, r, done, info = self.env.step_fn(env_state, act)
            # restart the plan for auto-reset lanes
            hl_state = HLState(
                skill_idx=jnp.where(done, 0, hl_state.skill_idx)
            )
            return (env_state, hl_state), (r, done, info["success"])

        (env_state, hl_state), (rs, dones, succ) = jax.lax.scan(
            step, (env_state, hl_state), None, length=num_steps
        )
        return env_state, hl_state, rs, dones, succ


def default_rearrange_plan() -> List[Skill]:
    """nav → pick → nav → place (the reference's canonical PDDL plan)."""
    return [OracleNavSkill(), PickSkill(), NavToGoalSkill(), PlaceSkill()]


class NnSkill(Skill):
    """Neural low-level skill (reference skills/nn_skill.py): wraps a trained
    policy's act path behind the Skill protocol. Stateless form: the rollout
    carry holds no per-skill hidden, so use memoryless policies (hidden is
    re-zeroed each step) or feed-forward nets; recurrent skill state is the
    round-2 extension (reference keeps per-skill RNN state the same way its
    HrlRolloutStorage does)."""

    name = "nn_skill"

    def __init__(
        self,
        policy,
        params,
        done_fn,
        obs_fn=None,
        deterministic: bool = True,
        name: str = "nn_skill",
    ):
        from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

        self.policy = policy
        self.params = params
        self._done_fn = done_fn
        self._obs_fn = obs_fn
        self.deterministic = deterministic
        self.name = name

    def act(self, env, state):
        from habitat_tpu.models.policy import sample_action
        from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

        obs = self._obs_fn(env, state) if self._obs_fn else env._observations(state)
        n = env.num_envs
        net = self.policy.net
        hidden = initial_hidden_state(
            n, net.hidden_size, net.num_recurrent_layers, net.rnn_type
        )
        logits, _, _ = self.policy.apply(
            self.params,
            obs,
            hidden,
            jnp.zeros((n,), jnp.int32),
            jnp.ones((n,), jnp.float32),
        )
        act, _ = sample_action(
            logits, jax.random.PRNGKey(0), deterministic=self.deterministic
        )
        return act

    def is_done(self, env, state):
        return self._done_fn(env, state)
