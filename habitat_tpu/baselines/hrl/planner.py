"""PlannerHighLevelPolicy — PDDL forward search as a precomputed plan table.

Counterpart of the reference's PlannerHighLevelPolicy
(habitat-baselines/habitat_baselines/rl/hrl/hl/planner_policy.py:33): there,
each env BFS-searches the predicate space on the HOST every time it needs a
plan (`_get_solution_nodes`, :118-207), walking PddlAction preconds/postconds
from the currently-true predicates to the PDDL goal.

TPU-native redesign: the symbolic search is independent of geometry — it only
depends on WHICH predicates are true. With P domain predicates there are just
2^P symbolic states, so the entire plan universe is enumerated ONCE at build
time into a (2^P,) next-skill table; at runtime the "planner" is

    key   = Σ_i 2^i · predicate_i(env_state)          (batched, on device)
    skill = table[key]                                 (one gather)

which gives REACTIVE replanning (reference `is_reactive`, planner_policy.py
:103-108) for free on every macro-step, fully inside jit — no host round
trip, no per-env plan state to filter on resets.
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from habitat_tpu.baselines.hrl.hierarchical import HLState, Skill, WaitSkill
from habitat_tpu.tasks.rearrange.multi_task.pddl import (
    LogicalExpr,
    PddlAction,
    PddlDomain,
)

# predicates that cannot hold simultaneously (the reference hand-handles the
# holding/not_holding negation pair in its search, planner_policy.py:172-191,
# and strips robot_at on nav actions, :162-168)
DEFAULT_MUTEX_GROUPS: Tuple[Tuple[str, ...], ...] = (
    ("holding", "not_holding"),
    ("robot_at_obj", "robot_at_goal"),
)


def _expr_names(expr: Optional[LogicalExpr]) -> List[str]:
    """Positive predicate names of an AND expression tree (the symbolic level
    of the search; geometric evaluation stays on device)."""
    if expr is None:
        return []
    names: List[str] = []
    for sub in expr.sub_exprs:
        if isinstance(sub, LogicalExpr):
            names.extend(_expr_names(sub))
        else:
            names.append(sub.name)
    return names


def build_plan_table(
    domain: PddlDomain,
    goal: Sequence[str] = ("at",),
    mutex_groups: Sequence[Sequence[str]] = DEFAULT_MUTEX_GROUPS,
    max_depth: int = 16,
) -> Tuple[np.ndarray, List[str], List[PddlAction]]:
    """Enumerate shortest plans from EVERY symbolic state to the goal.

    Returns (table (2^P,) int32 — index into the action list of the FIRST
    action of a shortest plan, or -1 when the goal is unreachable/already
    satisfied —, predicate name order, action list).
    """
    pred_names = list(domain.predicates.keys())
    bit = {n: 1 << i for i, n in enumerate(pred_names)}
    actions = domain.get_ordered_actions()
    goal_mask = 0
    for g in goal:
        goal_mask |= bit[g]

    def apply(state: int, action: PddlAction) -> Optional[int]:
        pre = 0
        for n in _expr_names(action.precond):
            pre |= bit[n]
        if (state & pre) != pre:
            return None
        nxt = state
        for n in _expr_names(action.postcond):
            for grp in mutex_groups:
                if n in grp:
                    for other in grp:
                        if other != n:
                            nxt &= ~bit[other]
            nxt |= bit[n]
        return nxt

    n_states = 1 << len(pred_names)
    table = np.full((n_states,), -1, np.int32)
    for start in range(n_states):
        if (start & goal_mask) == goal_mask:
            continue  # already at goal
        # BFS over symbolic states, remembering the first action taken
        seen = {start}
        q = deque([(start, -1, 0)])  # (state, first_action, depth)
        while q:
            st, first, depth = q.popleft()
            if depth >= max_depth:
                continue
            for ai, a in enumerate(actions):
                nxt = apply(st, a)
                if nxt is None or nxt in seen:
                    continue
                f = ai if first < 0 else first
                if (nxt & goal_mask) == goal_mask:
                    table[start] = f
                    q.clear()
                    break
                seen.add(nxt)
                q.append((nxt, f, depth + 1))
            else:
                continue
            break
    return table, pred_names, actions


class PlannerHighLevelPolicy:
    """Drop-in for FixedHighLevelPolicy: selects the next SKILL by symbolic
    planning from the current predicate truth values, every macro-step
    (reactive) or only when the running skill reports done."""

    def __init__(
        self,
        env,
        domain: Optional[PddlDomain] = None,
        goal: Sequence[str] = ("at",),
        reactive: bool = True,
        max_search_depth: int = 16,
    ):
        self.env = env
        self.domain = domain or PddlDomain()
        self.reactive = reactive
        table, pred_names, actions = build_plan_table(
            self.domain, goal=goal, max_depth=max_search_depth
        )
        self._table = jnp.asarray(table)
        self._pred_names = pred_names
        self._actions = actions
        skills = self.domain.compile_plan_to_skills(actions)
        self.plan: List[Skill] = skills + [WaitSkill()]  # -1 -> wait
        self._wait_idx = len(skills)

    def init_state(self) -> HLState:
        return HLState(skill_idx=jnp.zeros((self.env.num_envs,), jnp.int32))

    def _plan_step(self, env_state) -> jnp.ndarray:
        """(N,) skill indices chosen by table lookup on predicate truth."""
        bits = [
            self.domain.predicates[n].is_true(self.env, env_state)
            for n in self._pred_names
        ]
        key = jnp.zeros_like(bits[0], dtype=jnp.int32)
        for i, b in enumerate(bits):
            key = key | (b.astype(jnp.int32) << i)
        nxt = self._table[key]
        return jnp.where(nxt < 0, self._wait_idx, nxt)

    def act(self, hl: HLState, env_state) -> Tuple[jnp.ndarray, HLState]:
        env = self.env
        planned = self._plan_step(env_state)
        if self.reactive:
            idx = planned
        else:
            dones = jnp.stack(
                [s.is_done(env, env_state) for s in self.plan]
            )  # (K,N)
            cur_done = jnp.take_along_axis(dones, hl.skill_idx[None], axis=0)[0]
            idx = jnp.where(cur_done, planned, hl.skill_idx)
        acts = jnp.stack([s.act(env, env_state) for s in self.plan])  # (K,N)
        act = jnp.take_along_axis(acts, idx[None], axis=0)[0]
        return act, HLState(skill_idx=idx)
