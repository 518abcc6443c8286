"""PDDL-style task logic grounded against the rearrange engine state.

Counterpart of the reference PDDL system (habitat-lab/habitat/tasks/rearrange/
multi_task/: PddlDomain pddl_domain.py:48, PddlAction, LogicalExpr
pddl_logical_expr.py, grounded predicates pddl_defined_predicates.py). The
reference grounds predicates against the Bullet sim; here they evaluate
against the batched RearrangeState (vectorized over all N envs at once), and
plans compile to HRL skill sequences (baselines/hrl).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp


# -- logical expressions (reference pddl_logical_expr.py) -------------------


class LogicalExprType:
    AND = "and"
    OR = "or"
    NAND = "nand"
    NOR = "nor"


@dataclasses.dataclass
class Predicate:
    """Named predicate with a vectorized truth function over
    (env, state) -> (N,) bool (reference pddl_predicate.py)."""

    name: str
    fn: Callable

    def is_true(self, env, state) -> jnp.ndarray:
        return self.fn(env, state)

    def __repr__(self):
        return f"Predicate({self.name})"


@dataclasses.dataclass
class LogicalExpr:
    expr_type: str
    sub_exprs: List

    def is_true(self, env, state) -> jnp.ndarray:
        vals = [e.is_true(env, state) for e in self.sub_exprs]
        stacked = jnp.stack(vals)
        if self.expr_type == LogicalExprType.AND:
            return jnp.all(stacked, axis=0)
        if self.expr_type == LogicalExprType.OR:
            return jnp.any(stacked, axis=0)
        if self.expr_type == LogicalExprType.NAND:
            return ~jnp.all(stacked, axis=0)
        if self.expr_type == LogicalExprType.NOR:
            return ~jnp.any(stacked, axis=0)
        raise ValueError(self.expr_type)


@dataclasses.dataclass
class PddlAction:
    """Action schema: precondition expr + named HRL skill + postcondition
    (reference pddl_action.py; post-conditions are asserted by the skill's
    is_done, so execution uses them as progress checks)."""

    name: str
    precond: Optional[LogicalExpr]
    postcond: Optional[LogicalExpr]
    skill_name: str

    def is_applicable(self, env, state) -> jnp.ndarray:
        if self.precond is None:
            return jnp.ones((env.num_envs,), bool)
        return self.precond.is_true(env, state)

    def is_satisfied(self, env, state) -> jnp.ndarray:
        if self.postcond is None:
            return jnp.ones((env.num_envs,), bool)
        return self.postcond.is_true(env, state)


# -- grounded predicates (reference pddl_defined_predicates.py) -------------


def _target(env, state):
    return env.table.pick_target[state.ep_idx]


def p_holding(env, state):
    """holding(target_obj)."""
    return state.held == _target(env, state)


def p_not_holding(env, state):
    return state.held < 0


def p_obj_at_goal(env, state, thresh: float = 0.3):
    n_idx = jnp.arange(env.num_envs)
    tgt = _target(env, state)
    obj = env._obj_world(state)[n_idx, tgt]
    goal = env.table.target_pos[state.ep_idx, tgt]
    return jnp.linalg.norm(obj - goal, axis=-1) < thresh


def p_robot_at_obj(env, state, dist: float = 1.0):
    n_idx = jnp.arange(env.num_envs)
    tgt = _target(env, state)
    obj = env._obj_world(state)[n_idx, tgt]
    return (
        jnp.linalg.norm((obj - state.pos)[:, jnp.array([0, 2])], axis=-1) < dist
    )


def p_robot_at_goal(env, state, dist: float = 1.0):
    tgt = _target(env, state)
    goal = env.table.target_pos[state.ep_idx, tgt]
    return (
        jnp.linalg.norm((goal - state.pos)[:, jnp.array([0, 2])], axis=-1) < dist
    )


DEFAULT_PREDICATES: Dict[str, Predicate] = {
    "holding": Predicate("holding", p_holding),
    "not_holding": Predicate("not_holding", p_not_holding),
    "at": Predicate("at", p_obj_at_goal),
    "robot_at_obj": Predicate("robot_at_obj", p_robot_at_obj),
    "robot_at_goal": Predicate("robot_at_goal", p_robot_at_goal),
}


class PddlDomain:
    """Domain = predicates + action schemas (reference pddl_domain.py:48,
    loaded from YAML there; built in code or from a dict here)."""

    def __init__(
        self,
        predicates: Optional[Dict[str, Predicate]] = None,
        actions: Optional[Dict[str, PddlAction]] = None,
    ):
        self.predicates = dict(predicates or DEFAULT_PREDICATES)
        self.actions = dict(actions or {})
        if not self.actions:
            self._default_actions()

    def _default_actions(self):
        P = self.predicates
        self.actions = {
            "nav_to_obj": PddlAction(
                "nav_to_obj",
                precond=LogicalExpr(LogicalExprType.AND, [P["not_holding"]]),
                postcond=LogicalExpr(LogicalExprType.AND, [P["robot_at_obj"]]),
                skill_name="nav_to_obj",
            ),
            "pick": PddlAction(
                "pick",
                precond=LogicalExpr(
                    LogicalExprType.AND, [P["robot_at_obj"], P["not_holding"]]
                ),
                postcond=LogicalExpr(LogicalExprType.AND, [P["holding"]]),
                skill_name="pick",
            ),
            "nav_to_goal": PddlAction(
                "nav_to_goal",
                precond=LogicalExpr(LogicalExprType.AND, [P["holding"]]),
                postcond=LogicalExpr(LogicalExprType.AND, [P["robot_at_goal"]]),
                skill_name="nav_to_goal",
            ),
            "place": PddlAction(
                "place",
                # placing needs the robot AT the goal (matches the reference
                # domain's place preconditions; without it a symbolic planner
                # would "place" from anywhere in one step)
                precond=LogicalExpr(
                    LogicalExprType.AND, [P["holding"], P["robot_at_goal"]]
                ),
                postcond=LogicalExpr(
                    LogicalExprType.AND, [P["at"], P["not_holding"]]
                ),
                skill_name="place",
            ),
        }

    def parse_predicate(self, name: str) -> Predicate:
        return self.predicates[name]

    def get_ordered_actions(self) -> List[PddlAction]:
        return list(self.actions.values())

    def plan_for_goal(self, goal: str = "at") -> List[PddlAction]:
        """Canonical rearrangement plan (the reference's fixed plan for the
        single-object domain): nav → pick → nav → place."""
        names = ["nav_to_obj", "pick", "nav_to_goal", "place"]
        return [self.actions[n] for n in names]

    def compile_plan_to_skills(self, plan: Sequence[PddlAction]):
        """PddlAction list -> HRL skill instances (reference hl/fixed_policy
        consumes the solution skill list the same way)."""
        from habitat_tpu.baselines.hrl.hierarchical import (
            NavToGoalSkill,
            OracleNavSkill,
            PickSkill,
            PlaceSkill,
            WaitSkill,
        )

        mapping = {
            "nav_to_obj": OracleNavSkill,
            "pick": PickSkill,
            "nav_to_goal": NavToGoalSkill,
            "place": PlaceSkill,
            "wait": WaitSkill,
        }
        return [mapping[a.skill_name]() for a in plan]
