"""YAML PDDL domain / task-spec loading, grounded on the batched engine.

Counterpart of the reference's YAML-driven PDDL system: PddlDomain /
PddlProblem (habitat-lab/habitat/tasks/rearrange/multi_task/pddl_domain.py:48,
:558), the entity/type system (rearrange_pddl.py), and the defined-predicate
library (pddl_defined_predicates.py). Reads the SAME schema as the
reference's domain_configs/*.yaml and habitat/task/rearrange/pddl/*.yaml
(types / constants / predicates / actions; objects / init / goal /
stage_goals / solution) so reference domain files load unmodified.

Grounding differences (TPU-native): predicate truth functions are vectorized
over all N envs against RearrangeState — `is_true(env, state) -> (N,) bool`
— instead of querying a Bullet sim per env. `_target_` entries are resolved
by their final path component into this module's factory registry, so the
reference's `habitat.tasks.rearrange...is_robot_hold_match` maps onto the
batched implementation below.

Entity conventions: movable entities named `<x>|k` bind to the k-th TARGET
object of each episode (targets-first stable order over target_mask);
`TARGET_<x>|k` binds to that object's goal position; typed constants of
articulated types bind to articulated-object slots in declaration order;
`robot_N` binds to the agent base.
"""

from __future__ import annotations

import dataclasses
import itertools
import re
from typing import Any, Callable, Dict, List, Optional, Sequence

import yaml

import jax.numpy as jnp


def _replace(state, **kw):
    return dataclasses.replace(state, **kw)

from habitat_tpu.tasks.rearrange.multi_task.pddl import (
    LogicalExpr,
    LogicalExprType,
    PddlAction,
)

ROBOT_TYPE = "robot_entity_type"
GOAL_TYPE = "goal_entity_type"
MOVABLE_TYPE = "movable_entity_type"


@dataclasses.dataclass(frozen=True)
class PddlEntity:
    """Named, typed entity (reference rearrange_pddl.py::PddlEntity)."""

    name: str
    expr_type: str


class ExprTypes:
    """Type hierarchy from the domain's `types:` section (child -> parent)."""

    def __init__(self, parents: Dict[str, str]):
        self.parents = dict(parents)

    def is_subtype(self, t: str, of: str) -> bool:
        while t is not None:
            if t == of:
                return True
            t = self.parents.get(t)
        return False

    @classmethod
    def from_yaml(cls, types_node: Optional[dict]) -> "ExprTypes":
        parents: Dict[str, str] = {}
        for parent, children in (types_node or {}).items():
            for c in children or ():
                parents[c] = parent
        return cls(parents)


# -- batched entity resolution ----------------------------------------------


def _entity_index(name: str) -> int:
    """`any_targets|3` -> 3; unnumbered entities -> 0."""
    return int(name.rsplit("|", 1)[1]) if "|" in name else 0


def _kth_target_obj(env, state, k: int) -> jnp.ndarray:
    """(N,) object index of each episode's k-th target (targets first,
    stable order)."""
    mask = env.table.target_mask[state.ep_idx]  # (N, O)
    order = jnp.argsort(jnp.where(mask, 0, 1), axis=1, stable=True)
    return order[:, min(k, mask.shape[1] - 1)]


def entity_object_index(env, state, ent: PddlEntity) -> jnp.ndarray:
    return _kth_target_obj(env, state, _entity_index(ent.name))


def _is_second_agent(ent: PddlEntity) -> bool:
    """robot_1 / agent_1 names address the humanoid lane of the batched
    multi-agent env (hab3: RearrangeState.human_*)."""
    return ent.name.rsplit("_", 1)[-1] == "1"


def _robot_held(env, state, ent: PddlEntity) -> jnp.ndarray:
    if _is_second_agent(ent):
        return state.human_held
    return state.held


def entity_position(env, state, ent: PddlEntity, art_slots: Dict[str, int]):
    """(N,3) world position of an entity, per env."""
    n_idx = jnp.arange(env.num_envs)
    if ent.expr_type == ROBOT_TYPE:
        if _is_second_agent(ent):
            return state.human_pos
        return state.pos
    if ent.expr_type == GOAL_TYPE:
        k = _kth_target_obj(env, state, _entity_index(ent.name))
        return env.table.target_pos[state.ep_idx, k]
    if ent.name in art_slots:
        a = art_slots[ent.name] % max(1, env.table.art_pos.shape[1])
        return env.table.art_pos[state.ep_idx, a]
    obj = entity_object_index(env, state, ent)
    return env._obj_world(state)[n_idx, obj]


def _entity_art_slot(env, ent: PddlEntity, art_slots: Dict[str, int]) -> int:
    return art_slots.get(ent.name, 0) % max(1, env.table.art_pos.shape[1])


def _horiz_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a - b
    return jnp.sqrt(d[..., 0] ** 2 + d[..., 2] ** 2)


# -- defined predicates (reference pddl_defined_predicates.py) ---------------
# Each factory returns (is_valid_fn, set_state_fn|None); both close over the
# bound entities. is_valid: (env, state) -> (N,) bool. set_state:
# (env, state) -> state (used to apply `init:` predicates).


def _fac_is_robot_hold_match(args, art_slots, hold_state=True, **_):
    objs = [a for a in args if a.expr_type != ROBOT_TYPE]
    robots = [a for a in args if a.expr_type == ROBOT_TYPE]
    robot = robots[0] if robots else PddlEntity("robot_0", ROBOT_TYPE)

    def valid(env, state):
        held = _robot_held(env, state, robot)
        if hold_state and objs:
            return held == entity_object_index(env, state, objs[0])
        if hold_state:
            return held >= 0
        return held < 0

    def set_state(env, state):
        field = "human_held" if _is_second_agent(robot) else "held"
        held = _robot_held(env, state, robot)
        if hold_state and objs:
            return _replace(
                state, **{field: entity_object_index(env, state, objs[0])}
            )
        return _replace(state, **{field: jnp.full_like(held, -1)})

    return valid, set_state


def _fac_is_object_at(args, art_slots, dist_thresh=0.3, **_):
    obj, at = args[0], args[1]

    def valid(env, state):
        n_idx = jnp.arange(env.num_envs)
        p = env._obj_world(state)[n_idx, entity_object_index(env, state, obj)]
        q = entity_position(env, state, at, art_slots)
        return jnp.linalg.norm(p - q, axis=-1) < dist_thresh

    def set_state(env, state):
        n_idx = jnp.arange(env.num_envs)
        oi = entity_object_index(env, state, obj)
        q = entity_position(env, state, at, art_slots)
        return _replace(state, obj_pos=state.obj_pos.at[n_idx, oi].set(q))

    return valid, set_state


def _fac_is_robot_at_position(args, art_slots, dist_thresh=2.0, **_):
    at = args[0]

    def valid(env, state):
        return _horiz_dist(state.pos, entity_position(env, state, at, art_slots)) < dist_thresh

    def set_state(env, state):
        tgt = entity_position(env, state, at, art_slots)
        return _replace(state, pos=state.pos.at[:, 0].set(tgt[:, 0]).at[:, 2].set(tgt[:, 2]))

    return valid, set_state


def _fac_is_articulated_object_at_state(
    args, art_slots, target_val=0.0, cmp="close", joint_dist_thresh=0.15, **_
):
    ent = args[0]

    def valid(env, state):
        a = _entity_art_slot(env, ent, art_slots)
        q = state.art_q[:, a]
        if cmp == "greater":
            return q > target_val - joint_dist_thresh
        if cmp == "less":
            return q < target_val + joint_dist_thresh
        return jnp.abs(q - target_val) < joint_dist_thresh

    def set_state(env, state):
        a = _entity_art_slot(env, ent, art_slots)
        return _replace(state, art_q=state.art_q.at[:, a].set(target_val))

    return valid, set_state


def _fac_is_inside(args, art_slots, dist_thresh=0.8, **_):
    obj, recep = args[0], args[1]

    def valid(env, state):
        n_idx = jnp.arange(env.num_envs)
        p = env._obj_world(state)[n_idx, entity_object_index(env, state, obj)]
        q = entity_position(env, state, recep, art_slots)
        return _horiz_dist(p, q) < dist_thresh

    return valid, None


PREDICATE_FACTORIES: Dict[str, Callable] = {
    "is_robot_hold_match": _fac_is_robot_hold_match,
    "set_robot_holding": _fac_is_robot_hold_match,
    "is_object_at": _fac_is_object_at,
    "set_object_at": _fac_is_object_at,
    "is_robot_at_position": _fac_is_robot_at_position,
    "set_robot_position": _fac_is_robot_at_position,
    "is_articulated_object_at_state": _fac_is_articulated_object_at_state,
    "set_articulated_object_at_state": _fac_is_articulated_object_at_state,
    "is_inside": _fac_is_inside,
}


@dataclasses.dataclass
class GroundedPredicate:
    """A predicate bound to concrete entities; drop-in for pddl.Predicate
    inside LogicalExpr (same is_true signature)."""

    name: str
    args: List[PddlEntity]
    valid_fn: Callable
    set_state_fn: Optional[Callable] = None

    def is_true(self, env, state):
        return self.valid_fn(env, state)

    def set_state(self, env, state):
        assert self.set_state_fn is not None, f"{self.name} has no set_state"
        return self.set_state_fn(env, state)

    def __repr__(self):
        return f"{self.name}({', '.join(a.name for a in self.args)})"

    @property
    def compact_str(self) -> str:
        """Reference Predicate.compact_str format (pddl_predicate.py:145-147)
        — the GlobalPredicatesSensor ordering key."""
        return f"{self.name}({','.join(a.name for a in self.args)})"


@dataclasses.dataclass
class PredicateSchema:
    name: str
    param_types: List[str]
    factory: Callable
    kwargs: Dict[str, Any]
    set_kwargs: Optional[Dict[str, Any]] = None


@dataclasses.dataclass
class ActionSchema:
    name: str
    params: List[PddlEntity]  # parameter names with declared types
    precondition: Any  # raw YAML node (grounded at bind time)
    postcondition: List[str]  # predicate-call strings


_CALL_RE = re.compile(r"^\s*([A-Za-z_][\w]*)\s*\((.*)\)\s*$")


def parse_predicate_call(s: str):
    m = _CALL_RE.match(s)
    assert m, f"bad predicate call: {s!r}"
    args = [a.strip() for a in m.group(2).split(",") if a.strip()]
    return m.group(1), args


def _tail(target: str) -> str:
    return target.rsplit(".", 1)[-1]


class YamlPddlDomain:
    """Domain loaded from the reference's domain-config schema
    (pddl_domain.py:48 loads the same sections)."""

    def __init__(self, node: dict):
        self.types = ExprTypes.from_yaml(node.get("types"))
        self.constants: Dict[str, PddlEntity] = {}
        self.art_slots: Dict[str, int] = {}
        for i, c in enumerate(node.get("constants") or ()):
            ent = PddlEntity(c["name"], c["expr_type"])
            self.constants[ent.name] = ent
            self.art_slots[ent.name] = i
        self.predicates: Dict[str, PredicateSchema] = {}
        for p in node.get("predicates") or ():
            fn_node = p.get("is_valid_fn") or {}
            fac_name = _tail(fn_node.get("_target_", ""))
            factory = PREDICATE_FACTORIES.get(fac_name)
            assert factory is not None, f"unknown predicate fn {fac_name!r}"
            kwargs = {k: v for k, v in fn_node.items() if k != "_target_"}
            set_node = p.get("set_state_fn") or None
            set_kwargs = (
                {k: v for k, v in set_node.items() if k != "_target_"}
                if set_node
                else None
            )
            self.predicates[p["name"]] = PredicateSchema(
                p["name"],
                [a["expr_type"] for a in p.get("args") or ()],
                factory,
                kwargs,
                set_kwargs,
            )
        self.actions: Dict[str, ActionSchema] = {}
        for a in node.get("actions") or ():
            self.actions[a["name"]] = ActionSchema(
                a["name"],
                [PddlEntity(x["name"], x["expr_type"]) for x in a.get("parameters") or ()],
                a.get("precondition"),
                list(a.get("postcondition") or ()),
            )

    @classmethod
    def from_yaml(cls, path: str) -> "YamlPddlDomain":
        with open(path) as f:
            return cls(yaml.safe_load(f))

    # -- grounding -----------------------------------------------------------
    def ground_predicate(
        self, name: str, args: Sequence[PddlEntity]
    ) -> GroundedPredicate:
        schema = self.predicates[name]
        valid, set_state = schema.factory(list(args), self.art_slots, **schema.kwargs)
        if schema.set_kwargs is not None:
            _, set_state = schema.factory(
                list(args), self.art_slots, **schema.set_kwargs
            )
        return GroundedPredicate(name, list(args), valid, set_state)

    def _entities_of_type(self, t: str, extra: Dict[str, PddlEntity]):
        pool = {**self.constants, **extra}
        return [e for e in pool.values() if self.types.is_subtype(e.expr_type, t)]

    def get_possible_predicates(
        self, extra: Dict[str, PddlEntity]
    ) -> List[GroundedPredicate]:
        """All type-compatible groundings of every predicate schema over
        constants + ``extra`` entities, sorted by compact_str — the
        reference's GlobalPredicatesSensor universe (pddl_domain.py:420-439:
        itertools.combinations over all_entities filtered by
        are_args_compatible, then sorted by compact_str). Entity insertion
        order decides which argument ORDERINGS get tried (combinations, not
        permutations) — pass ``extra`` with objects/goals/receptacles before
        robots so (obj, robot)-style signatures ground."""
        pool = {**self.constants, **extra}
        ents = list(pool.values())
        out: List[GroundedPredicate] = []
        for schema in self.predicates.values():
            for combo in itertools.combinations(ents, len(schema.param_types)):
                if not all(
                    self.types.is_subtype(e.expr_type, t)
                    for e, t in zip(combo, schema.param_types)
                ):
                    continue
                out.append(self.ground_predicate(schema.name, list(combo)))
        return sorted(out, key=lambda p: p.compact_str)

    def parse_expr(self, node, scope: Dict[str, PddlEntity]):
        """YAML expression node -> LogicalExpr/GroundedPredicate. Handles
        nested expr_type AND/OR/NAND/NOR and FORALL quantifiers (expanded
        over all in-scope entities of the quantified type, reference
        pddl_logical_expr.py)."""
        if isinstance(node, str):
            name, arg_names = parse_predicate_call(node)
            return self.ground_predicate(name, [scope[a] for a in arg_names])
        assert isinstance(node, dict), node
        expr_type = {
            "AND": LogicalExprType.AND,
            "OR": LogicalExprType.OR,
            "NAND": LogicalExprType.NAND,
            "NOR": LogicalExprType.NOR,
        }[node.get("expr_type", "AND")]
        if node.get("quantifier") == "FORALL":
            inputs = [PddlEntity(x["name"], x["expr_type"]) for x in node["inputs"]]
            assert len(inputs) == 1, "only single-variable FORALL supported"
            var = inputs[0]
            expansions = []
            for ent in self._entities_of_type(var.expr_type, scope):
                sub_scope = {**scope, var.name: ent}
                sub = [self.parse_expr(s, sub_scope) for s in node["sub_exprs"]]
                expansions.append(LogicalExpr(expr_type, sub))
            if not expansions:
                return LogicalExpr(LogicalExprType.AND, [])
            return LogicalExpr(LogicalExprType.AND, expansions)
        subs = [self.parse_expr(s, scope) for s in node["sub_exprs"]]
        return LogicalExpr(expr_type, subs)

    def bind_action(self, name: str, args: Sequence[PddlEntity]) -> PddlAction:
        schema = self.actions[name]
        scope = dict(self.constants)
        for param, ent in zip(schema.params, args):
            scope[param.name] = ent
        pre = (
            self.parse_expr(schema.precondition, scope)
            if schema.precondition
            else None
        )
        post = (
            LogicalExpr(
                LogicalExprType.AND,
                [self.parse_expr(p, scope) for p in schema.postcondition],
            )
            if schema.postcondition
            else None
        )
        return PddlAction(name, precond=pre, postcond=post, skill_name=name)


class PddlProblem:
    """Task spec: objects + init + goal + stage_goals + solution (reference
    pddl_domain.py:558 PddlProblem / pddl_task.py:22-36)."""

    def __init__(self, domain: YamlPddlDomain, node: dict):
        self.domain = domain
        self.objects: Dict[str, PddlEntity] = {
            o["name"]: PddlEntity(o["name"], o["expr_type"])
            for o in node.get("objects") or ()
        }
        scope = {**domain.constants, **self.objects}
        self.init: List[GroundedPredicate] = []
        for call in node.get("init") or ():
            name, arg_names = parse_predicate_call(call)
            self.init.append(
                domain.ground_predicate(name, [scope[a] for a in arg_names])
            )
        self.goal = (
            domain.parse_expr(node["goal"], scope) if node.get("goal") else None
        )
        self.stage_goals = {
            k: domain.parse_expr(v, scope)
            for k, v in (node.get("stage_goals") or {}).items()
        }
        self.solution: List[PddlAction] = []
        self._solution_calls: List = []
        for call in node.get("solution") or ():
            name, arg_names = parse_predicate_call(call)
            args = [scope[a] for a in arg_names]
            self.solution.append(domain.bind_action(name, args))
            self._solution_calls.append((name, args))

    @classmethod
    def from_yaml(cls, domain: YamlPddlDomain, path: str) -> "PddlProblem":
        with open(path) as f:
            return cls(domain, yaml.safe_load(f))

    def apply_init(self, env, state):
        """Apply `init:` predicates as state transforms (reference sets sim
        state through each predicate's set_state, pddl_domain.py)."""
        for pred in self.init:
            if pred.set_state_fn is not None:
                state = pred.set_state(env, state)
        return state

    def goal_satisfied(self, env, state) -> jnp.ndarray:
        assert self.goal is not None
        return self.goal.is_true(env, state)

    def solution_to_skills(self):
        """Bound solution actions -> HRL skill instances. nav to a goal
        entity routes to NavToGoalSkill; open/close actions to ArtObjSkill."""
        from habitat_tpu.baselines.hrl.hierarchical import (
            ArtObjSkill,
            NavToGoalSkill,
            OracleNavSkill,
            PickSkill,
            PlaceSkill,
            WaitSkill,
        )

        skills = []
        for name, args in self._solution_calls:
            if name.startswith("nav"):
                to_goal = any(a.expr_type == GOAL_TYPE for a in args)
                skills.append(NavToGoalSkill() if to_goal else OracleNavSkill())
            elif name == "pick":
                skills.append(PickSkill())
            elif name == "place":
                skills.append(PlaceSkill())
            elif name.startswith(("open", "close")):
                skills.append(ArtObjSkill())
            else:
                skills.append(WaitSkill())
        return skills
