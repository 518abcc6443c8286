"""YAML PDDL loading: our domain, the REFERENCE's domain/task-spec files
unmodified, and grounding against the batched rearrange engine."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from habitat_tpu.tasks.rearrange.generator import make_rearrange_env
from habitat_tpu.tasks.rearrange.multi_task.pddl_yaml import (
    PddlEntity,
    PddlProblem,
    YamlPddlDomain,
)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TPU_DOMAIN = os.path.join(
    HERE,
    "habitat_tpu/tasks/rearrange/multi_task/domain_configs/tpu_rearrange.yaml",
)
REF_DOMAIN = (
    "/root/reference/habitat-lab/habitat/tasks/rearrange/multi_task/"
    "domain_configs/replica_cad.yaml"
)
REF_SPEC = (
    "/root/reference/habitat-lab/habitat/config/habitat/task/rearrange/pddl/"
    "rearrange_easy.yaml"
)


@pytest.fixture(scope="module")
def env_state():
    env = make_rearrange_env(num_envs=4, task="rearrange", seed=3)
    state, _ = jax.jit(env.reset_fn)(jax.random.PRNGKey(0))
    return env, state


def test_load_tpu_domain():
    dom = YamlPddlDomain.from_yaml(TPU_DOMAIN)
    assert {"holding", "not_holding", "object_at", "robot_at"} <= set(dom.predicates)
    assert {"nav", "pick", "place", "open_cab", "close_cab"} <= set(dom.actions)
    assert dom.types.is_subtype("cab_type", "static_obj_type")
    assert not dom.types.is_subtype("movable_entity_type", "cab_type")
    assert "drawer_0" in dom.constants


def test_grounded_predicates(env_state):
    env, state = env_state
    dom = YamlPddlDomain.from_yaml(TPU_DOMAIN)
    obj = PddlEntity("target|0", "movable_entity_type")
    goal = PddlEntity("TARGET_target|0", "goal_entity_type")
    robot = PddlEntity("robot_0", "robot_entity_type")

    holding = dom.ground_predicate("holding", [obj, robot])
    not_holding = dom.ground_predicate("not_holding", [robot])
    at = dom.ground_predicate("object_at", [obj, goal])

    assert np.asarray(not_holding.is_true(env, state)).all()
    assert not np.asarray(holding.is_true(env, state)).any()
    assert not np.asarray(at.is_true(env, state)).any()

    # set_state: grab the object, predicate flips
    state2 = holding.set_state(env, state)
    assert np.asarray(holding.is_true(env, state2)).all()
    # set_state: teleport object to its goal
    state3 = at.set_state(env, state)
    assert np.asarray(at.is_true(env, state3)).all()


def test_forall_precondition(env_state):
    env, state = env_state
    dom = YamlPddlDomain.from_yaml(TPU_DOMAIN)
    obj = PddlEntity("target|0", "movable_entity_type")
    robot = PddlEntity("robot_0", "robot_entity_type")
    pick = dom.bind_action("pick", [obj, robot])
    # FORALL over cab constants expands to a finite AND; evaluates to (N,)
    ok = np.asarray(pick.is_applicable(env, state))
    assert ok.shape == (env.num_envs,) and ok.dtype == bool
    post = np.asarray(pick.is_satisfied(env, state))
    assert post.shape == (env.num_envs,)


@pytest.mark.skipif(not os.path.exists(REF_DOMAIN), reason="reference absent")
def test_reference_domain_loads_unmodified(env_state):
    env, state = env_state
    dom = YamlPddlDomain.from_yaml(REF_DOMAIN)
    # the reference's replica_cad domain: all predicates resolve to our
    # vectorized factories by tail name
    for name in (
        "holding",
        "not_holding",
        "opened_cab",
        "closed_cab",
        "opened_fridge",
        "robot_at",
        "object_at",
        "in",
    ):
        assert name in dom.predicates, name
    for name in ("nav", "pick", "place", "open_cab", "close_fridge"):
        assert name in dom.actions, name
    assert dom.types.is_subtype("fridge_type", "art_receptacle_entity_type")
    # ground + evaluate one on the batched engine
    cab = dom.constants["cab_push_point_7"]
    closed = dom.ground_predicate("closed_cab", [cab])
    assert np.asarray(closed.is_true(env, state)).shape == (env.num_envs,)


@pytest.mark.skipif(not os.path.exists(REF_SPEC), reason="reference absent")
def test_reference_task_spec_unmodified(env_state):
    env, state = env_state
    dom = YamlPddlDomain.from_yaml(REF_DOMAIN)
    prob = PddlProblem.from_yaml(dom, REF_SPEC)
    assert "goal0|0" in prob.objects and "robot_0" in prob.objects
    assert prob.goal is not None
    assert len(prob.solution) == 4  # nav, pick, nav, place
    g = np.asarray(prob.goal_satisfied(env, state))
    assert g.shape == (env.num_envs,) and not g.any()
    assert "stage_0_5" in prob.stage_goals
    s05 = np.asarray(prob.stage_goals["stage_0_5"].is_true(env, state))
    assert s05.shape == (env.num_envs,)
    skills = prob.solution_to_skills()
    assert len(skills) == 4
    # drive the solution by set_state: pick postcondition then place
    st = prob.solution[1].postcond.sub_exprs[0].set_state(env, state)
    assert np.asarray(prob.stage_goals["stage_0_5"].is_true(env, st)).all()
    for pred in prob.solution[3].postcond.sub_exprs:
        st = pred.set_state(env, st)
    assert np.asarray(prob.goal_satisfied(env, st)).all()


def test_init_application(env_state):
    env, state = env_state
    dom = YamlPddlDomain.from_yaml(TPU_DOMAIN)
    prob = PddlProblem(
        dom,
        {
            "objects": [
                {"name": "target|0", "expr_type": "movable_entity_type"},
                {"name": "robot_0", "expr_type": "robot_entity_type"},
            ],
            "init": ["closed_cab(drawer_0)", "holding(target|0, robot_0)"],
            "goal": {
                "expr_type": "AND",
                "sub_exprs": ["holding(target|0, robot_0)"],
            },
        },
    )
    st = prob.apply_init(env, state)
    assert np.asarray(prob.goal_satisfied(env, st)).all()
