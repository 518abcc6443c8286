"""HRL hierarchy + PDDL grounding tests (reference test_baseline_training.py
test_hrl + test_rearrange_task.py test_pddl_actions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.baselines.hrl.hierarchical import (
    FixedHighLevelPolicy,
    HierarchicalPolicy,
    default_rearrange_plan,
)
from habitat_tpu.tasks.rearrange.generator import make_rearrange_env
from habitat_tpu.tasks.rearrange.multi_task.pddl import (
    DEFAULT_PREDICATES,
    LogicalExpr,
    LogicalExprType,
    PddlDomain,
)


@pytest.fixture(scope="module")
def composite_env():
    return make_rearrange_env(
        num_envs=4,
        task="rearrange",
        with_visual=False,
        max_episode_steps=400,
        n_rooms_per_axis=1,
        n_clutter=0,
        seed=3,
    )


def test_pddl_predicates_grounding(composite_env):
    env = composite_env
    state, obs = env.reset(seed=0)
    P = DEFAULT_PREDICATES
    assert np.all(np.asarray(P["not_holding"].is_true(env, state)))
    assert not np.any(np.asarray(P["holding"].is_true(env, state)))
    expr = LogicalExpr(LogicalExprType.AND, [P["not_holding"], P["holding"]])
    assert not np.any(np.asarray(expr.is_true(env, state)))
    expr_or = LogicalExpr(LogicalExprType.OR, [P["not_holding"], P["holding"]])
    assert np.all(np.asarray(expr_or.is_true(env, state)))


def test_pddl_plan_applicability(composite_env):
    env = composite_env
    state, obs = env.reset(seed=0)
    domain = PddlDomain()
    plan = domain.plan_for_goal()
    assert [a.name for a in plan] == ["nav_to_obj", "pick", "nav_to_goal", "place"]
    # at reset: nav_to_obj applicable everywhere, place not (not holding)
    assert np.all(np.asarray(plan[0].is_applicable(env, state)))
    assert not np.any(np.asarray(plan[3].is_applicable(env, state)))


def test_hierarchical_policy_solves_rearrange(composite_env):
    """Fixed plan (nav->pick->nav->place) must place objects batched."""
    env = composite_env
    state, obs = env.reset(seed=0)
    domain = PddlDomain()
    skills = domain.compile_plan_to_skills(domain.plan_for_goal())
    hier = HierarchicalPolicy(env, FixedHighLevelPolicy(env, skills))
    hl = hier.init_state()
    rollout = jax.jit(lambda s, h: hier.rollout(s, h, 300))
    state, hl, rs, dones, succ = rollout(state, hl)
    # at least half the lanes complete the full rearrangement within 300 steps
    solved = np.asarray(succ).max(axis=0)
    assert solved.sum() >= 2, solved


def test_nn_skill_in_hierarchy(composite_env):
    """A (briefly trained) neural pick skill plugs into the skill protocol
    (reference skills/nn_skill.py) and the hierarchy still executes."""
    from habitat_tpu.baselines.hrl.hierarchical import (
        NavToGoalSkill,
        NnSkill,
        OracleNavSkill,
        PickSkill,
        PlaceSkill,
    )
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.models.policy import make_pointnav_resnet_policy

    env = composite_env
    policy = make_pointnav_resnet_policy(
        env.action_space.n, has_visual=False, hidden_size=32, goal_keys=()
    )
    learner = PPOLearner(
        env, policy, PPOConfig(num_steps=8, num_mini_batch=2, ppo_epoch=1),
        measure_keys=("success",),
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    ts, _ = jax.jit(learner.train_step, donate_argnums=(0,))(ts)

    pick_done = PickSkill().is_done
    nn_pick = NnSkill(policy, ts.params, done_fn=pick_done, name="nn_pick")
    plan = [OracleNavSkill(), nn_pick, NavToGoalSkill(), PlaceSkill()]
    hier = HierarchicalPolicy(env, FixedHighLevelPolicy(env, plan))
    state, obs = env.reset(seed=0)
    hl = hier.init_state()
    rollout = jax.jit(lambda s, h: hier.rollout(s, h, 20))
    state, hl, rs, dones, succ = rollout(state, hl)
    assert rs.shape == (20, env.num_envs)
