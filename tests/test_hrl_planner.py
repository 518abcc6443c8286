import numpy as np
import jax
import jax.numpy as jnp


def test_plan_table_symbolics():
    from habitat_tpu.baselines.hrl.planner import build_plan_table
    from habitat_tpu.tasks.rearrange.multi_task.pddl import PddlDomain

    dom = PddlDomain()
    table, names, actions = build_plan_table(dom)
    a_idx = {a.name: i for i, a in enumerate(actions)}
    bit = {n: 1 << i for i, n in enumerate(names)}

    # fresh episode: not holding, nowhere near anything -> nav_to_obj
    start = bit["not_holding"]
    assert table[start] == a_idx["nav_to_obj"]
    # at the object, not holding -> pick
    assert table[bit["not_holding"] | bit["robot_at_obj"]] == a_idx["pick"]
    # holding -> nav_to_goal
    assert table[bit["holding"] | bit["robot_at_obj"]] == a_idx["nav_to_goal"]
    # holding at the goal -> place
    assert table[bit["holding"] | bit["robot_at_goal"]] == a_idx["place"]
    # goal satisfied -> -1 (no action needed)
    assert table[bit["at"] | bit["not_holding"]] == -1


def test_planner_policy_solves_rearrange():
    """The table-driven planner must solve the composite rearrange task with
    oracle skills (reference PlannerHighLevelPolicy + oracle skills)."""
    from habitat_tpu.baselines.hrl.planner import PlannerHighLevelPolicy
    from habitat_tpu.baselines.hrl.hierarchical import HierarchicalPolicy
    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

    env = make_rearrange_env(
        num_envs=4, task="rearrange", with_visual=False, seed=3,
        max_episode_steps=400, n_rooms_per_axis=1, n_clutter=0,
    )
    hl = PlannerHighLevelPolicy(env)
    pol = HierarchicalPolicy(env, hl)
    state, _ = env.reset_fn(jax.random.PRNGKey(0))
    hl_state = pol.init_state()
    state, hl_state, rs, dones, succ = jax.jit(
        lambda s, h: pol.rollout(s, h, 400)
    )(state, hl_state)
    # every env should have completed at least one successful episode
    per_env = np.asarray(succ).max(axis=0)
    assert per_env.mean() >= 0.75, per_env
