"""Population-play machinery tests (reference rl/multi_agent coverage)."""

import numpy as np
import jax
import jax.numpy as jnp

from habitat_tpu.baselines.multi_agent import (
    AgentSpec,
    MultiAgentAccessMgr,
    apply_population,
    population_size,
    select_params,
    stack_params,
)


def _make_params(key, scale):
    return {"w": jnp.full((4, 4), scale), "b": jnp.full((4,), scale)}


def test_population_stack_select():
    pop = [_make_params(None, float(i)) for i in range(3)]
    stacked = stack_params(pop)
    assert population_size(stacked) == 3
    p1 = select_params(stacked, jnp.int32(1))
    assert float(p1["w"][0, 0]) == 1.0
    lanes = select_params(stacked, jnp.asarray([2, 0, 1]))
    assert lanes["w"].shape == (3, 4, 4)
    np.testing.assert_allclose(np.asarray(lanes["b"][0]), 2.0)


def test_apply_population_per_lane():
    pop = [_make_params(None, float(i)) for i in range(4)]
    stacked = stack_params(pop)

    def apply_fn(params, x):
        return params["w"] @ x + params["b"]

    lane_idx = jnp.asarray([3, 0])
    xs = jnp.ones((2, 4))
    out = apply_population(apply_fn, stacked, lane_idx, xs)
    np.testing.assert_allclose(np.asarray(out[0]), 4 * 3.0 + 3.0)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)


def test_access_mgr_snapshots():
    mgr = MultiAgentAccessMgr([AgentSpec("robot"), AgentSpec("humanoid", learner=False)])
    assert mgr.nagents == 2
    for i in range(3):
        mgr.push_snapshot(_make_params(None, float(i)), max_size=2)
    assert population_size(mgr.population) == 2  # oldest evicted
    idx = mgr.sample_opponents(16)
    assert idx.shape == (16,)
    assert idx.max() < 2
