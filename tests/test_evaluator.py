"""Evaluator: exactly-once accounting + video (reference habitat_evaluator)."""

import os

import numpy as np
import jax
import pytest

from habitat_tpu.baselines.evaluator import evaluate_agent
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.models.policy import make_pointnav_resnet_policy


def test_evaluate_agent_counts_and_video(tmp_path):
    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=2, episodes_per_scene=4, seed=4
    )
    env = make_nav_env(
        scenes,
        episodes,
        num_envs=4,
        sensor_specs=(
            ("HabitatSimDepthSensor", {"height": 32, "width": 32}),
            ("PointGoalWithGPSCompassSensor", None),
        ),
        precomputed_fields=fields,
        max_episode_steps=16,
    )
    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone="resnet9", hidden_size=32
    )
    n = env.num_envs
    from habitat_tpu.models.rnn_state_encoder import initial_hidden_state
    import jax.numpy as jnp

    params = policy.init(
        jax.random.PRNGKey(0),
        {k: v for k, v in env._observations(env.reset(seed=0)[0]).items()},
        initial_hidden_state(n, 32, 1, "LSTM"),
        jnp.zeros((n,), jnp.int32),
        jnp.ones((n,)),
    )
    metrics = evaluate_agent(
        env,
        policy,
        params,
        episodes_per_env=2,
        seed=1,
        video_option=("disk",),
        video_dir=str(tmp_path),
    )
    assert metrics["num_episodes"] == 8.0  # exactly-once: 4 envs x 2 episodes
    assert "spl" in metrics and "reward" in metrics
    vids = os.listdir(tmp_path)
    assert len(vids) == 1 and vids[0].endswith((".mp4", ".gif"))


def test_evaluate_with_topdown_map(tmp_path):
    """TopDownMap overlay in eval video frames (tracker wiring)."""
    import jax
    from habitat_tpu.baselines.evaluator import evaluate_agent
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.models.policy import make_pointnav_resnet_policy
    from habitat_tpu.utils.visualizations.maps import TopDownMapTracker

    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=1, episodes_per_scene=4, seed=0, extent=6.0
    )
    env = make_nav_env(
        scenes,
        episodes,
        num_envs=2,
        precomputed_fields=fields,
        max_episode_steps=12,
        sensor_specs=(
            ("HabitatSimDepthSensor", {"height": 32, "width": 32}),
            ("PointGoalWithGPSCompassSensor", None),
        ),
    )
    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone="resnet9", hidden_size=32
    )
    import jax.numpy as jnp
    from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

    obs = {
        "depth": jnp.zeros((2, 32, 32, 1)),
        "pointgoal_with_gps_compass": jnp.zeros((2, 2)),
    }
    params = policy.init(
        jax.random.PRNGKey(0),
        obs,
        initial_hidden_state(2, 32, 1, "LSTM"),
        jnp.zeros((2,), jnp.int32),
        jnp.ones((2,)),
    )
    tracker = TopDownMapTracker(scenes[0])
    out = evaluate_agent(
        env,
        policy,
        params,
        episodes_per_env=1,
        max_steps=14,
        video_option=("disk",),
        video_dir=str(tmp_path),
        map_tracker=tracker,
    )
    assert "num_episodes" in out
    import os

    assert any(f.endswith((".gif", ".mp4")) for f in os.listdir(tmp_path))


def test_evaluate_agent_gaussian_policy():
    """Continuous (gaussian) policies evaluate through the same loop
    (reference HabitatEvaluator handles both action distributions)."""
    import jax

    from habitat_tpu.baselines.evaluator import evaluate_agent
    from habitat_tpu.models.policy import make_gaussian_resnet_policy
    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

    env = make_rearrange_env(
        num_envs=4, task="reach", with_visual=False, control="arm",
        n_rooms_per_axis=1, n_clutter=0, max_episode_steps=20, seed=0,
    )
    policy = make_gaussian_resnet_policy(
        env.action_space.shape[0], has_visual=False, hidden_size=32
    )
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    hidden = None
    params = policy.init(
        jax.random.PRNGKey(1), obs,
        __import__("habitat_tpu.models.rnn_state_encoder", fromlist=["initial_hidden_state"]).initial_hidden_state(
            4, policy.net.hidden_size, policy.net.num_recurrent_layers, policy.net.rnn_type
        ),
        __import__("jax.numpy", fromlist=["zeros"]).zeros((4, env.action_space.shape[0])),
        __import__("jax.numpy", fromlist=["zeros"]).zeros((4,)),
    )
    out = evaluate_agent(
        env, policy, params, episodes_per_env=1,
        measure_keys=("rearrange_reach_success",), seed=3,
    )
    assert out["num_episodes"] >= 4
    assert "reward" in out
