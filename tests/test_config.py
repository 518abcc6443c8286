"""Config composition tests (reference test/test_config.py — every shipped
YAML must compose; schema fields must match)."""

import glob
import os

import pytest

from habitat_tpu.config.default import CONFIG_ROOT, get_config, read_write


def _all_shipped_experiment_configs():
    out = []
    for sub in ("experiments", "benchmark"):
        out += glob.glob(os.path.join(CONFIG_ROOT, sub, "**", "*.yaml"), recursive=True)
    return sorted(out)


@pytest.mark.parametrize("path", _all_shipped_experiment_configs())
def test_all_shipped_configs_compose(path):
    cfg = get_config(path)
    assert "habitat" in cfg
    assert cfg.habitat.simulator.type == "Sim-v0"


def test_pointnav_benchmark_schema():
    cfg = get_config("benchmark/nav/pointnav/pointnav_procgen.yaml")
    task = cfg.habitat.task
    assert task.type == "Nav-v0"
    assert task.reward_measure == "distance_to_goal_reward"
    assert task.success_measure == "spl"
    assert task.end_on_success is True
    # actions composed from the group defaults
    assert set(task.actions) == {"stop", "move_forward", "turn_left", "turn_right"}
    assert task.actions.stop.type == "StopAction"
    assert set(task.measurements) == {
        "distance_to_goal",
        "success",
        "spl",
        "distance_to_goal_reward",
    }
    assert task.measurements.success.success_distance == 0.2
    assert (
        task.lab_sensors.pointgoal_with_gps_compass.type
        == "PointGoalWithGPSCompassSensor"
    )
    # sensor setup landed on main_agent with overridden resolution
    d = cfg.habitat.simulator.agents.main_agent.sim_sensors.depth_sensor
    assert d.width == 128 and d.height == 128
    assert d.type == "HabitatSimDepthSensor"
    assert cfg.habitat.simulator.agents.main_agent.height == 1.5
    assert cfg.habitat.environment.max_episode_steps == 500


def test_experiment_config_and_overrides():
    cfg = get_config(
        "pointnav/ppo_pointnav_example.yaml",
        ["habitat_baselines.rl.ppo.lr=1e-4", "habitat.seed=7"],
    )
    assert cfg.habitat_baselines.trainer_name == "ppo"
    assert cfg.habitat_baselines.rl.ppo.lr == 1e-4
    assert cfg.habitat.seed == 7
    assert cfg.habitat_baselines.rl.ppo.num_steps == 32
    # defaults from the store that the yaml didn't touch
    assert cfg.habitat_baselines.rl.ddppo.backbone == "resnet18"


def test_readonly_and_read_write():
    cfg = get_config("benchmark/nav/pointnav/pointnav_procgen.yaml")
    with pytest.raises(RuntimeError):
        cfg.habitat.seed = 1
    with read_write(cfg):
        cfg.habitat.seed = 1
    assert cfg.habitat.seed == 1
    with pytest.raises(RuntimeError):
        cfg.habitat.seed = 2


def test_interpolation():
    cfg = get_config("benchmark/nav/pointnav/pointnav_procgen.yaml")
    # simulator.seed interpolates ${habitat.seed}
    assert cfg.habitat.simulator.seed == cfg.habitat.seed


def test_env_from_config():
    from habitat_tpu.core.construct import env_from_config

    cfg = get_config(
        "benchmark/nav/pointnav/pointnav_procgen.yaml",
        [
            "habitat.dataset.procedural.num_scenes=2",
            "habitat.dataset.procedural.episodes_per_scene=4",
            # keep test cheap: tiny depth sensor
            "habitat.simulator.agents.main_agent.sim_sensors.depth_sensor.width=32",
            "habitat.simulator.agents.main_agent.sim_sensors.depth_sensor.height=32",
        ],
    )
    env = env_from_config(cfg, num_envs=2)
    assert env.action_space.n == 4
    assert env.action_names[0] == "stop"
    assert "depth" in env.observation_space.spaces
    assert env.observation_space["depth"].shape == (32, 32, 1)
    assert "pointgoal_with_gps_compass" in env.observation_space.spaces
    state, obs = env.reset(seed=0)
    assert obs["depth"].shape == (2, 32, 32, 1)
    state, obs, r, d, info = env.step(state, [1, 2])
    assert "spl" in info
