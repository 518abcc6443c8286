"""Trainer x task grid smoke (reference test/test_baseline_trainers.py:50-66
parametrized short end-to-end runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
from habitat_tpu.models.policy import make_pointnav_resnet_policy


def _nav_env(sensors, n=4):
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav

    scenes, eps, fields = make_procedural_pointnav(num_scenes=1, episodes_per_scene=4, seed=8)
    return make_nav_env(
        scenes, eps, num_envs=n, sensor_specs=sensors,
        precomputed_fields=fields, max_episode_steps=16,
    )


TRAINERS = ["ppo", "ddppo", "ver"]


@pytest.mark.parametrize("trainer_name", TRAINERS)
def test_trainer_grid_nav(trainer_name):
    """Each registered trainer runs 2 updates on pointnav."""
    from habitat_tpu.core.registry import registry
    from habitat_tpu.baselines.trainer import TrainerConfig
    import habitat_tpu.baselines.trainer  # noqa: F401

    env = _nav_env((
        ("HabitatSimDepthSensor", {"height": 32, "width": 32}),
        ("PointGoalWithGPSCompassSensor", None),
    ))
    policy = make_pointnav_resnet_policy(len(env.actions), backbone="resnet9", hidden_size=32)
    cls = registry.get_trainer(trainer_name)
    trainer = cls(
        env,
        policy,
        PPOConfig(num_steps=8, num_mini_batch=2, ppo_epoch=1),
        TrainerConfig(total_num_steps=64, checkpoint_folder="/tmp/grid_ckpt",
                      num_checkpoints=1, verbose=False, use_mesh=False),
    )
    metrics = trainer.train(seed=0, resume=False)
    assert np.isfinite(metrics["losses/learner_loss"])


@pytest.mark.parametrize("obs_mode", ["blind", "depth", "rgbd"])
def test_ppo_obs_modes(obs_mode):
    """Sensor-mode grid (reference gpu2gpu x obs-transforms grid analogue)."""
    sensors = {
        "blind": (("PointGoalWithGPSCompassSensor", None),),
        "depth": (
            ("HabitatSimDepthSensor", {"height": 32, "width": 32}),
            ("PointGoalWithGPSCompassSensor", None),
        ),
        "rgbd": (
            ("HabitatSimDepthSensor", {"height": 32, "width": 32}),
            ("HabitatSimRGBSensor", {"height": 32, "width": 32}),
            ("PointGoalWithGPSCompassSensor", None),
        ),
    }[obs_mode]
    env = _nav_env(sensors)
    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone="resnet9", hidden_size=32,
        has_visual=obs_mode != "blind",
    )
    learner = PPOLearner(env, policy, PPOConfig(num_steps=8, num_mini_batch=2, ppo_epoch=1))
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    ts, m = jax.jit(learner.train_step, donate_argnums=(0,))(ts)
    assert np.isfinite(float(m["losses/learner_loss"]))
