"""Trainer: checkpoint/resume roundtrip + eval CLI (reference §5.3/5.4
preemption-resume scheme + base_trainer eval)."""

import os

import numpy as np
import jax
import pytest

from habitat_tpu.config.default import get_config

OVERRIDES = [
    "habitat_baselines.num_environments=4",
    "habitat_baselines.rl.ppo.num_steps=8",
    "habitat_baselines.rl.ppo.hidden_size=32",
    "habitat_baselines.rl.ppo.num_mini_batch=2",
    "habitat.dataset.procedural.num_scenes=1",
    "habitat.dataset.procedural.episodes_per_scene=4",
    "habitat.simulator.agents.main_agent.sim_sensors.depth_sensor.width=32",
    "habitat.simulator.agents.main_agent.sim_sensors.depth_sensor.height=32",
    "habitat_baselines.verbose=False",
]


def _trainer(tmp_path, extra=()):
    from habitat_tpu.core.construct import trainer_from_config

    cfg = get_config(
        "pointnav/ppo_pointnav_example.yaml",
        OVERRIDES
        + [
            f"habitat_baselines.checkpoint_folder={tmp_path}/ckpt",
            "habitat_baselines.tensorboard_dir=",
            "habitat_baselines.total_num_steps=96",  # 3 updates of 32
            "habitat_baselines.num_checkpoints=2",
        ]
        + list(extra),
    )
    return trainer_from_config(cfg), cfg


def test_train_checkpoint_resume_roundtrip(tmp_path):
    trainer, cfg = _trainer(tmp_path)
    metrics = trainer.train(seed=0, resume=False)
    assert trainer.num_updates_done == 3
    ckpts = os.listdir(f"{tmp_path}/ckpt")
    assert "latest" in ckpts and any(c.startswith("ckpt.") for c in ckpts)

    # resume-state save/load (preemption scheme): save, fresh trainer, load
    trainer.save_checkpoint(trainer._final_ts, ".resume_state")
    trainer2, _ = _trainer(tmp_path)
    assert trainer2.resume_state_exists()
    ts = trainer2._init(jax.random.PRNGKey(0), trainer2._env_data)
    ts = trainer2.load_checkpoint(".resume_state", ts)
    assert trainer2.num_updates_done == 3
    # restored params equal saved params
    a = jax.tree.leaves(trainer._final_ts.params)[0]
    b = jax.tree.leaves(ts.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_eval_cli_path(tmp_path):
    from habitat_tpu.baselines.run import execute_exp

    trainer, cfg = _trainer(tmp_path, extra=["habitat_baselines.test_episode_count=4"])
    trainer.train(seed=0, resume=False)

    from habitat_tpu.config.omega import read_write

    metrics = execute_exp(cfg, "eval")
    assert "num_episodes" in metrics and metrics["num_episodes"] >= 4
