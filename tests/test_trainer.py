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


def test_eval_checkpoint_polling_loop(tmp_path):
    """Checkpoint-folder polling eval + resumable eval state (reference
    BaseTrainer.eval, common/base_trainer.py:108-167)."""
    from habitat_tpu.baselines.evaluator import (
        eval_checkpoint_loop,
        poll_checkpoint_folder,
    )

    trainer, cfg = _trainer(tmp_path)
    trainer.train(seed=0, resume=False)
    folder = os.path.join(str(tmp_path), "ckpt")
    first = poll_checkpoint_folder(folder, -1)
    assert first is not None and first.endswith("ckpt.0")

    results = eval_checkpoint_loop(trainer, cfg, timeout_s=120.0)
    assert results, "no checkpoints evaluated"
    for idx, m in results.items():
        assert m.get("num_episodes", 0) > 0
    # resume state written; a second loop resumes past everything
    assert os.path.exists(os.path.join(folder, ".eval_resume_state"))
    again = eval_checkpoint_loop(trainer, cfg, timeout_s=5.0)
    assert again == {}


def test_evals_per_ep(tmp_path):
    from habitat_tpu.baselines.evaluator import evaluate_agent

    trainer, cfg = _trainer(tmp_path)
    ts = trainer._init(jax.random.PRNGKey(0), trainer._env_data)
    m1 = evaluate_agent(
        trainer.env, trainer.policy, ts.params, episodes_per_env=1, evals_per_ep=1
    )
    m2 = evaluate_agent(
        trainer.env, trainer.policy, ts.params, episodes_per_env=1, evals_per_ep=3
    )
    assert m2["num_episodes"] == 3 * m1["num_episodes"]


def test_preemption_requeue(tmp_path, monkeypatch):
    """SIGUSR1 = SLURM preemption: stopper flags exit+requeue and the train
    loop saves .resume_state then issues `scontrol requeue $SLURM_JOB_ID`
    (reference ddp_utils.py:36-41,163-179,227-240)."""
    import signal as _signal

    from habitat_tpu.baselines.trainer import EarlyStopper, requeue_job

    stopper = EarlyStopper()
    os.kill(os.getpid(), _signal.SIGUSR1)
    assert stopper.should_exit and stopper.should_requeue

    # SIGUSR2 = SAVE_STATE/EXIT without requeue
    stopper2 = EarlyStopper()
    os.kill(os.getpid(), _signal.SIGUSR2)
    assert stopper2.should_exit and not stopper2.should_requeue

    calls = []
    import subprocess

    monkeypatch.setattr(subprocess, "check_call", lambda cmd: calls.append(cmd))
    monkeypatch.delenv("SLURM_JOB_ID", raising=False)
    assert requeue_job() is False  # no-op outside SLURM
    monkeypatch.setenv("SLURM_JOB_ID", "1234")
    assert requeue_job() is True
    assert calls == [["scontrol", "requeue", "1234"]]
