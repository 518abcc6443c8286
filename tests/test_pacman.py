"""PACMAN EQA nav IL (reference il/trainers/pacman_trainer.py +
il/models/models.py NavPlannerControllerModel:373)."""

import numpy as np
import jax

from habitat_tpu.baselines.il.pacman import (
    PacmanTrainer,
    build_pacman_supervision,
)
from habitat_tpu.core.registry import registry
from habitat_tpu.tasks.eqa import make_eqa_env


def test_supervision_segmentation():
    # runs: [1,1,1][2,2][0,0,0] -> planner decides at run starts, controller
    # continues inside runs and returns control at run ends
    a = np.array([[1, 1, 1, 2, 2, 0, 0, 0, 0, 0]])
    v = np.ones((1, 10), np.float32)
    v[0, 8:] = 0
    pm, ct, cm = build_pacman_supervision(a, v, max_controller_actions=5)
    assert pm[0].astype(int).tolist()[:6] == [1, 0, 0, 1, 0, 1]
    assert ct[0, 1] == 1 and ct[0, 2] == 1  # continue inside run
    assert ct[0, 3] == 0 and ct[0, 5] == 0  # return control at run ends
    assert cm[0, 0] == 0  # first step has no controller decision


def test_supervision_max_controller_actions():
    a = np.array([[1] * 8])
    v = np.ones((1, 8), np.float32)
    pm, ct, cm = build_pacman_supervision(a, v, max_controller_actions=3)
    # forced planner re-decision every 3 steps
    assert pm[0].astype(int).tolist() == [1, 0, 0, 1, 0, 0, 1, 0]


def test_pacman_registered():
    assert registry.get_trainer("pacman") is PacmanTrainer


def test_pacman_bc_loss_decreases():
    env = make_eqa_env(
        num_envs=8, num_scenes=1, episodes_per_scene=4, seed=0,
        max_episode_steps=40,
    )
    tr = PacmanTrainer(env, max_T=24)
    batch = tr.collect_expert(0)
    prepared = tr.prepare_batch(batch)
    ts = tr.init_fn(jax.random.PRNGKey(0), batch)
    step = jax.jit(tr.train_step)
    losses = []
    for _ in range(12):
        ts, m = step(ts, prepared)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.85, losses
