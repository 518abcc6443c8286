"""EQA IL trainers: CNN-pretrain autoencoder + VQA."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from habitat_tpu.baselines.il.eqa_trainers import (
    EQACNNPretrainLearner,
    MultitaskCNN,
    VQALearner,
    VqaModel,
)
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.core.registry import registry
from habitat_tpu.datasets.pointnav import make_procedural_pointnav


def _make_visual_env(num_envs=4, size=32):
    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=2, episodes_per_scene=4, seed=0, extent=6.0
    )
    return make_nav_env(
        scenes,
        episodes,
        num_envs=num_envs,
        precomputed_fields=fields,
        max_episode_steps=50,
        sensor_specs=(
            ("HabitatSimRGBSensor", {"height": size, "width": size}),
            ("HabitatSimDepthSensor", {"height": size, "width": size}),
            ("HabitatSimSemanticSensor", {"height": size, "width": size}),
            ("PointGoalWithGPSCompassSensor", None),
        ),
    )


def test_multitask_cnn_shapes():
    m = MultitaskCNN(num_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    rgb, depth, seg = m.apply(params, x)
    assert rgb.shape == (2, 32, 32, 3)
    assert depth.shape == (2, 32, 32, 1)
    assert seg.shape == (2, 32, 32, 10)
    enc = MultitaskCNN(num_classes=10, only_encoder=True)
    feat = enc.apply(params, x)
    assert feat.shape[0] == 2 and feat.ndim == 2


def test_eqa_cnn_pretrain_learns():
    env = _make_visual_env()
    learner = EQACNNPretrainLearner(env, num_classes=16)
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step)
    ts, m0 = step(ts)
    for _ in range(10):
        ts, m = step(ts)
    assert np.isfinite(float(m["losses/total"]))
    assert float(m["losses/total"]) < float(m0["losses/total"])
    assert int(ts.update_idx) == 11
    assert registry.get_trainer("eqa-cnn-pretrain") is EQACNNPretrainLearner


def test_vqa_learner():
    env = _make_visual_env()
    E = int(env.table.scene_idx.shape[0])
    rng = np.random.default_rng(0)
    table = dataclasses.replace(
        env.table,
        goal_image=jnp.asarray(
            rng.integers(0, 255, (E, 32, 32, 3), dtype=np.uint8)
        ),
        extras={
            **env.table.extras,
            "question_tokens": jnp.asarray(
                rng.integers(1, 50, (E, 6), dtype=np.int64).astype(np.int32)
            ),
            "answer_token": jnp.asarray(
                rng.integers(0, 8, (E,), dtype=np.int64).astype(np.int32)
            ),
        },
    )
    env.table = table
    learner = VQALearner(env, vocab_size=64, num_answers=8)
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    env_state, _ = jax.jit(env.reset_fn)(jax.random.PRNGKey(1), env.env_data)
    step = jax.jit(learner.train_step)
    ts, m0 = step(ts, env_state)
    for _ in range(15):
        ts, m = step(ts, env_state)
    assert np.isfinite(float(m["losses/vqa"]))
    # memorizes a fixed batch quickly
    assert float(m["losses/vqa"]) < float(m0["losses/vqa"])
    assert registry.get_trainer("vqa") is VQALearner


def test_vqa_model_shapes():
    model = VqaModel(vocab_size=32, num_answers=5)
    frames = jnp.zeros((3, 2, 32, 32, 3))
    questions = jnp.ones((3, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames, questions)
    logits = model.apply(params, frames, questions)
    assert logits.shape == (3, 5)
