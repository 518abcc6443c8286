"""EQA imitation-learning trainers: CNN pretraining + VQA.

Counterparts of the reference's EQA IL pipeline (habitat-baselines/
habitat_baselines/il/trainers/eqa_cnn_pretrain_trainer.py — autoencoder
pretraining of the shared EQA visual encoder on rgb/depth/semantic
reconstruction; il/trainers/vqa_trainer.py — question+frames -> answer
classification using the pretrained encoder; models in il/models/models.py:
MultitaskCNN, VqaLstmCnnAttentionModel). The reference trains from disk
datasets of pre-rendered frames; here frames come straight off the batched
TPU renderer (the EQA env renders rgb/depth/semantic for all N envs in one
pass), and each train step is one fused jit program.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from habitat_tpu.core.registry import registry


class MultitaskCNN(nn.Module):
    """Encoder + three reconstruction decoders (reference models.py:
    MultitaskCNN — conv encoder, deconv heads for rgb/depth/seg)."""

    num_classes: int = 41
    only_encoder: bool = False

    @nn.compact
    def __call__(self, rgb):  # (N, H, W, 3) float in [0,1]
        x = rgb.astype(jnp.bfloat16)
        skips = []
        for i, ch in enumerate((8, 16, 32, 32)):
            x = nn.Conv(ch, (5, 5), strides=(2, 2), name=f"enc{i}")(x)
            x = nn.relu(nn.GroupNorm(num_groups=4, name=f"enc_gn{i}")(x))
            skips.append(x)
        feat = x  # (N, H/16, W/16, 32) — the shared embedding
        if self.only_encoder:
            return feat.astype(jnp.float32).reshape(rgb.shape[0], -1)

        def decoder(name, out_ch):
            y = feat
            for i, ch in enumerate((32, 16, 8)):
                n, h, w, c = y.shape
                y = jax.image.resize(y, (n, h * 2, w * 2, c), "nearest")
                y = nn.Conv(ch, (5, 5), name=f"{name}_dec{i}")(y)
                y = nn.relu(nn.GroupNorm(num_groups=4, name=f"{name}_gn{i}")(y))
            n, h, w, c = y.shape
            y = jax.image.resize(y, (n, h * 2, w * 2, c), "nearest")
            return nn.Conv(out_ch, (5, 5), name=f"{name}_out")(y).astype(jnp.float32)

        rgb_out = nn.sigmoid(decoder("rgb", 3))
        depth_out = nn.sigmoid(decoder("depth", 1))
        seg_out = decoder("seg", self.num_classes)  # logits
        return rgb_out, depth_out, seg_out


class EQACNNPretrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    env_state: object
    key: jax.Array
    update_idx: jnp.ndarray


@registry.register_trainer(name="eqa-cnn-pretrain")
class EQACNNPretrainLearner:
    """Autoencoder pretraining on frames rendered by the batched env
    (reference eqa_cnn_pretrain_trainer.py:49 train(): pixel losses on
    rgb/depth/seg; seg loss is CE, others MSE)."""

    def __init__(self, env, num_classes: int = 41, lr: float = 1e-3):
        self.env = env
        self.model = MultitaskCNN(num_classes=num_classes)
        self.optim = optax.adam(lr)
        self.num_classes = num_classes

    def _frames(self, env_state):
        obs = self.env._observations(env_state)
        rgb = obs["rgb"].astype(jnp.float32) / 255.0
        depth = obs["depth"].astype(jnp.float32)
        sem = obs["semantic"][..., 0].astype(jnp.int32) % self.num_classes
        return rgb, depth, sem

    def init_fn(self, key) -> EQACNNPretrainState:
        k_env, k_net, k = jax.random.split(key, 3)
        env_state, _ = self.env.reset_fn(k_env, self.env.env_data)
        rgb, _, _ = self._frames(env_state)
        params = self.model.init(k_net, rgb)
        return EQACNNPretrainState(
            params, self.optim.init(params), env_state, k, jnp.zeros((), jnp.int32)
        )

    def train_step(self, ts: EQACNNPretrainState) -> Tuple[EQACNNPretrainState, Dict]:
        key, k_act, k_reset = jax.random.split(ts.key, 3)
        # random-walk the envs for frame diversity (teacher-free pretraining)
        acts = jax.random.randint(k_act, (self.env.num_envs,), 1, 4)
        env_state, *_ = self.env.step_fn(ts.env_state, acts, self.env.env_data)
        rgb, depth, sem = self._frames(env_state)

        def loss_fn(params):
            rgb_hat, depth_hat, seg_logits = self.model.apply(params, rgb)
            l_rgb = jnp.square(rgb_hat - rgb).mean()
            l_depth = jnp.square(depth_hat - depth).mean()
            l_seg = optax.softmax_cross_entropy_with_integer_labels(
                seg_logits.reshape(-1, self.num_classes), sem.reshape(-1)
            ).mean()
            return l_rgb + l_depth + l_seg, (l_rgb, l_depth, l_seg)

        (loss, (l_rgb, l_depth, l_seg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params)
        updates, opt_state = self.optim.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        metrics = {
            "losses/total": loss,
            "losses/rgb": l_rgb,
            "losses/depth": l_depth,
            "losses/seg": l_seg,
        }
        return (
            EQACNNPretrainState(
                params, opt_state, env_state, key, ts.update_idx + 1
            ),
            metrics,
        )


class VqaModel(nn.Module):
    """Question LSTM + frame-feature attention -> answer logits (reference
    models.py::VqaLstmCnnAttentionModel — CNN features of the last frames,
    question-conditioned attention pool, classifier)."""

    vocab_size: int
    num_answers: int
    q_hidden: int = 64
    num_classes: int = 41

    @nn.compact
    def __call__(self, frames, questions):
        # frames: (N, K, H, W, 3) in [0,1]; questions: (N, L) int tokens
        n, k = frames.shape[:2]
        enc = MultitaskCNN(num_classes=self.num_classes, only_encoder=True)
        feat = enc(frames.reshape((n * k,) + frames.shape[2:]))
        feat = feat.reshape(n, k, -1)
        feat = nn.tanh(nn.Dense(self.q_hidden, name="frame_proj")(feat))  # (N,K,H)

        emb = nn.Embed(self.vocab_size, self.q_hidden, name="q_embed")(questions)
        lstm = nn.OptimizedLSTMCell(self.q_hidden, name="q_lstm")
        carry = lstm.initialize_carry(jax.random.PRNGKey(0), emb[:, 0].shape)
        mask = (questions > 0).astype(jnp.float32)[..., None]
        # static unroll over the (short, padded) question; padding tokens
        # keep the previous carry
        for step_t in range(questions.shape[1]):
            new_carry, _ = lstm(carry, emb[:, step_t])
            m = mask[:, step_t]
            carry = jax.tree_util.tree_map(
                lambda a, b, m=m: b * m + a * (1 - m), carry, new_carry
            )
        q_vec = carry[1]  # (N, H)

        att = jnp.einsum("nkh,nh->nk", feat, q_vec) / jnp.sqrt(self.q_hidden)
        att = jax.nn.softmax(att, axis=-1)
        v_vec = jnp.einsum("nk,nkh->nh", att, feat)
        x = jnp.concatenate([q_vec, v_vec, q_vec * v_vec], axis=-1)
        x = nn.relu(nn.Dense(128, name="fc1")(x))
        return nn.Dense(self.num_answers, name="answer_head")(x)


class VQAState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    key: jax.Array
    update_idx: jnp.ndarray


@registry.register_trainer(name="vqa")
class VQALearner:
    """Supervised VQA on goal-view frames (reference vqa_trainer.py:41:
    the dataset pairs the question with frames at the end of the shortest
    path; here the batched renderer produces the goal views directly)."""

    def __init__(self, env, vocab_size: int = 256, num_answers: int = 32, lr: float = 3e-4, num_frames: int = 2):
        self.env = env
        self.model = VqaModel(vocab_size, num_answers)
        self.optim = optax.adam(lr)
        self.num_frames = num_frames

    def _batch(self, env_state):
        """(frames, questions, answers) for the current episodes: the frame
        set is the agent view plus the stored goal image."""
        obs = self.env._observations(env_state)
        cur = obs["rgb"].astype(jnp.float32) / 255.0
        tbl = self.env.table
        goal_img = tbl.goal_image[env_state.ep_idx].astype(jnp.float32) / 255.0
        if goal_img.shape[1:3] != cur.shape[1:3]:
            goal_img = jax.image.resize(
                goal_img, (cur.shape[0],) + cur.shape[1:3] + (3,), "bilinear"
            )
        frames = jnp.stack([cur, goal_img], axis=1)
        questions = tbl.extras["question_tokens"][env_state.ep_idx]
        answers = tbl.extras["answer_token"][env_state.ep_idx]
        return frames, questions, answers

    def init_fn(self, key) -> VQAState:
        k_env, k_net, k = jax.random.split(key, 3)
        env_state, _ = self.env.reset_fn(k_env, self.env.env_data)
        frames, questions, _ = self._batch(env_state)
        params = self.model.init(k_net, frames, questions)
        return VQAState(params, self.optim.init(params), k, jnp.zeros((), jnp.int32))

    def train_step(self, ts: VQAState, env_state) -> Tuple[VQAState, Dict]:
        frames, questions, answers = self._batch(env_state)

        def loss_fn(params):
            logits = self.model.apply(params, frames, questions)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, answers
            ).mean()
            acc = (logits.argmax(-1) == answers).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, opt_state = self.optim.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return (
            VQAState(params, opt_state, ts.key, ts.update_idx + 1),
            {"losses/vqa": loss, "metrics/answer_accuracy": acc},
        )
