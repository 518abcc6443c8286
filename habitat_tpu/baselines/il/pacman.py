"""PACMAN EQA navigation IL — hierarchical Planner/Controller behavior
cloning (reference habitat-baselines/habitat_baselines/il/trainers/
pacman_trainer.py, 674 LoC + il/models/models.py NavPlannerControllerModel:373
and MaskedNLLCriterion:362).

The PACMAN decomposition (Das et al.): a PLANNER GRU picks a macro action
from [image feature, question embedding, previous action]; a CONTROLLER MLP
then decides, at every subsequent frame, whether to KEEP executing that
action (1) or return control to the planner (0). Training is behavior
cloning on expert (shortest-path) trajectories with masked NLL on both heads.

TPU re-architecture: the torch version packs variable-length episodes and
runs cuDNN GRUs; here expert trajectories come from the batched envs' greedy
geodesic follower (all envs at once, device-side), supervision masks are
computed from action-run-lengths, and the planner scan + controller MLP
train as one jitted update over (B, T) tensors — no DataLoader processes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from habitat_tpu.core.registry import registry


class QuestionEncoder(nn.Module):
    """LSTM question encoder (reference QuestionLstmEncoder, models.py:252)."""

    vocab_size: int = 256
    wordvec_dim: int = 64
    hidden: int = 64

    @nn.compact
    def __call__(self, tokens):  # (B, L) int32
        emb = nn.Embed(self.vocab_size, self.wordvec_dim)(tokens)
        ys = nn.RNN(nn.OptimizedLSTMCell(self.hidden))(emb)  # (B, L, H)
        return ys[:, -1]  # (B, hidden) final state


class PacmanModel(nn.Module):
    """NavPlannerControllerModel (reference models.py:373) in flax."""

    num_actions: int = 4
    image_feat_dim: int = 128
    action_embed_dim: int = 32
    planner_hidden: int = 1024
    question_hidden: int = 64
    vocab_size: int = 256
    controller_fc: int = 256

    @nn.compact
    def __call__(
        self,
        questions,  # (B, L) int32
        img_feats,  # (B, T, F) CNN features per frame
        actions_in,  # (B, T) previous-action ids (planner input)
        mask,  # (B, T) valid-step mask
    ):
        """Returns (planner_logits (B,T,A), controller_logits (B,T,2))."""
        B, T, _ = img_feats.shape
        img = nn.relu(nn.Dense(self.image_feat_dim, name="cnn_fc")(img_feats))
        q = QuestionEncoder(
            vocab_size=self.vocab_size, hidden=self.question_hidden, name="q_rnn"
        )(questions)
        q = nn.relu(nn.Dense(self.question_hidden, name="ques_tr")(q))
        a_emb = nn.Embed(
            self.num_actions + 1, self.action_embed_dim, name="action_embed"
        )(actions_in.astype(jnp.int32) + 1)

        # planner GRU over time (reference NavRnn, models.py:437)
        x = jnp.concatenate(
            [img, jnp.broadcast_to(q[:, None], (B, T, q.shape[-1])), a_emb], axis=-1
        )
        hs = nn.RNN(nn.GRUCell(self.planner_hidden), name="planner_gru")(x)
        # (B, T, H) planner hidden states
        planner_logits = nn.Dense(self.num_actions, name="planner_head")(hs)

        # controller: [img, action_embed, planner_hidden] -> continue? (0/1)
        # (reference controller_step, models.py:526)
        c_in = jnp.concatenate([img, a_emb, hs], axis=-1)
        c = nn.relu(nn.Dense(self.controller_fc, name="controller_fc0")(c_in))
        controller_logits = nn.Dense(2, name="controller_head")(c)
        return planner_logits, controller_logits


def masked_nll(logits, targets, mask):
    """MaskedNLLCriterion (reference models.py:362)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), -1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def build_pacman_supervision(actions, valid, max_controller_actions: int = 5):
    """Expert action sequence -> planner/controller targets (reference
    pacman_trainer._process_per_question / the dataset's flat_to_hierarchical
    logic): within a run of the SAME action, the first step is a PLANNER
    decision and up to ``max_controller_actions``-1 following steps are
    CONTROLLER continue=1 steps; the step after a run ends is controller
    continue=0 followed by the next planner decision.

    Returns (planner_mask, controller_targets, controller_mask), all (B, T).
    """
    a = np.asarray(actions)
    v = np.asarray(valid).astype(bool)
    B, T = a.shape
    pm = np.zeros((B, T), np.float32)
    ct = np.zeros((B, T), np.int32)
    cm = np.zeros((B, T), np.float32)
    for b in range(B):
        run = 0
        for t in range(T):
            if not v[b, t]:
                break
            new_run = t == 0 or a[b, t] != a[b, t - 1] or run >= max_controller_actions
            if new_run:
                pm[b, t] = 1.0  # planner decides here
                if t > 0:
                    ct[b, t] = 0  # controller returned control
                    cm[b, t] = 1.0
                run = 1
            else:
                ct[b, t] = 1  # controller keeps executing
                cm[b, t] = 1.0
                run += 1
    return pm, ct, cm


class PacmanState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array


@registry.register_trainer(name="pacman")
class PacmanTrainer:
    """Behavior-clone the planner/controller on expert EQA trajectories
    (reference il/trainers/pacman_trainer.py). Expert data comes from the
    batched env's greedy geodesic follower toward the question target."""

    def __init__(
        self,
        env,
        num_actions: int = 3,
        feat_dim: int = 64,
        lr: float = 1e-3,
        max_T: int = 48,
        max_controller_actions: int = 5,
    ):
        self.env = env
        self.max_T = max_T
        self.mca = max_controller_actions
        self.model = PacmanModel(
            num_actions=num_actions,
            image_feat_dim=128,
            planner_hidden=256,  # scaled for the procedural benchmark
        )
        self.feat_dim = feat_dim
        self.optimizer = optax.adam(lr)

    # -- expert data ------------------------------------------------------
    def _teacher(self, env_state) -> jnp.ndarray:
        """Batched greedy geodesic follower (same oracle as BCLearner)."""
        import functools

        from habitat_tpu.ops.navgrid import greedy_follower_step

        env = self.env
        fields = env.table.dist_field[env_state.ep_idx].astype(jnp.float32)
        sid = env.table.scene_idx[env_state.ep_idx]
        f = functools.partial(
            greedy_follower_step,
            goal_radius=0.5,
            forward_step=0.25,
            turn_angle=float(np.deg2rad(10.0)),
        )
        return jax.vmap(lambda s_, fl, p, y: f(env.pack, s_, fl, p, y))(
            sid, fields, env_state.pos, env_state.yaw
        )

    def collect_expert(self, seed: int = 0):
        """Roll the greedy follower in the batched env; return (questions,
        feats, actions, valid) padded to max_T. Expert action ids are the
        follower's (0=stop 1=fwd 2=left 3=right) shifted to the env's nav
        action ids (no stop in the EQA nav set)."""
        env = self.env
        n = env.num_envs
        state, obs = env.reset_fn(jax.random.PRNGKey(seed))
        qs = np.asarray(obs["question"])  # (N, L)
        feats = np.zeros((n, self.max_T, self.feat_dim), np.float32)
        acts = np.zeros((n, self.max_T), np.int32)
        valid = np.zeros((n, self.max_T), np.float32)
        alive = np.ones((n,), bool)
        teacher = jax.jit(self._teacher)
        for t in range(self.max_T):
            a = np.asarray(teacher(state))
            a_env = np.maximum(a - 1, 0)  # follower 1/2/3 -> env fwd/left/right
            # cheap per-frame feature (pointgoal polar + trig), standing in
            # for CNN features on the procedural benchmark
            pg = np.asarray(obs["pointgoal_with_gps_compass"])
            f = np.zeros((n, self.feat_dim), np.float32)
            f[:, 0:2] = pg
            f[:, 2] = np.cos(pg[:, 1])
            f[:, 3] = np.sin(pg[:, 1])
            feats[:, t] = f
            acts[:, t] = a_env
            valid[:, t] = alive.astype(np.float32)
            state, obs, r, d, info = env.step_fn(state, jnp.asarray(a_env))
            alive = alive & ~np.asarray(d)
            if not alive.any():
                break
        return qs, feats, acts, valid

    # -- training ---------------------------------------------------------
    def init_fn(self, key, batch) -> PacmanState:
        qs, feats, acts, valid = batch
        a_in = np.concatenate([np.full((acts.shape[0], 1), -1), acts[:, :-1]], axis=1)
        params = self.model.init(
            key, jnp.asarray(qs), jnp.asarray(feats), jnp.asarray(a_in),
            jnp.asarray(valid),
        )
        return PacmanState(params, self.optimizer.init(params), key)

    def prepare_batch(self, batch):
        """Host-side: supervision masks + shifted action inputs (the torch
        version does this in its DataLoader workers)."""
        qs, feats, acts, valid = batch
        pm, ct, cm = build_pacman_supervision(acts, valid, self.mca)
        a_in = np.concatenate([np.full((acts.shape[0], 1), -1), acts[:, :-1]], axis=1)
        return tuple(
            jnp.asarray(x) for x in (qs, feats, acts, valid, pm, ct, cm, a_in)
        )

    def train_step(self, ts: PacmanState, prepared) -> Tuple[PacmanState, Dict]:
        qs, feats, acts, valid, pm, ct, cm, a_in = prepared

        def loss_fn(params):
            pl, cl = self.model.apply(params, qs, feats, a_in, valid)
            lp = masked_nll(pl, acts, pm * valid)
            lc = masked_nll(cl, ct, cm * valid)
            return lp + lc, {"planner_nll": lp, "controller_nll": lc}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, opt_state = self.optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        aux["loss"] = loss
        return PacmanState(params, opt_state, ts.key), aux

    def train(self, num_epochs: int = 20, seed: int = 0) -> Dict[str, float]:
        batch = self.collect_expert(seed)
        prepared = self.prepare_batch(batch)
        ts = self.init_fn(jax.random.PRNGKey(seed), batch)
        step = jax.jit(self.train_step)
        hist = {}
        for e in range(num_epochs):
            ts, m = step(ts, prepared)
            hist = {k: float(v) for k, v in m.items()}
        self.state = ts
        return hist
