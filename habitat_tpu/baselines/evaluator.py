"""Checkpoint evaluation with exactly-once episode accounting.

Counterpart of HabitatEvaluator.evaluate_agent (reference
rl/ppo/habitat_evaluator.py:39) + pause_envs (rl/ppo/evaluator.py:57): the
reference pauses finished worker processes so each eval episode is counted
once; here all envs run batched and "pausing" is an accounting mask — each env
has an episode quota (its share of the eval set) and contributions beyond the
quota are ignored.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from habitat_tpu.core.batched_env import BatchedEnv
from habitat_tpu.core.logging import logger
from habitat_tpu.models.policy import ActorCritic, sample_action
from habitat_tpu.models.rnn_state_encoder import initial_hidden_state


def evaluate_agent(
    env: BatchedEnv,
    policy: ActorCritic,
    params: Any,
    *,
    episodes_per_env: Optional[int] = None,
    evals_per_ep: int = 1,
    deterministic: bool = False,
    seed: int = 0,
    max_steps: Optional[int] = None,
    measure_keys: Tuple[str, ...] = ("success", "spl", "soft_spl", "distance_to_goal", "num_steps"),
    video_option: Tuple[str, ...] = (),
    video_dir: Optional[str] = None,
    video_env: int = 0,
    tb_writer=None,
    checkpoint_idx: int = 0,
    map_tracker=None,  # optional TopDownMapTracker for the video env
) -> Dict[str, float]:
    """Run evaluation; returns aggregated metrics (reference aggregates the
    per-episode stats dict the same way, habitat_evaluator.py:39+)."""
    n = env.num_envs
    if episodes_per_env is None:
        episodes_per_env = max(1, env.table.num_episodes // n)
    # evals_per_ep (reference habitat_evaluator.py evals_per_ep): each env
    # cycles its episode list deterministically, so k passes over the quota
    # evaluate every episode exactly k times
    quota = np.full((n,), episodes_per_env * max(1, evals_per_ep), np.int64)

    net = policy.net
    hidden = initial_hidden_state(
        n, net.hidden_size, net.num_recurrent_layers, net.rnn_type
    )
    # gaussian (continuous rearrange control) vs categorical policies
    # (reference HabitatEvaluator handles both action distributions)
    continuous = not getattr(net, "discrete_actions", True)
    if continuous:
        from habitat_tpu.models.policy import sample_gaussian_action

        prev_action = jnp.zeros((n, int(policy.num_outputs)), jnp.float32)

        @jax.jit
        def act_step(params, obs, hidden, prev_action, not_done, key):
            (mu, log_std), _, new_hidden = policy.apply(
                params, obs, hidden, prev_action, not_done
            )
            action, _ = sample_gaussian_action(
                mu, log_std, key, deterministic=deterministic
            )
            return action, new_hidden

    else:
        prev_action = jnp.zeros((n,), jnp.int32)

        @jax.jit
        def act_step(params, obs, hidden, prev_action, not_done, key):
            logits, _, new_hidden = policy.apply(
                params, obs, hidden, prev_action, not_done
            )
            action, _ = sample_action(logits, key, deterministic=deterministic)
            return action, new_hidden

    not_done = jnp.zeros((n,), jnp.float32)

    state, obs = env.reset(seed=seed)
    key = jax.random.PRNGKey(seed)
    counted = np.zeros((n,), np.int64)
    sums: Dict[str, float] = defaultdict(float)
    reward_acc = np.zeros((n,), np.float64)
    total_eps = 0

    if max_steps is None:
        max_steps = env.max_episode_steps * (episodes_per_env + 1) * 2

    frames: list = []
    record = bool(video_option)

    for t in range(max_steps):
        key, k = jax.random.split(key)
        action, hidden = act_step(params, obs, hidden, prev_action, not_done, k)
        state, obs, reward, done, info = env.step(state, action)
        if record and counted[video_env] < quota[video_env]:
            from habitat_tpu.utils.visualizations.utils import observations_to_image

            frame_obs = {
                k: np.asarray(v[video_env])
                for k, v in obs.items()
                if k in ("rgb", "depth", "semantic")
            }
            frame_info = {}
            if map_tracker is not None:
                # TopDownMap in eval videos (reference TopDownMap measure,
                # tasks/nav/nav.py:678-937, is eval/video-only there too)
                map_tracker.update(
                    np.asarray(state.pos[video_env]),
                    float(np.asarray(state.yaw[video_env])),
                )
                frame_info["top_down_map"] = map_tracker.frame()
            if frame_obs:
                frames.append(observations_to_image(frame_obs, frame_info))
            if map_tracker is not None and bool(np.asarray(done)[video_env]):
                map_tracker.reset()
        prev_action = action
        not_done = 1.0 - np.asarray(done).astype(np.float32)
        not_done = jnp.asarray(not_done)
        reward_acc += np.asarray(reward)
        d = np.asarray(done)
        if d.any():
            active = counted < quota
            take = d & active
            for kname in measure_keys:
                if kname in info:
                    sums[kname] += float(np.asarray(info[kname])[take].sum())
            sums["reward"] += float(reward_acc[take].sum())
            total_eps += int(take.sum())
            counted += take.astype(np.int64)
            reward_acc[d] = 0.0
        if np.all(counted >= quota):
            break

    if total_eps == 0:
        logger.warning("evaluation finished no episodes")
        return {}
    out = {k: v / total_eps for k, v in sums.items()}
    out["num_episodes"] = float(total_eps)
    if record and frames:
        from habitat_tpu.utils.common import generate_video

        generate_video(
            list(video_option),
            video_dir,
            frames,
            episode_id=f"env{video_env}",
            checkpoint_idx=checkpoint_idx,
            metrics={k: out.get(k, 0.0) for k in ("success", "spl")},
            tb_writer=tb_writer,
        )
    return out


def poll_checkpoint_folder(folder: str, prev_ckpt_ind: int) -> Optional[str]:
    """Next un-evaluated numbered checkpoint, or None (reference
    poll_checkpoint_folder used by BaseTrainer.eval,
    common/base_trainer.py:136-150)."""
    import os
    import re

    if not os.path.isdir(folder):
        return None
    found = []
    for f in os.listdir(folder):
        m = re.match(r"ckpt\.(\d+)$", f)
        if m:
            found.append((int(m.group(1)), f))
    found.sort()
    for idx, f in found:
        if idx > prev_ckpt_ind:
            return os.path.join(folder, f)
    return None


def eval_checkpoint_loop(
    trainer,
    config,
    *,
    poll_interval_s: float = 2.0,
    timeout_s: float = 600.0,
) -> Dict[int, Dict[str, float]]:
    """Checkpoint-folder polling eval (reference BaseTrainer.eval loop,
    common/base_trainer.py:108-167): evaluates every numbered ckpt.N as it
    appears; progress persists to ``.eval_resume_state`` in the checkpoint
    folder so a preempted eval job resumes at the next un-evaluated
    checkpoint (reference :77-88, 152-163)."""
    import json as _json
    import os
    import time as _time

    folder = os.path.abspath(trainer.run_cfg.checkpoint_folder)
    resume_path = os.path.join(folder, ".eval_resume_state")
    prev = -1
    if os.path.exists(resume_path):
        with open(resume_path) as f:
            prev = int(_json.load(f).get("prev_ckpt_ind", -1))
        logger.info(f"eval resumed after checkpoint {prev}")

    results: Dict[int, Dict[str, float]] = {}
    ts = trainer._init(jax.random.PRNGKey(0), trainer._env_data)
    deadline = _time.time() + timeout_s
    while _time.time() < deadline:
        nxt = poll_checkpoint_folder(folder, prev)
        if nxt is None:
            if trainer.is_done():
                break
            _time.sleep(poll_interval_s)
            continue
        idx = int(nxt.rsplit(".", 1)[1])
        ts = trainer.load_checkpoint(os.path.basename(nxt), ts)
        metrics = evaluate_agent(
            trainer.env,
            trainer.policy,
            ts.params,
            evals_per_ep=int(
                config.get_path("habitat_baselines.eval.evals_per_ep", 1)
            ),
            checkpoint_idx=idx,
            seed=int(config.habitat.get("seed", 100)),
        )
        results[idx] = metrics
        logger.info(
            f"eval ckpt.{idx}: "
            + " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
        )
        prev = idx
        with open(resume_path, "w") as f:
            _json.dump({"prev_ckpt_ind": prev}, f)
    return results


def evaluate_from_config(config, trainer) -> Dict[str, float]:
    """Eval entry (reference BaseTrainer.eval, common/base_trainer.py:66):
    loads latest checkpoint if present, evaluates, logs."""
    import os

    env = trainer.env
    policy = trainer.policy
    ts = trainer._init(jax.random.PRNGKey(0), trainer._env_data)
    latest = os.path.join(
        os.path.abspath(trainer.run_cfg.checkpoint_folder), "latest"
    )
    if os.path.exists(latest) and config.get_path(
        "habitat_baselines.eval.should_load_ckpt", True
    ):
        ts = trainer.load_checkpoint("latest", ts)
    count = int(config.get_path("habitat_baselines.test_episode_count", -1))
    per_env = None if count <= 0 else max(1, count // env.num_envs)
    metrics = evaluate_agent(
        env,
        policy,
        ts.params,
        episodes_per_env=per_env,
        evals_per_ep=int(config.get_path("habitat_baselines.eval.evals_per_ep", 1)),
        deterministic=False,
        seed=int(config.habitat.get("seed", 100)),
    )
    logger.info("eval: " + " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items())))
    return metrics
