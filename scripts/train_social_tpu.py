"""TPU training: social-nav — (a) single-agent seek-success to a majority
outcome (round-1 was 4.8%), (b) TWO learned agents (robot + humanoid) trained
jointly with the cooperative reward (VERDICT item #5)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

from habitat_tpu.baselines.multi_agent import TwoAgentPPOLearner
from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
from habitat_tpu.models.policy import make_pointnav_resnet_policy
from habitat_tpu.tasks.rearrange.social_nav import make_social_nav_env

mode = sys.argv[1] if len(sys.argv) > 1 else "single"


def window_metric(m, key="m_success"):
    dc = float(m.get("done_count", 0.0))
    return float(m.get(key, np.nan)) / max(dc, 1.0), dc


if mode == "single":
    env = make_social_nav_env(
        num_envs=128, num_scenes=8, episodes_per_scene=16, seed=0
    )
    policy = make_pointnav_resnet_policy(
        env.action_space.n, has_visual=False, hidden_size=128, goal_keys=(),
        backbone="resnet9",
    )
    learner = PPOLearner(
        env, policy,
        PPOConfig(num_steps=64, num_mini_batch=2, ppo_epoch=2, lr=2.5e-4),
        measure_keys=("nav_seek_success", "did_agents_collide", "found_human_rate"),
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    t0 = time.time()
    last = {}
    for u in range(4001):
        ts, m = step(ts)
        if u % 100 == 0:
            _ = float(m["losses/learner_loss"])
            seek, dc = window_metric(m, "m_nav_seek_success")
            rew = float(m.get("reward_sum", np.nan)) / max(dc, 1.0)
            coll, _ = window_metric(m, "m_did_agents_collide")
            found, _ = window_metric(m, "m_found_human_rate")
            last = dict(upd=u, seek=round(seek, 3), rew=round(rew, 2),
                        collide=round(coll, 3), found=round(found, 3))
            print(f"{last} ({time.time()-t0:.0f}s)", flush=True)
        if time.time() - t0 > 1200:
            break
    print("SOCIAL-SINGLE RESULT:", json.dumps(last), flush=True)
elif mode == "vision":
    # VISION-BASED seek: the robot sees the humanoid only through its own
    # camera (dynamic-pass render of the humanoid body) — the reference's
    # social-nav observation model. The net consumes robot_head_rgb/depth +
    # gps/compass; the humanoid_detector oracle sensor is NOT in the net's
    # input set (models/policy.py state_fc keys).
    env = make_social_nav_env(
        num_envs=128, num_scenes=8, episodes_per_scene=16, seed=0,
        with_visual=True, render_size=(64, 64),
    )
    policy = make_pointnav_resnet_policy(
        env.action_space.n, has_visual=True, hidden_size=128, goal_keys=(),
        backbone="resnet9",
    )
    learner = PPOLearner(
        env, policy,
        PPOConfig(num_steps=32, num_mini_batch=2, ppo_epoch=2, lr=2.5e-4),
        measure_keys=("nav_seek_success", "did_agents_collide", "found_human_rate"),
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    t0 = time.time()
    last = {}
    for u in range(4001):
        ts, m = step(ts)
        if u % 50 == 0:
            _ = float(m["losses/learner_loss"])
            seek, dc = window_metric(m, "m_nav_seek_success")
            rew = float(m.get("reward_sum", np.nan)) / max(dc, 1.0)
            found, _ = window_metric(m, "m_found_human_rate")
            last = dict(upd=u, seek=round(seek, 3), rew=round(rew, 2),
                        found=round(found, 3))
            print(f"{last} ({time.time()-t0:.0f}s)", flush=True)
        if time.time() - t0 > 1500:
            break
    print("SOCIAL-VISION RESULT:", json.dumps(last), flush=True)
else:
    env = make_social_nav_env(
        num_envs=128, num_scenes=8, episodes_per_scene=16, seed=0, two_agent=True
    )
    pols = [
        make_pointnav_resnet_policy(
            env.action_space.n, has_visual=False, hidden_size=128,
            goal_keys=(), backbone="resnet9",
        )
        for _ in range(2)
    ]
    learner = TwoAgentPPOLearner(
        env, pols, PPOConfig(num_steps=64, num_mini_batch=1, ppo_epoch=2, lr=2.5e-4)
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    t0 = time.time()
    last = {}
    for u in range(4001):
        ts, m = step(ts)
        if u % 100 == 0:
            _ = float(m["reward_step_mean"])
            succ, dc = window_metric(m)
            last = dict(
                upd=u,
                succ=round(succ, 3),
                rew_step=round(float(m["reward_step_mean"]), 4),
                dones=dc,
                l0=round(float(m["losses/agent0_loss"]), 3),
                l1=round(float(m["losses/agent1_loss"]), 3),
            )
            print(f"{last} ({time.time()-t0:.0f}s)", flush=True)
        if time.time() - t0 > 1200:
            break
    print("SOCIAL-TWOAGENT RESULT:", json.dumps(last), flush=True)
