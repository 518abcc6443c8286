"""TPU training: rearrange PICK under ARM DYNAMICS (VERDICT r2 #4 DoD).

Same recipe as train_pick_arm_tpu.py but with arm_dynamics=True: deltas
accumulate on the PD MOTOR target and the 7-DoF arm integrates under
inertia+gravity through the lumped-mass Lagrangian stepper
(articulated_agents/dynamics.py) — the reference trains with Bullet
dynamics by default (ArmRelPosAction, actions.py:167-238). Target: >=90%
pick success to prove the dynamic path LEARNS, not just simulates.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
from habitat_tpu.models.policy import make_gaussian_resnet_policy
from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

env = make_rearrange_env(
    num_envs=128,
    task="pick",
    num_scenes=8,
    episodes_per_scene=16,
    seed=0,
    with_visual=False,
    n_rooms_per_axis=1,
    n_clutter=0,
    max_episode_steps=120,
    control="arm",
    arm_dynamics=True,
)
print("action space:", env.action_space, "grasp_dist:", env.grasp_distance, flush=True)

act_dim = int(np.prod(env.action_space.shape))
policy = make_gaussian_resnet_policy(
    act_dim, backbone="resnet9", hidden_size=128, has_visual=False, goal_keys=()
)
learner = PPOLearner(
    env,
    policy,
    PPOConfig(num_steps=64, num_mini_batch=2, ppo_epoch=2, lr=2.5e-4),
    action_type="gaussian",
)
ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
step = jax.jit(learner.train_step, donate_argnums=(0,))
t0 = time.time()
budget_updates = 4000
window = []
for u in range(budget_updates + 1):
    ts, m = step(ts)
    if u % 50 == 0:
        _ = float(m["losses/learner_loss"])  # sync
        dc = float(m.get("done_count", jnp.nan))
        succ = float(m.get("m_success", jnp.nan)) / max(dc, 1.0)
        rew = float(m.get("reward_sum", jnp.nan)) / max(dc, 1.0)
        window.append(succ)
        print(
            f"upd {u}: ep_rew {rew:.2f} succ {succ:.3f} dones {dc:.0f} "
            f"entropy {float(m['losses/entropy']):.3f} ({time.time()-t0:.0f}s)",
            flush=True,
        )
        if len(window) >= 4 and min(window[-4:]) >= 0.97:
            print("early stop: success saturated", flush=True)
            break
    if time.time() - t0 > 2200:
        print(f"time budget reached at {u}", flush=True)
        break

final = {
    "updates": u,
    "env_steps": u * 128 * 64,
    "final_success": window[-1] if window else None,
    "wall_s": round(time.time() - t0, 1),
}
print("ARM-PICK RESULT:", json.dumps(final), flush=True)
