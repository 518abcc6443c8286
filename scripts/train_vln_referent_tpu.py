"""Referent-grounding VLN: prove the instruction is LOAD-BEARING.

Round-5 upgrade of VERDICT weak #9 ("VLN language is synthetic; SR 1.00 is
a pipeline proof, not language understanding"): episodes carry TWO
candidate goals exposed symmetrically in the observation; ONLY the
instruction ("go to the red box" / "go to the blue box") says which is
the target (tasks/vln.make_referent_vln). A policy that cannot ground the
color word to the candidate table caps at ~50% success.

Protocol:
1. PPO-train (shaped by distance-to-goal to the TRUE goal) on train
   episodes; policy sees instruction + gps + compass + candidates, NO
   goal sensor. (Online BC was tried first and fails the transfer at
   every scale by construction: the env follows the TEACHER's actions,
   so the student never visits its own mistake states — 0.99 per-step
   match memorizes small episode sets, 0.82 match on 8192 episodes
   compounds to ~0 completed episodes. Distribution shift, not
   grounding.)
2. Greedy eval on HELD-OUT episodes (same scenes, fresh episode
   stream): report success.
3. ABLATION on the same trained params: instruction tokens zeroed at
   eval. Grounding is proven iff eval_success >> 0.5 and
   ablated_success collapses toward chance.

Usage: python scripts/train_vln_referent_tpu.py [updates] [num_envs]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")

UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
NUM_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else 128


def build(num_envs, episode_seed=None):
    from habitat_tpu.tasks.vln import make_vln_env

    # SAME scenes (seed=0) in train and eval; eval episodes come from a
    # held-out episode stream (episode_seed)
    # OPEN arenas (one room, light clutter): the grounding claim is about
    # LANGUAGE, not obstacle navigation (PointNav covers that elsewhere) —
    # small closed procedural scene sets otherwise reward pure episode
    # memorization, measured: BC match 1.000 / train success 0.86 /
    # held-out success 0.0 on 4- and 8-scene apartment sets.
    return make_vln_env(
        num_envs=num_envs,
        num_scenes=64,
        episodes_per_scene=128,
        with_pointgoal=False,
        referent=True,
        max_episode_steps=100,
        seed=0,
        episode_seed=episode_seed,
        scene_kw={"n_rooms_per_axis": 1, "n_clutter": 2},
    )


def make_eval(env, policy, net, ablate_instruction):
    from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

    n = env.num_envs

    def eval_rollout(params, key):
        state, obs = env.reset_fn(key)
        hidden = initial_hidden_state(
            n, net.hidden_size, net.num_recurrent_layers, net.rnn_type
        )
        prev = jnp.zeros((n,), jnp.int32)
        nd = jnp.zeros((n,), jnp.float32)

        def step(carry, _):
            state, obs, hidden, prev, nd, succ, cnt = carry
            if ablate_instruction:
                obs = dict(obs)
                obs["instruction"] = jnp.zeros_like(obs["instruction"])
            logits, _, hidden2 = policy.apply(params, obs, hidden, prev, nd)
            act = jnp.argmax(logits, axis=-1)
            state2, obs2, rew, done, info = env.step_fn(state, act)
            d = done.astype(jnp.float32)
            succ = succ + jnp.sum(info["success"] * d)
            cnt = cnt + jnp.sum(d)
            return (state2, obs2, hidden2, act, 1.0 - d, succ, cnt), None

        (state, obs, hidden, prev, nd, succ, cnt), _ = jax.lax.scan(
            step,
            (state, obs, hidden, prev, nd, jnp.float32(0), jnp.float32(0)),
            None,
            length=220,
        )
        return succ, cnt

    return eval_rollout


def main():
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.models.policy import make_pointnav_resnet_policy

    env = build(NUM_ENVS)
    ev_env = build(64, episode_seed=123)  # held-out episodes, same scenes
    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone="resnet9", hidden_size=192,
        has_visual=False, goal_keys=(),
    )
    learner = PPOLearner(
        env, policy, PPOConfig(num_steps=32, num_mini_batch=2, ppo_epoch=2)
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0), None)
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    t0 = time.time()
    for u in range(UPDATES):
        ts, m = step(ts)
        if (u + 1) % 200 == 0:
            dc = float(m.get("done_count", 1.0))
            print(
                f"upd {u+1} ({time.time()-t0:.0f}s): succ "
                f"{float(m.get('m_success', float('nan')))/max(dc,1):.3f} "
                f"spl {float(m.get('m_spl', float('nan')))/max(dc,1):.3f}",
                flush=True,
            )
    net = policy.net
    ev_tr = jax.jit(make_eval(env, policy, net, False))
    st, ct = ev_tr(ts.params, jax.random.PRNGKey(7))
    print("train-env success:", float(st), "/", float(ct), flush=True)
    ev = jax.jit(make_eval(ev_env, policy, net, False))
    ev_abl = jax.jit(make_eval(ev_env, policy, net, True))
    s, c = ev(ts.params, jax.random.PRNGKey(7))
    sa, ca = ev_abl(ts.params, jax.random.PRNGKey(7))
    out = {
        "updates": UPDATES,
        "wall_s": round(time.time() - t0, 0),
        "heldout_success": round(float(s) / max(float(c), 1), 3),
        "heldout_episodes": int(c),
        "ablated_success": round(float(sa) / max(float(ca), 1), 3),
        "ablated_episodes": int(ca),
    }
    print("REFERENT RESULT:", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
