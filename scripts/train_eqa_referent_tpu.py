"""Referent-grounding EQA: prove the QUESTION is load-bearing (round 5).

Same protocol as the referent VLN proof (scripts/train_vln_referent_tpu.py):
each episode carries a symmetric (category, color) object table; only the
question ("what is the color of the sofa ?") names which object's color to
answer. PPO-train the answerer (question-LSTM + table + LSTM policy, no
leaking sensors), evaluate on a HELD-OUT episode stream, then zero the
question tokens at eval. Grounding is proven iff held-out accuracy >> 1/4
chance and the ablation collapses toward chance. CPU-scale runs transfer
only partially (0.27 @ 256 train episodes, 0.44 @ 2048); this TPU run uses
16k episodes.

Usage: python scripts/train_eqa_referent_tpu.py [updates] [num_envs]
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

UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
NUM_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def build(num_envs, episode_seed=None):
    from habitat_tpu.tasks.eqa import make_referent_eqa_env

    return make_referent_eqa_env(
        num_envs=num_envs, num_scenes=4, episodes_per_scene=4096,
        max_episode_steps=6, episode_seed=episode_seed,
    )


def main():
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.models.policy import make_pointnav_resnet_policy
    from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

    env = build(NUM_ENVS)
    ev_env = build(128, episode_seed=321)
    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone="resnet9", hidden_size=96,
        has_visual=False, goal_keys=(),
    )
    learner = PPOLearner(
        env, policy,
        PPOConfig(num_steps=12, num_mini_batch=2, ppo_epoch=2, lr=1e-3),
        measure_keys=("answer_accuracy",),
    )
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0), None)
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    t0 = time.time()
    for u in range(UPDATES):
        ts, m = step(ts)
        if (u + 1) % 500 == 0:
            dc = float(m.get("done_count", 1.0))
            print(
                f"upd {u+1} ({time.time()-t0:.0f}s): acc "
                f"{float(m.get('m_answer_accuracy', float('nan')))/max(dc,1):.3f}",
                flush=True,
            )
    net = policy.net

    def make_eval(ablate):
        def run(params, key):
            state, obs = ev_env.reset_fn(key)
            hidden = initial_hidden_state(
                128, net.hidden_size, net.num_recurrent_layers, net.rnn_type
            )
            prev = jnp.zeros((128,), jnp.int32)
            nd = jnp.zeros((128,), jnp.float32)

            def body(carry, _):
                state, obs, hidden, prev, nd, corr, cnt = carry
                o = dict(obs)
                if ablate:
                    o["question"] = jnp.zeros_like(o["question"])
                logits, _, hidden2 = policy.apply(params, o, hidden, prev, nd)
                a = jnp.argmax(logits, -1)
                state2, obs2, r, done, info = ev_env.step_fn(state, a)
                d = done.astype(jnp.float32)
                corr = corr + jnp.sum(info["answer_accuracy"] * d)
                cnt = cnt + jnp.sum(d)
                return (state2, obs2, hidden2, a, 1.0 - d, corr, cnt), None

            (state, obs, hidden, prev, nd, corr, cnt), _ = jax.lax.scan(
                body,
                (state, obs, hidden, prev, nd, jnp.float32(0), jnp.float32(0)),
                None,
                length=60,
            )
            return corr, cnt
        return run

    ev = jax.jit(make_eval(False))
    ev_a = jax.jit(make_eval(True))
    c1, n1 = ev(ts.params, jax.random.PRNGKey(5))
    c2, n2 = ev_a(ts.params, jax.random.PRNGKey(5))
    out = {
        "updates": UPDATES,
        "wall_s": round(time.time() - t0, 0),
        "heldout_accuracy": round(float(c1) / max(float(n1), 1), 3),
        "heldout_episodes": int(n1),
        "ablated_accuracy": round(float(c2) / max(float(n2), 1), 3),
        "ablated_episodes": int(n2),
    }
    print("EQA REFERENT RESULT:", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
