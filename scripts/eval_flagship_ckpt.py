"""Large-set evaluation of a saved flagship checkpoint.

Pins the flagship generalization claim on the published ARTIFACT: loads
orbax params, builds a held-out eval set (scene seeds 91_000+, disjoint
from every training seed), and runs the same greedy protocol as the
training harness over ~1024 episodes for a tight estimate.

Usage: python scripts/eval_flagship_ckpt.py <ckpt_dir> [num_scenes] [eps_per_scene] [res]
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

CKPT = sys.argv[1]
NSC = int(sys.argv[2]) if len(sys.argv) > 2 else 64
EPS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
RES = int(sys.argv[4]) if len(sys.argv) > 4 else 128


def main():
    import orbax.checkpoint as ocp

    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.models.policy import make_pointnav_resnet_policy
    from habitat_tpu.models.rnn_state_encoder import initial_hidden_state

    scenes, eps, fields = make_procedural_pointnav(
        num_scenes=NSC, episodes_per_scene=EPS, seed=91_000
    )
    env = make_nav_env(
        scenes, eps, num_envs=64, precomputed_fields=fields,
        max_episode_steps=200,
        sensor_specs=(
            ("HabitatSimDepthSensor", {"height": RES, "width": RES}),
            ("PointGoalWithGPSCompassSensor", None),
        ),
    )
    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone="resnet18", hidden_size=512
    )
    data = env.env_data
    net = policy.net
    state0, obs0 = env.reset_fn(jax.random.PRNGKey(0), env_data=data)
    hidden0 = initial_hidden_state(
        64, net.hidden_size, net.num_recurrent_layers, net.rnn_type
    )
    abstract = jax.eval_shape(
        lambda k: policy.init(
            k, obs0, hidden0, jnp.zeros((64,), jnp.int32),
            jnp.zeros((64,), jnp.float32),
        ),
        jax.random.PRNGKey(1),
    )
    params = ocp.StandardCheckpointer().restore(
        os.path.abspath(CKPT), abstract
    )

    def eval_rollout(params, key):
        state, obs = env.reset_fn(key, env_data=data)
        hidden = hidden0
        prev_a = jnp.zeros((64,), jnp.int32)
        not_done = jnp.zeros((64,), jnp.float32)
        acc = {
            "count": jnp.zeros((64,), jnp.int32),
            "succ": jnp.zeros((64,)),
            "spl": jnp.zeros((64,)),
        }

        def body(carry, _):
            state, obs, hidden, prev_a, not_done, acc = carry
            dist, _, hidden2 = policy.apply(
                params, obs, hidden, prev_a, not_done
            )
            a = jnp.argmax(dist, axis=-1).astype(jnp.int32)
            state2, obs2, r, d, info = env.step_fn(state, a, env_data=data)
            first = d & (acc["count"] < 4)
            acc = {
                "count": acc["count"] + first.astype(jnp.int32),
                "succ": acc["succ"] + jnp.where(first, info["success"], 0.0),
                "spl": acc["spl"] + jnp.where(first, info["spl"], 0.0),
            }
            return (state2, obs2, hidden2, a, 1.0 - d.astype(jnp.float32), acc), None

        (state, obs, hidden, prev_a, not_done, acc), _ = jax.lax.scan(
            body, (state, obs, hidden, prev_a, not_done, acc), None, length=850
        )
        return acc

    ev = jax.jit(eval_rollout)
    tot = {"count": 0.0, "succ": 0.0, "spl": 0.0}
    t0 = time.time()
    for i in range(4):
        acc = ev(params, jax.random.PRNGKey(100 + i))
        for k in tot:
            tot[k] += float(jnp.sum(acc[k]))
    out = {
        "ckpt": CKPT,
        "episodes": int(tot["count"]),
        "unseen_success": round(tot["succ"] / max(tot["count"], 1), 4),
        "unseen_spl": round(tot["spl"] / max(tot["count"], 1), 4),
        "eval_scenes": NSC,
        "wall_s": round(time.time() - t0, 0),
    }
    print("CKPT EVAL:", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
