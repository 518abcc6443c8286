"""VLN benchmark (reference examples/vln_benchmark.py + the reference-path
follower in vln_reference_path_follower_example.py).

The reference evaluates a ShortestPathFollower agent over R2R episodes one
env at a time; here the same oracle rides the BATCHED env: a greedy
geodesic-follower action is computed for all N envs per step (device-side
distance fields, ops/navgrid.greedy_follower_step) and metrics aggregate
over completed episodes — the batch-native form of the reference loop.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collections import defaultdict

import numpy as np


def vln_reference_path_benchmark(num_envs: int = 4, episodes_target: int = 12):
    import jax
    import jax.numpy as jnp

    from habitat_tpu.ops import navgrid as ng
    from habitat_tpu.tasks.vln import make_vln_env

    env = make_vln_env(num_envs=num_envs, seed=3, with_pointgoal=False)
    state, obs = env.reset_fn(jax.random.PRNGKey(0))

    import functools

    step_fn = functools.partial(
        ng.greedy_follower_step,
        goal_radius=0.2,
        forward_step=0.25,
        turn_angle=float(np.deg2rad(10.0)),
    )

    @jax.jit
    def follow(ep_idx, pos, yaw):
        sid = env.table.scene_idx[ep_idx]
        fields = env.table.dist_field[ep_idx].astype(jnp.float32)
        return jax.vmap(lambda s, f, p, y: step_fn(env.pack, s, f, p, y))(
            sid, fields, pos, yaw
        )

    agg = defaultdict(float)
    n_done = 0
    for _ in range(400):
        act = follow(state.ep_idx, state.pos, state.yaw)
        state, obs, reward, done, info = env.step_fn(state, act)
        d = np.asarray(done)
        if d.any():
            for k in ("success", "spl", "distance_to_goal"):
                agg[k] += float(np.asarray(info[k])[d].sum())
            n_done += int(d.sum())
        if n_done >= episodes_target:
            break
    return {k: v / max(n_done, 1) for k, v in agg.items()}, n_done


if __name__ == "__main__":
    metrics, n = vln_reference_path_benchmark()
    print(f"episodes: {n}")
    for k, v in metrics.items():
        print(f"{k}: {v:.3f}")
