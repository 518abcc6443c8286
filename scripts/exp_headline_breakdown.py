"""Slope-timed headline decomposition (round 5).

The round-3 trace attribution (convs 245 / raycast 192 / pool 29 / GN 42 /
misc 70 of 580 ms) predates v14 and later kernel changes, and the trace
tool now buries everything inside opaque while-ops. Re-measure the pieces
the way bench.py measures the whole: k-chained fori_loop + scalar pull,
slope between chain lengths — immune to the tunnel's unreliable
block_until_ready.

Pieces: full train step | rollout-only (_collect_rollout: act+render+step
x32) | update-only (_update on a fixed rollout buffer) | render-only x32.
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


def main():
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.models.policy import make_pointnav_resnet_policy
    from habitat_tpu.parallel.compile_opts import tpu_compiler_options
    from habitat_tpu.ops.raycast import render_batch

    num_envs, num_steps = 256, 32
    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=4, episodes_per_scene=16, seed=0
    )
    env = make_nav_env(
        scenes, episodes, num_envs=num_envs, precomputed_fields=fields,
        max_episode_steps=500,
        sensor_specs=(
            ("HabitatSimDepthSensor", {"height": 128, "width": 128}),
            ("HabitatSimRGBSensor", {"height": 128, "width": 128}),
            ("PointGoalWithGPSCompassSensor", None),
        ),
    )
    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone="resnet18", hidden_size=512
    )
    learner = PPOLearner(
        env, policy, PPOConfig(num_steps=num_steps, num_mini_batch=2, ppo_epoch=2)
    )
    data = env.env_data
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0), data)
    jax.block_until_ready(ts.params)
    opts = tpu_compiler_options()
    res = {}

    def leafsum(x):
        return jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32).ravel()[:1])

    def slope(mk, k1=2, k2=6, repeats=3):
        c1, c2 = mk(k1), mk(k2)
        for c in (c1, c2):
            float(c())
        def timed(c):
            best = float("inf")
            for _ in range(repeats):
                t0 = time.time()
                float(c())
                best = min(best, time.time() - t0)
            return best
        return (timed(c2) - timed(c1)) / (k2 - k1)

    def mk_full(k):
        def run():
            out = jax.lax.fori_loop(
                0, k, lambda i, c: learner.train_step(c, data)[0], ts
            )
            return leafsum(out)
        return jax.jit(run, compiler_options=opts)
    res["train_step_ms"] = round(slope(mk_full) * 1e3, 1)
    print(json.dumps(res), flush=True)

    def mk_roll(k):
        def run():
            def body(i, c):
                t, acc = c
                t2, batch, last_value, h0, _ = learner._collect_rollout(t, data)
                # thread the batch into the carry so the rollout cannot be
                # dead-code-eliminated (ts alone does not depend on it)
                return (t2, acc + jnp.sum(last_value) + jnp.sum(batch.rewards))
            out = jax.lax.fori_loop(0, k, body, (ts, jnp.float32(0.0)))
            return out[1]
        return jax.jit(run, compiler_options=opts)
    res["rollout_ms"] = round(slope(mk_roll) * 1e3, 1)
    print(json.dumps(res), flush=True)

    # update-only on a fixed buffer
    batch, last_value, h0 = None, None, None
    coll = jax.jit(lambda t, d: learner._collect_rollout(t, d))
    ts2, batch, last_value, h0, _ = coll(ts, data)
    jax.block_until_ready(last_value)

    def mk_upd(k):
        # batch as a jit ARGUMENT: closing over the (T,N,128,128,C) frames
        # inlines >1 GB of constants -> remote-compile HTTP 413
        def run(t0, b, lv, h):
            def body(i, c):
                return learner._update(c, b, lv, h)[0]
            out = jax.lax.fori_loop(0, k, body, t0)
            return jnp.sum(
                jax.tree_util.tree_leaves(out.params)[0].astype(jnp.float32).ravel()[:1]
            )
        f = jax.jit(run, compiler_options=opts)
        return lambda: f(ts, batch, last_value, h0)
    res["update_ms"] = round(slope(mk_upd) * 1e3, 1)
    print(json.dumps(res), flush=True)

    # render-only x32 per chain unit
    pack = env.pack
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(1.5, 8.5, (num_envs, 3)), jnp.float32)
    pos = pos.at[:, 1].set(1.2)
    yaw0 = jnp.asarray(rng.uniform(0, 6.28, (num_envs,)), jnp.float32)
    sids = jnp.asarray(rng.integers(0, 4, (num_envs,)), jnp.int32)

    def mk_render(k):
        def run():
            def body(i, y):
                out = render_batch(
                    pack, sids, pos, y, jnp.zeros((num_envs,)),
                    height=128, width=128,
                )
                return y + out["depth"][:, 0, 0, 0] * 1e-9
            y = jax.lax.fori_loop(0, k * num_steps, body, yaw0)
            return jnp.sum(y.ravel()[:1])
        return jax.jit(run, compiler_options=opts)
    res["render32_ms"] = round(slope(mk_render) * 1e3, 1)
    res["derived_env_act_ms"] = round(
        res["rollout_ms"] - res["render32_ms"], 1
    )
    res["derived_misc_ms"] = round(
        res["train_step_ms"] - res["rollout_ms"] - res["update_ms"], 1
    )
    print("FINAL:", json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
