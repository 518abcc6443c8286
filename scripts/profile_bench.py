"""Profile the headline-bench train step piecewise on the real chip.

Times (per call, after warmup): render-only, env.step_fn, policy act,
full rollout scan, PPO update, full train step — plus derived shares and
a rough MFU for the update. Writes one JSON dict to stdout.

Reference protocol analog: scripts/hab2_bench (hab2 paper Table 2) times
sim-only SPS; VERDICT r1 asks for the full-step breakdown + MFU instead.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.models.policy import make_pointnav_resnet_policy

    num_envs, num_steps = 256, 32
    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=4, episodes_per_scene=16, seed=0
    )
    env = make_nav_env(
        scenes,
        episodes,
        num_envs=num_envs,
        precomputed_fields=fields,
        max_episode_steps=500,
        sensor_specs=(
            ("HabitatSimDepthSensor", {"height": 128, "width": 128}),
            ("HabitatSimRGBSensor", {"height": 128, "width": 128}),
            ("PointGoalWithGPSCompassSensor", None),
        ),
    )
    print(
        "scene tris:",
        [int(s.tri_mat.shape[-1]) if hasattr(s, "tri_mat") else -1 for s in [env.pack]],
        flush=True,
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

    res = {}

    # 1. env.step_fn alone (includes render)
    act = jnp.zeros((num_envs,), jnp.int32) + 1
    step_jit = jax.jit(lambda s, a: env.step_fn(s, a, env_data=data))
    dt, (st2, obs2, *_rest) = timeit(step_jit, ts.env_state, act)
    res["env_step_ms"] = round(dt * 1e3, 2)

    # 2. policy act alone
    def act_fn(params, obs, hidden, prev_action, not_done, key):
        dist_params, value, h = learner._apply_policy(
            params, obs, hidden, prev_action, not_done
        )
        a, lp = learner._sample(dist_params, jax.random.PRNGKey(0))
        return a, lp, value, h

    act_jit = jax.jit(act_fn)
    dt, _ = timeit(
        act_jit, ts.params, ts.obs, ts.hidden, ts.prev_action, ts.not_done, ts.key
    )
    res["policy_act_ms"] = round(dt * 1e3, 2)

    # 3. rollout scan
    roll_jit = jax.jit(lambda t: learner._collect_rollout(t, data)[:2])
    dt, (ts_after, batch) = timeit(roll_jit, ts, iters=5)
    res["rollout_ms"] = round(dt * 1e3, 2)

    # 4. update alone (on a fixed rollout)
    roll_full = jax.jit(lambda t: learner._collect_rollout(t, data))
    _, batch, last_v, h0, _stats = roll_full(ts)
    jax.block_until_ready(batch.rewards)
    upd_jit = jax.jit(lambda t, b, lv, h: learner._update(t, b, lv, h)[0].update_idx)
    dt, _ = timeit(upd_jit, ts, batch, last_v, h0, iters=5)
    res["update_ms"] = round(dt * 1e3, 2)

    # 5. full train step
    train_jit = jax.jit(learner.train_step, donate_argnums=(0,))
    ts2, m = train_jit(ts, data)
    jax.block_until_ready(m["losses/learner_loss"])
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        ts2, m = train_jit(ts2, data)
    jax.block_until_ready(m["losses/learner_loss"])
    dt = (time.time() - t0) / iters
    res["train_step_ms"] = round(dt * 1e3, 2)
    res["sps"] = round(num_envs * num_steps / dt, 1)

    # rough MFU: resnet18 fwd ~0.59 GFLOP/frame at 128x128x4ch
    # rollout: T acts (fwd). update: ppo_epoch passes of fwd+bwd (~3x fwd).
    frames = num_envs * num_steps
    gflop_fwd = 0.59
    total_tflop = frames * gflop_fwd * (1 + 2 * 3) / 1e3
    res["model_tflop_per_update"] = round(total_tflop, 1)
    res["mfu_vs_197tflops_bf16"] = round(
        total_tflop / (dt * 197.0), 4
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
