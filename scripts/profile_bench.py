"""Component-level profile of the headline bench train step on real TPU.

Times, separately jitted: render_batch alone, policy apply alone, env
step_fn alone, rollout scan alone, update alone, full train step — to
locate where the env-steps/s goes. Prints a JSON breakdown.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.models.policy import make_pointnav_resnet_policy
    from habitat_tpu.models.rnn_state_encoder import initial_hidden_state
    from habitat_tpu.ops.raycast import render_batch

    num_envs = 256
    num_steps = 32
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
    pack = env.pack
    res = {"tri_mat_shape": list(pack.tri_mat.shape)}

    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone="resnet18", hidden_size=512
    )
    learner = PPOLearner(
        env, policy, PPOConfig(num_steps=num_steps, num_mini_batch=2, ppo_epoch=2)
    )
    data = env.env_data
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0), data)
    jax.block_until_ready(ts.params)

    # 1. render alone
    sids = jnp.zeros((num_envs,), jnp.int32)
    pos = jnp.tile(jnp.array([[1.0, 1.2, 1.0]], jnp.float32), (num_envs, 1))
    yaw = jnp.linspace(0, 6.28, num_envs).astype(jnp.float32)
    pitch = jnp.zeros((num_envs,), jnp.float32)
    rend = jax.jit(
        lambda p, y: render_batch(pack, sids, p, y, pitch, height=128, width=128)
    )
    res["render_ms"] = timeit(rend, pos, yaw) * 1e3

    # 2. policy apply alone
    obs = ts.obs
    hidden = ts.hidden
    prev_a = ts.prev_action
    nd = ts.not_done

    apply_j = jax.jit(lambda p, o, h: policy.apply(p, o, h, prev_a, nd))
    res["policy_apply_ms"] = timeit(apply_j, ts.params, obs, hidden) * 1e3

    # 3. env step alone (includes render via observations)
    acts = jnp.zeros((num_envs,), jnp.int32)
    step_j = jax.jit(lambda s, d: env.step_fn(s, acts, env_data=d))
    res["env_step_ms"] = timeit(step_j, ts.env_state, data) * 1e3

    # 4. rollout alone / update alone
    ro_j = jax.jit(lambda t, d: learner._collect_rollout(t, d))
    out = ro_j(ts, data)
    res["rollout_ms"] = timeit(ro_j, ts, data) * 1e3
    ts2, batch, last_value, h0, _ = out

    up_j = jax.jit(lambda t, b, lv, h: learner._update(t, b, lv, h))
    res["update_ms"] = timeit(up_j, ts2, batch, last_value, h0) * 1e3

    # 5. full train step
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    ts3, m = step(ts, data)
    jax.block_until_ready(m["losses/learner_loss"])
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        ts3, m = step(ts3, data)
    jax.block_until_ready(m["losses/learner_loss"])
    res["train_step_ms"] = (time.time() - t0) / iters * 1e3
    res["sps"] = round(num_envs * num_steps / (res["train_step_ms"] / 1e3), 1)
    for k in list(res):
        if k.endswith("_ms"):
            res[k] = round(res[k], 2)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
