"""Simulation-throughput benchmark grid (counterpart of reference
scripts/hab2_bench/ + hab3_bench: avg SPS over runs across a grid of
{num_envs} x {num_objects} x {scene size}, kinematic mode).

This measures SIM-ONLY steps/sec (render + env step, no learning) — the
reference's own published protocol (hab2 paper Table 2). Run on the TPU:

    python scripts/hab2_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_nav(num_envs: int, res: int, iters: int = 10, steps: int = 32):
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav

    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=4, episodes_per_scene=8, seed=0
    )
    env = make_nav_env(
        scenes,
        episodes,
        num_envs=num_envs,
        precomputed_fields=fields,
        sensor_specs=(
            ("HabitatSimDepthSensor", {"height": res, "width": res}),
            ("HabitatSimRGBSensor", {"height": res, "width": res}),
            ("PointGoalWithGPSCompassSensor", None),
        ),
    )

    def unroll(carry, _):
        state, acc = carry
        state, obs, r, d, info = env.step_fn(
            state, jnp.ones((num_envs,), jnp.int32)
        )
        # consume every observation so the renderer cannot be DCE'd —
        # the product of a sim step IS the observation
        acc = acc + sum(jnp.sum(v.astype(jnp.float32)) for v in obs.values())
        return (state, acc), r[0]

    roll = jax.jit(lambda s: jax.lax.scan(unroll, (s, jnp.float32(0)), None, length=steps))
    state, _ = env.reset(seed=0)
    (state, acc), _ = roll(state)  # compile
    jax.block_until_ready(acc)
    t0 = time.time()
    for _ in range(iters):
        (state, acc), _ = roll(state)
    jax.block_until_ready(acc)
    dt = (time.time() - t0) / iters
    return num_envs * steps / dt


def bench_rearrange(num_envs: int, num_objects: int, res: int, iters: int = 10, steps: int = 32):
    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

    env = make_rearrange_env(
        num_envs=num_envs,
        task="rearrange",
        num_objects=num_objects,
        render_size=(res, res),
        with_visual=True,
    )

    def unroll(carry, _):
        state, acc = carry
        state, obs, r, d, info = env.step_fn(
            state, jnp.ones((num_envs,), jnp.int32)
        )
        acc = acc + sum(jnp.sum(v.astype(jnp.float32)) for v in obs.values())
        return (state, acc), r[0]

    roll = jax.jit(lambda s: jax.lax.scan(unroll, (s, jnp.float32(0)), None, length=steps))
    state, _ = env.reset(seed=0)
    (state, acc), _ = roll(state)
    jax.block_until_ready(acc)
    t0 = time.time()
    for _ in range(iters):
        (state, acc), _ = roll(state)
    jax.block_until_ready(acc)
    dt = (time.time() - t0) / iters
    return num_envs * steps / dt


def main():
    results = {}
    for n in (64, 256):
        results[f"pointnav_rgbd128_n{n}"] = round(bench_nav(n, 128), 1)
    for n, o in ((64, 2), (64, 5), (64, 10)):
        results[f"rearrange_rgbd128_n{n}_obj{o}"] = round(
            bench_rearrange(n, o, 128), 1
        )
    print(json.dumps({"metric": "sim-only env-steps/s (hab2-bench protocol)", "results": results}))


if __name__ == "__main__":
    main()
