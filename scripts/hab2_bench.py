"""Simulation-throughput benchmark grid (counterpart of reference
scripts/hab2_bench/ + scripts/hab3_bench/bench_runner.sh: avg SPS across a
grid of {num_envs} x {num_objects} x {dynamics mode}, plus the hab3
robot+humanoid social row).

This measures SIM-ONLY steps/sec (render + env step, no learning) — the
reference's own published protocol (hab2 paper Table 2; hab3 grid
{2,5,10} objects x kinematic/dynamic x robot+humanoid). Timing is the
slope method (two chained-iteration counts, RTT cancels — see
scripts/_timing.py). Run on the TPU:

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

    return _slope_sps(env, unroll, num_envs, steps)


def _slope_sps(env, unroll, num_envs: int, steps: int, k1: int = 2, k2: int = 8):
    """Per-step SPS via the slope method: k chained scan-rollouts inside one
    jit, timed at two k values with a () scalar pull — tunnel RTT cancels."""

    def chain(k):
        def run(s):
            def body(_, carry):
                (st, acc), _ = jax.lax.scan(unroll, carry, None, length=steps)
                return (st, acc)

            st, acc = jax.lax.fori_loop(0, k, body, (s, jnp.float32(0)))
            return acc

        return jax.jit(run)

    state, _ = env.reset(seed=0)
    c1, c2 = chain(k1), chain(k2)
    for c in (c1, c2):
        float(c(state))

    def timed(c):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(c(state))
            best = min(best, time.time() - t0)
        return best

    dt = (timed(c2) - timed(c1)) / (k2 - k1) / steps
    return num_envs / dt


def bench_rearrange(
    num_envs: int,
    num_objects: int,
    res: int,
    dynamics: str = "kinematic",
    social: bool = False,
    steps: int = 32,
):
    """One hab2/hab3 grid cell. social=True adds the scripted humanoid
    (hab3's robot+humanoid rows, scripts/hab3_bench/bench_runner.sh:26-39)."""
    if social:
        from habitat_tpu.tasks.rearrange.social_nav import make_social_nav_env

        env = make_social_nav_env(
            num_envs=num_envs, render_size=(res, res), with_visual=True
        )
    else:
        from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

        env = make_rearrange_env(
            num_envs=num_envs,
            task="rearrange",
            num_objects=num_objects,
            render_size=(res, res),
            with_visual=True,
            dynamics=dynamics,
        )

    def unroll(carry, _):
        state, acc = carry
        state, obs, r, d, info = env.step_fn(
            state, jnp.ones((num_envs,), jnp.int32)
        )
        acc = acc + sum(jnp.sum(v.astype(jnp.float32)) for v in obs.values())
        return (state, acc), None

    return _slope_sps(env, unroll, num_envs, steps)


def main():
    results = {}
    for n in (64, 256):
        results[f"pointnav_rgbd128_n{n}"] = round(bench_nav(n, 128), 1)
    # hab3 grid: objects x dynamics (reference bench_runner.sh:10,26-39)
    for o in (2, 5, 10):
        for dyn in ("kinematic", "contacts"):
            results[f"rearrange_rgbd128_n64_obj{o}_{dyn}"] = round(
                bench_rearrange(64, o, 128, dynamics=dyn), 1
            )
    results["social_robot_humanoid_rgbd128_n64"] = round(
        bench_rearrange(64, 5, 128, social=True), 1
    )
    print(json.dumps({"metric": "sim-only env-steps/s (hab2/hab3-bench protocol)", "results": results}))


if __name__ == "__main__":
    main()
