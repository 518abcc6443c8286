"""Capture a jax.profiler trace of the headline train step and print a
self-time breakdown by HLO op, grouped by source annotation.

Writes the trace under /tmp/habitat_trace and aggregates the device-lane
events from the .trace.json.gz (works through the axon tunnel: the profile
is collected device-side and shipped back as a file).
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_step():
    from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.models.policy import make_pointnav_resnet_policy

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
    policy = make_pointnav_resnet_policy(len(env.actions), backbone="resnet18", hidden_size=512)
    learner = PPOLearner(env, policy, PPOConfig(num_steps=num_steps, num_mini_batch=2, ppo_epoch=2))
    data = env.env_data
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0), data)
    jax.block_until_ready(ts.params)
    step = jax.jit(learner.train_step, donate_argnums=(0,))
    return step, ts, data


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    step, ts, data = build_step()
    ts, m = step(ts, data)
    jax.block_until_ready(m["losses/learner_loss"])

    tdir = "/tmp/habitat_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(2):
            ts, m = step(ts, data)
        jax.block_until_ready(m["losses/learner_loss"])

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    ev_by_name = defaultdict(float)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data_j = json.load(fh)
        # find device lanes (TensorCore); host lanes have pid names like python
        pid_names = {}
        tid_names = {}
        for e in data_j.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
        for e in data_j.get("traceEvents", []):
            if e.get("ph") != "X":
                continue
            pn = pid_names.get(e.get("pid"), "")
            tn = tid_names.get((e.get("pid"), e.get("tid")), "")
            if "TPU" not in pn and "tpu" not in pn.lower():
                continue
            if "step" in tn.lower() or "XLA Modules" in tn:
                continue  # module-level envelope lanes, not op self-time
            ev_by_name[e.get("name", "?")] += e.get("dur", 0)
        if not ev_by_name:
            # fall back: dump lane names to understand the layout
            print("pids:", pid_names)
            print("tids:", dict(list(tid_names.items())[:20]))

    # group op names into buckets
    buckets = defaultdict(float)
    for name, dur in ev_by_name.items():
        n = name.lower()
        if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n or "raycast" in n:
            b = "pallas/custom"
        elif n.startswith("%convolution") or "convolution" in n or re.match(r"%?conv", n):
            b = "conv"
        elif "select-and-scatter" in n:
            b = "maxpool_bwd"
        elif "reduce-window" in n:
            b = "pool_fwd"
        elif "dot" in n:
            b = "dot"
        elif "fusion" in n:
            b = "fusion(elementwise/other)"
        elif "copy" in n or "transpose" in n or "bitcast" in n:
            b = "copy/relayout"
        elif "dynamic" in n or "gather" in n or "scatter" in n:
            b = "gather/scatter"
        else:
            b = "other"
        buckets[b] += dur
    total = sum(buckets.values())
    print(f"\ntotal device self-time: {total/1e3/2:.1f} ms/step (2 steps)")
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:28s} {d/1e3/2:8.1f} ms/step  {100*d/total:5.1f}%")
    print("\ntop 30 ops:")
    for name, dur in sorted(ev_by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur/1e3/2:8.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
