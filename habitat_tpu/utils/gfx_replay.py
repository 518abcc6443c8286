"""gfx-replay keyframe export (reference tasks/rearrange/utils.py
write_gfx_replay + GfxReplayMeasure, rearrange_sensors.py:500: record
per-step scene state for offline replay rendering / HITL clients).

In this engine the \"replay\" IS the trajectory of batched env states; this
module converts recorded states to the JSON keyframe wire format (agent pose +
rigid object transforms + articulated joint states) and can re-render any
keyframe through the TPU renderer."""

from __future__ import annotations

import gzip
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np


def state_to_keyframe(state, env, env_idx: int = 0, step: int = 0) -> Dict[str, Any]:
    """One env lane of a (possibly rearrange) env state -> keyframe dict."""
    kf: Dict[str, Any] = {
        "step": int(step),
        "agent": {
            "position": [float(x) for x in np.asarray(state.pos)[env_idx]],
            "yaw": float(np.asarray(state.yaw)[env_idx]),
        },
    }
    if hasattr(state, "obj_pos"):
        objs = np.asarray(env._obj_world(state))[env_idx]
        valid = np.asarray(env.table.obj_valid)[np.asarray(state.ep_idx)[env_idx]]
        kf["rigid_objects"] = [
            {"name": f"obj_{i}", "position": [float(x) for x in p]}
            for i, (p, v) in enumerate(zip(objs, valid))
            if v
        ]
        kf["held"] = int(np.asarray(state.held)[env_idx])
    if hasattr(state, "art_q"):
        kf["articulated_states"] = [
            float(q) for q in np.asarray(state.art_q)[env_idx]
        ]
    return kf


class GfxReplayRecorder:
    """Collects keyframes during a host-driven rollout (the reference's
    GfxReplayMeasure accumulates habitat-sim keyframe strings the same way)."""

    def __init__(self, env, env_idx: int = 0):
        self.env = env
        self.env_idx = env_idx
        self.keyframes: List[Dict[str, Any]] = []

    def record(self, state) -> None:
        self.keyframes.append(
            state_to_keyframe(state, self.env, self.env_idx, len(self.keyframes))
        )

    def write(self, path: str) -> None:
        write_gfx_replay(json.dumps({"keyframes": self.keyframes}), path)

    def clear(self) -> None:
        self.keyframes = []


def write_gfx_replay(replay_json: str, path: str) -> None:
    """reference write_gfx_replay: dump (gzipped when .gz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.endswith(".gz"):
        with gzip.open(path, "wt") as f:
            f.write(replay_json)
    else:
        with open(path, "w") as f:
            f.write(replay_json)


def load_gfx_replay(path: str) -> List[Dict[str, Any]]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f)["keyframes"]


def render_keyframe(env, keyframe: Dict[str, Any], height: int = 256, width: int = 256):
    """Re-render a keyframe through the TPU renderer (replay rendering —
    the reference needs the C++ ReplayRenderer for this)."""
    import jax.numpy as jnp

    from habitat_tpu.ops.raycast import render_batch

    pos = jnp.asarray(keyframe["agent"]["position"])[None]
    yaw = jnp.asarray(keyframe["agent"]["yaw"])[None]
    out = render_batch(
        env.pack,
        jnp.zeros((1,), jnp.int32),
        pos + jnp.array([0.0, 1.25, 0.0]),
        yaw,
        jnp.zeros((1,)),
        height=height,
        width=width,
    )
    return {k: np.asarray(v[0]) for k, v in out.items()}
