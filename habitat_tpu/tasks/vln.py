"""Vision-and-Language Navigation (reference habitat-lab/habitat/tasks/vln/
vln.py: InstructionSensor:56, VLNTask:81) + R2R dataset loader
(datasets/vln/r2r_vln_dataset.py).

VLN is PointNav with an instruction observation: success/SPL measures and
stop-action semantics are shared with the nav stack; the instruction tokens
ride in the episode-table extras.
"""

from __future__ import annotations

import dataclasses
import gzip
import json
from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp
from gymnasium import spaces

from habitat_tpu.core.dataset import Dataset, Episode, NavigationGoal
from habitat_tpu.core.embodied_task import FunctionalSensor, StepContext
from habitat_tpu.core.registry import registry
from habitat_tpu.tasks.nav import _cfg

MAX_INSTRUCTION_LEN = 64


@dataclasses.dataclass
class InstructionData:
    instruction_text: str = ""
    instruction_tokens: Optional[List[int]] = None


@dataclasses.dataclass
class VLNEpisode(Episode):
    goals: list = dataclasses.field(default_factory=list)
    path: list = dataclasses.field(default_factory=list)
    instruction: InstructionData = dataclasses.field(default_factory=InstructionData)
    trajectory_id: str = ""


@registry.register_dataset(name="R2RVLN-v1")
class VLNDatasetV1(Dataset):
    """Loads the reference R2R json schema."""

    def __init__(self, config=None) -> None:
        super().__init__()
        self.instruction_vocab: Dict[str, int] = {}
        if config is None:
            return
        data_path = config.data_path.format(split=config.split)
        opener = gzip.open if data_path.endswith(".gz") else open
        with opener(data_path, "rt") as f:
            self.from_json(f.read())

    def from_json(self, json_str: str, scenes_dir=None) -> None:
        data = json.loads(json_str)
        self.instruction_vocab = data.get("instruction_vocab", {})
        for ep in data.get("episodes", []):
            ins = ep.get("instruction", {})
            self.episodes.append(
                VLNEpisode(
                    episode_id=str(ep["episode_id"]),
                    scene_id=ep["scene_id"],
                    start_position=list(ep["start_position"]),
                    start_rotation=list(ep["start_rotation"]),
                    info=ep.get("info", {}),
                    goals=[
                        NavigationGoal(
                            position=list(g["position"]), radius=g.get("radius")
                        )
                        for g in ep.get("goals", [])
                    ],
                    path=ep.get("path", []),
                    trajectory_id=str(ep.get("trajectory_id", "")),
                    instruction=InstructionData(
                        instruction_text=ins.get("instruction_text", ""),
                        instruction_tokens=ins.get("instruction_tokens"),
                    ),
                )
            )


@registry.register_sensor(name="InstructionSensor")
class InstructionSensor(FunctionalSensor):
    uuid = "instruction"

    def __init__(self, config=None):
        super().__init__(config)
        self.max_len = _cfg(config, "max_instruction_len", MAX_INSTRUCTION_LEN)

    def observation_space(self):
        return spaces.Box(low=0, high=2**15, shape=(self.max_len,), dtype=np.int64)

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        toks = ctx.table.extras["instruction_tokens"]
        return toks[ctx.ep_idx].astype(jnp.int32)


def vln_extras(episodes: List[VLNEpisode], max_len: int = MAX_INSTRUCTION_LEN):
    E = len(episodes)
    toks = np.zeros((E, max_len), np.int32)
    for i, ep in enumerate(episodes):
        t = (ep.instruction.instruction_tokens or [])[:max_len]
        toks[i, : len(t)] = t
    return {"instruction_tokens": jnp.asarray(toks)}


def make_procedural_vln(
    num_scenes: int = 2, episodes_per_scene: int = 8, seed: int = 0, **kw
):
    """Procedural VLN: templated directions derived from the shortest path
    ("go to the <color-ish> room" stands in for natural R2R instructions)."""
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav

    scenes, pn_eps, fields = make_procedural_pointnav(
        num_scenes=num_scenes, episodes_per_scene=episodes_per_scene, seed=seed, **kw
    )
    episodes = []
    for ep in pn_eps:
        g = np.asarray(ep.goals[0].position)
        s = np.asarray(ep.start_position)
        d = g - s
        lr = "left" if d[0] < 0 else "right"
        fb = "forward" if d[2] < 0 else "back"
        text = f"walk {fb} and to the {lr} until you reach the goal"
        # tiny fixed vocab tokenization
        vocab = {w: i + 1 for i, w in enumerate(
            "walk forward back and to the left right until you reach goal".split()
        )}
        toks = [vocab.get(w, 0) for w in text.replace(",", "").split()]
        episodes.append(
            VLNEpisode(
                episode_id="vln_" + ep.episode_id,
                scene_id=ep.scene_id,
                start_position=ep.start_position,
                start_rotation=ep.start_rotation,
                info=dict(ep.info),
                goals=ep.goals,
                instruction=InstructionData(text, toks),
            )
        )
        fields["vln_" + ep.episode_id] = fields.pop(ep.episode_id)
    return scenes, episodes, fields


def make_vln_env(num_envs: int = 4, seed: int = 0, max_episode_steps: int = 200, **kw):
    import dataclasses as _dc

    from habitat_tpu.core.batched_env import BatchedEnv, RewardSpec
    from habitat_tpu.core.dataset import build_env_episode_order, build_episode_table
    from habitat_tpu.core.registry import registry as reg
    from habitat_tpu.sims.scene import pack_scenes

    scenes, episodes, fields = make_procedural_vln(seed=seed, **kw)
    scene_index = {s.scene_id: i for i, s in enumerate(scenes)}
    scene_map = {s.scene_id: s for s in scenes}
    pack = pack_scenes(scenes)
    table = build_episode_table(episodes, scene_map, scene_index, precomputed_fields=fields)
    table = _dc.replace(table, extras=vln_extras(episodes))
    order = build_env_episode_order(episodes, num_envs, seed=seed)

    actions = [
        reg.get_task_action(n)(None)
        for n in ("StopAction", "MoveForwardAction", "TurnLeftAction", "TurnRightAction")
    ]
    sensors = [
        InstructionSensor(None),
        reg.get_sensor("PointGoalWithGPSCompassSensor")(None),
    ]
    measures = [
        reg.get_measure(n)(None)
        for n in ("DistanceToGoal", "Success", "SPL", "DistanceToGoalReward", "NumSteps")
    ]
    return BatchedEnv(
        pack,
        table,
        order,
        sensors,
        measures,
        actions,
        max_episode_steps=max_episode_steps,
        reward_spec=RewardSpec(end_on_success=True),
    )
