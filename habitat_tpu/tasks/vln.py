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

NUMBER_WORDS = (
    "zero one two three four five six seven eight nine ten "
    "eleven twelve thirteen fourteen fifteen"
).split()

# fixed procedural-instruction vocabulary (index 0 = pad/unk)
VLN_VOCAB = {
    w: i + 1
    for i, w in enumerate(
        NUMBER_WORDS
        + "point walk meters forward back left right then to reach the "
          "goal west east north south and until you "
          "go red blue box".split()
    )
}


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
        # decimeter-precise displacement instructions IN THE EPISODE-START
        # FRAME (matching the episodic GPS sensor, reference nav.py:398): the
        # text fully determines the goal to 5cm, so an agent that parses the
        # instruction and reads its GPS can navigate without any goal sensor
        # — the procedural stand-in for R2R path language
        yaw0 = ep.start_yaw
        cy, sy = np.cos(-yaw0), np.sin(-yaw0)
        rel_x = cy * d[0] - sy * d[2]  # start-frame x (right)
        rel_z = sy * d[0] + cy * d[2]  # start-frame z (forward = -z)
        fwd, right = -float(rel_z), float(rel_x)

        def words(v):
            m = min(int(abs(v)), len(NUMBER_WORDS) - 1)
            dm = min(int(round((abs(v) - int(abs(v))) * 10)), 9)
            return f"{NUMBER_WORDS[m]} point {NUMBER_WORDS[dm]}"

        fb = "forward" if fwd >= 0 else "back"
        lr = "right" if right >= 0 else "left"
        text = (
            f"walk {words(fwd)} meters {fb} then "
            f"{words(right)} meters {lr} to reach the goal"
        )
        toks = [VLN_VOCAB.get(w, 0) for w in text.replace(",", "").split()]
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


def make_referent_vln(
    num_scenes: int = 2, episodes_per_scene: int = 8, seed: int = 0, **kw
):
    """Referent-grounding VLN (round 5, weak-#9 upgrade): episodes carry
    TWO candidate goals; which one is the target is stated ONLY in the
    instruction ("go to the red box" / "go to the blue box"), while the
    observation exposes both candidates' positions and colors
    symmetrically. Language is therefore LOAD-BEARING: a policy that
    ignores the tokens cannot beat ~50% success, and an instruction
    ablation of a trained policy must collapse to chance — unlike the
    displacement instructions of make_procedural_vln, which a GPS-reading
    agent could in principle follow without grounding words to the world.
    (R2R analog: referring expressions disambiguate among visible
    candidates.)"""
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav

    scenes, pn_eps, fields = make_procedural_pointnav(
        num_scenes=num_scenes, episodes_per_scene=episodes_per_scene,
        seed=seed, **kw
    )
    scene_map = {s.scene_id: s for s in scenes}
    es = kw.get("episode_seed") or seed
    rng = np.random.default_rng(es + 777)
    episodes = []
    cand_rows = {}
    for ep in pn_eps:
        scene = scene_map[ep.scene_id]
        g = np.asarray(ep.goals[0].position, np.float64)
        # decoy: a navigable point well separated from the true goal
        for _ in range(64):
            d = np.asarray(scene.sample_navigable_point(rng), np.float64)
            if np.linalg.norm((d - g)[[0, 2]]) > 2.0:
                break
        k_true = int(rng.integers(0, 2))
        cands = [None, None]
        cands[k_true] = g
        cands[1 - k_true] = d
        colors = ["red", "blue"] if rng.random() < 0.5 else ["blue", "red"]
        color_true = colors[k_true]
        text = f"go to the {color_true} box"
        toks = [VLN_VOCAB.get(w, 0) for w in text.split()]
        # WORLD coordinates; the sensor rotates into the CURRENT agent
        # frame per step (a pointgoal-like representation per candidate,
        # so only the instruction-conditioned SELECTION must be learned)
        row = []
        for ci, col in zip(cands, colors):
            row += [float(ci[0]), float(ci[2]),
                    1.0 if col == "red" else 0.0,
                    1.0 if col == "blue" else 0.0]
        eid = "vlnr_" + ep.episode_id
        episodes.append(
            VLNEpisode(
                episode_id=eid,
                scene_id=ep.scene_id,
                start_position=ep.start_position,
                start_rotation=ep.start_rotation,
                info=dict(ep.info),
                goals=ep.goals,  # the TRUE goal drives measures/teacher
                instruction=InstructionData(text, toks),
            )
        )
        cand_rows[eid] = np.asarray(row, np.float32)
        fields[eid] = fields.pop(ep.episode_id)
    return scenes, episodes, fields, cand_rows


def referent_extras(episodes, cand_rows, max_len: int = MAX_INSTRUCTION_LEN):
    ex = vln_extras(episodes, max_len)
    ex["vln_candidates"] = jnp.asarray(
        np.stack([cand_rows[ep.episode_id] for ep in episodes])
    )
    return ex


class VLNCandidatesSensor(FunctionalSensor):
    """(8,) = [fwd, right, is_red, is_blue] x 2 candidates in the CURRENT
    agent frame — a pointgoal-like vector PER candidate, deliberately
    SYMMETRIC between candidates so only the instruction disambiguates
    which one is the target."""

    uuid = "vln_candidates"

    def __init__(self, config=None):
        super().__init__(config)

    def observation_space(self):
        from gymnasium import spaces as gym_spaces

        return gym_spaces.Box(
            low=-np.inf, high=np.inf, shape=(8,), dtype=np.float32
        )

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        from habitat_tpu.utils.geometry import rotate_world_to_agent

        rows = ctx.table.extras["vln_candidates"][ctx.ep_idx]  # (N, 8)
        outs = []
        for k in range(2):
            cw = rows[:, 4 * k : 4 * k + 2]  # world (x, z)
            rel = jnp.stack(
                [
                    cw[:, 0] - ctx.pos[:, 0],
                    jnp.zeros_like(cw[:, 0]),
                    cw[:, 1] - ctx.pos[:, 2],
                ],
                axis=-1,
            )
            ego = rotate_world_to_agent(rel, ctx.yaw)
            outs.append(
                jnp.stack([-ego[:, 2], ego[:, 0]], axis=-1)
            )  # [fwd, right]
            outs.append(rows[:, 4 * k + 2 : 4 * k + 4])
        return jnp.concatenate(outs, axis=-1).astype(jnp.float32)


def make_vln_env(
    num_envs: int = 4,
    seed: int = 0,
    max_episode_steps: int = 200,
    with_pointgoal: bool = True,
    visual_specs: tuple = (),
    **kw,
):
    import dataclasses as _dc

    from habitat_tpu.core.batched_env import BatchedEnv, RewardSpec
    from habitat_tpu.core.dataset import build_env_episode_order, build_episode_table
    from habitat_tpu.core.registry import registry as reg
    from habitat_tpu.sims.scene import pack_scenes

    referent = kw.pop("referent", False)
    if referent:
        scenes, episodes, fields, cand_rows = make_referent_vln(seed=seed, **kw)
    else:
        scenes, episodes, fields = make_procedural_vln(seed=seed, **kw)
    scene_index = {s.scene_id: i for i, s in enumerate(scenes)}
    scene_map = {s.scene_id: s for s in scenes}
    pack = pack_scenes(scenes)
    table = build_episode_table(episodes, scene_map, scene_index, precomputed_fields=fields)
    table = _dc.replace(
        table,
        extras=referent_extras(episodes, cand_rows)
        if referent
        else vln_extras(episodes),
    )
    order = build_env_episode_order(episodes, num_envs, seed=seed)

    actions = [
        reg.get_task_action(n)(None)
        for n in ("StopAction", "MoveForwardAction", "TurnLeftAction", "TurnRightAction")
    ]
    # a true VLN agent navigates from instruction + vision + odometry alone
    # (reference R2R agents get no goal sensor); with_pointgoal keeps the
    # oracle-goal variant for debugging; visual_specs adds rendered sensors
    # (e.g. (("HabitatSimDepthSensor", {"height": 64, "width": 64}),))
    sensors = [
        InstructionSensor(None),
        reg.get_sensor("GPSSensor")(None),
        reg.get_sensor("CompassSensor")(None),
    ]
    if referent:
        sensors.append(VLNCandidatesSensor(None))
    for name, cfg in visual_specs:
        sensors.append(reg.get_sensor(name)(cfg))
    if with_pointgoal:
        sensors.append(reg.get_sensor("PointGoalWithGPSCompassSensor")(None))
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
