"""Embodied Question Answering (reference habitat-lab/habitat/tasks/eqa/eqa.py).

- QuestionSensor (:49): tokenized question from the episode table extras.
- AnswerAction (:179): answering ends the episode (EQATask answer-once logic,
  :143) — modeled as K terminal actions appended after the nav actions.
- Measures: CorrectAnswer (:76), EpisodeInfo (:94), AnswerAccuracy (:114).
- MP3D-EQA dataset loader (datasets/eqa/mp3d_eqa_dataset.py format) + a
  procedural generator asking "what category is the goal object?" over the
  annotated procedural scenes.
"""

from __future__ import annotations

import dataclasses
import gzip
import json
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp
from gymnasium import spaces

from habitat_tpu.core.dataset import Dataset, Episode, NavigationGoal
from habitat_tpu.core.embodied_task import (
    FunctionalAction,
    FunctionalMeasure,
    FunctionalSensor,
    StepContext,
)
from habitat_tpu.core.registry import registry
from habitat_tpu.tasks.nav import _cfg

MAX_QUESTION_LEN = 16


@dataclasses.dataclass
class QuestionData:
    question_text: str = ""
    answer_text: str = ""
    question_tokens: Optional[List[int]] = None
    answer_token: Optional[int] = None
    question_type: Optional[str] = None


@dataclasses.dataclass
class EQAEpisode(Episode):
    goals: list = dataclasses.field(default_factory=list)
    question: QuestionData = dataclasses.field(default_factory=QuestionData)


@registry.register_dataset(name="MP3DEQA-v1")
class Mp3dEQADatasetV1(Dataset):
    """Loads the reference MP3D-EQA json schema."""

    def __init__(self, config=None) -> None:
        super().__init__()
        self.question_vocab: Dict[str, int] = {}
        self.answer_vocab: Dict[str, int] = {}
        if config is None:
            return
        data_path = config.data_path.format(split=config.split)
        opener = gzip.open if data_path.endswith(".gz") else open
        with opener(data_path, "rt") as f:
            self.from_json(f.read())

    def from_json(self, json_str: str, scenes_dir=None) -> None:
        data = json.loads(json_str)
        self.question_vocab = data.get("question_vocab", {}).get(
            "word2idx_dict", data.get("question_vocab", {})
        )
        self.answer_vocab = data.get("answer_vocab", {}).get(
            "word2idx_dict", data.get("answer_vocab", {})
        )
        for ep in data.get("episodes", []):
            q = ep.get("question", {})
            self.episodes.append(
                EQAEpisode(
                    episode_id=str(ep["episode_id"]),
                    scene_id=ep["scene_id"],
                    start_position=list(ep["start_position"]),
                    start_rotation=list(ep["start_rotation"]),
                    info=ep.get("info", {}),
                    goals=[
                        NavigationGoal(position=list(g["position"]))
                        for g in ep.get("goals", [])
                    ],
                    question=QuestionData(
                        question_text=q.get("question_text", ""),
                        answer_text=q.get("answer_text", ""),
                        question_tokens=q.get("question_tokens"),
                        answer_token=q.get("answer_token"),
                        question_type=q.get("question_type"),
                    ),
                )
            )


@registry.register_sensor(name="QuestionSensor")
class QuestionSensor(FunctionalSensor):
    """Tokenized question (reference eqa.py:49)."""

    uuid = "question"

    def __init__(self, config=None):
        super().__init__(config)
        self.max_len = _cfg(config, "max_question_len", MAX_QUESTION_LEN)

    def observation_space(self):
        return spaces.Box(low=0, high=2**15, shape=(self.max_len,), dtype=np.int64)

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        toks = ctx.table.extras["question_tokens"]  # (E, L)
        return toks[ctx.ep_idx].astype(jnp.int32)


@registry.register_task_action(name="AnswerAction")
class AnswerAction(FunctionalAction):
    """Terminal answer action (reference eqa.py:179): choosing any answer id
    stops the episode; accuracy is measured against the episode's answer."""

    name = "answer"

    def __init__(self, config=None, answer_id: int = 0):
        super().__init__(config)
        self.answer_id = answer_id
        self.name = f"answer_{answer_id}"

    def is_stop(self) -> bool:
        return True


@registry.register_measure(name="EpisodeInfo")
class EpisodeInfo(FunctionalMeasure):
    uuid = "episode_info"

    def reset(self, ctx):
        return (), ctx.ep_idx.astype(jnp.float32)

    def update(self, state, ctx, measures):
        return (), ctx.ep_idx.astype(jnp.float32)


@registry.register_measure(name="CorrectAnswer")
class CorrectAnswer(FunctionalMeasure):
    """Ground-truth answer id (reference eqa.py:76)."""

    uuid = "correct_answer"

    def reset(self, ctx):
        return (), ctx.table.extras["answer"][ctx.ep_idx].astype(jnp.float32)

    def update(self, state, ctx, measures):
        return (), ctx.table.extras["answer"][ctx.ep_idx].astype(jnp.float32)


@registry.register_measure(name="AnswerAccuracy")
class AnswerAccuracy(FunctionalMeasure):
    """1 when the chosen answer action matches the gt answer (reference
    eqa.py:114). Config needs answer_base = index of answer_0 in the action
    list (set by the EQA env builder)."""

    uuid = "answer_accuracy"
    deps = ("correct_answer",)

    def __init__(self, config=None):
        super().__init__(config)
        self.answer_base = _cfg(config, "answer_base", 3)

    def reset(self, ctx):
        return (), jnp.zeros(ctx.pos.shape[0], jnp.float32)

    def update(self, state, ctx, measures):
        chosen = ctx.action - self.answer_base
        answered = ctx.stop_called & (chosen >= 0)
        correct = answered & (chosen.astype(jnp.float32) == measures["correct_answer"])
        return (), correct.astype(jnp.float32)


def make_procedural_eqa(
    num_scenes: int = 2,
    episodes_per_scene: int = 8,
    seed: int = 0,
    **kw,
):
    """EQA over procedural scenes: 'what is the category of the target
    object?' — answer vocabulary = OBJECT_CATEGORIES."""
    from habitat_tpu.datasets.object_nav import make_procedural_objectnav
    from habitat_tpu.sims.procedural import OBJECT_CATEGORIES

    scenes, on_eps, fields = make_procedural_objectnav(
        num_scenes=num_scenes, episodes_per_scene=episodes_per_scene, seed=seed, **kw
    )
    vocab = {"<pad>": 0, "what": 1, "is": 2, "the": 3, "category": 4, "of": 5,
             "target": 6, "object": 7, "?": 8}
    episodes = []
    for ep in on_eps:
        q = QuestionData(
            question_text="what is the category of the target object ?",
            question_tokens=[1, 2, 3, 4, 5, 3, 6, 7, 8],
            answer_text=ep.object_category,
            answer_token=int(ep.info["object_category_id"]),
            question_type="category",
        )
        eqa = EQAEpisode(
            episode_id="eqa_" + ep.episode_id,
            scene_id=ep.scene_id,
            start_position=ep.start_position,
            start_rotation=ep.start_rotation,
            info=dict(ep.info),
            goals=ep.goals,
            question=q,
        )
        episodes.append(eqa)
        fields["eqa_" + ep.episode_id] = fields.pop(ep.episode_id)
    answers = list(OBJECT_CATEGORIES)
    return scenes, episodes, fields, vocab, answers


def eqa_extras(episodes: List[EQAEpisode], max_len: int = MAX_QUESTION_LEN):
    """Pack questions/answers into episode-table extras."""
    E = len(episodes)
    toks = np.zeros((E, max_len), np.int32)
    ans = np.full((E,), -1, np.int32)
    for i, ep in enumerate(episodes):
        t = (ep.question.question_tokens or [])[:max_len]
        toks[i, : len(t)] = t
        if ep.question.answer_token is not None:
            ans[i] = ep.question.answer_token
    return {
        "question_tokens": jnp.asarray(toks),
        "answer": jnp.asarray(ans),
        # alias for the VQA trainer's supervised target key
        "answer_token": jnp.asarray(np.maximum(ans, 0)),
    }


def make_eqa_env(
    num_envs: int = 4,
    num_answers: int = 10,
    num_scenes: int = 2,
    episodes_per_scene: int = 8,
    seed: int = 0,
    max_episode_steps: int = 100,
    visual_size: Optional[int] = None,
):
    """EQA batched env: nav actions + K terminal answer actions.
    visual_size adds an RGB sensor and goal-view images of that resolution
    (the VQA/PACMAN IL pipelines consume frames + goal views)."""
    from habitat_tpu.core.batched_env import BatchedEnv, RewardSpec
    from habitat_tpu.core.dataset import build_env_episode_order, build_episode_table
    from habitat_tpu.core.registry import registry as reg
    from habitat_tpu.sims.scene import pack_scenes

    scenes, episodes, fields, vocab, answers = make_procedural_eqa(
        num_scenes=num_scenes, episodes_per_scene=episodes_per_scene, seed=seed
    )
    scene_index = {s.scene_id: i for i, s in enumerate(scenes)}
    scene_map = {s.scene_id: s for s in scenes}
    pack = pack_scenes(scenes)
    table = build_episode_table(
        episodes, scene_map, scene_index, precomputed_fields=fields,
        goal_image_size=visual_size,
    )
    table = dataclasses.replace(table, extras=eqa_extras(episodes))
    order = build_env_episode_order(episodes, num_envs, seed=seed)

    nav_actions = [
        reg.get_task_action(n)(None)
        for n in ("MoveForwardAction", "TurnLeftAction", "TurnRightAction")
    ]
    answer_actions = [AnswerAction(None, answer_id=k) for k in range(num_answers)]
    actions = nav_actions + answer_actions
    answer_base = len(nav_actions)

    sensors = [
        QuestionSensor(None),
        reg.get_sensor("PointGoalWithGPSCompassSensor")(None),
        reg.get_sensor("ObjectGoalSensor")(None),
    ]
    if visual_size is not None:
        sensors.append(
            reg.get_sensor("HabitatSimRGBSensor")(
                {"height": visual_size, "width": visual_size}
            )
        )
    measures = [
        reg.get_measure("DistanceToGoal")(None),
        EpisodeInfo(None),
        CorrectAnswer(None),
        AnswerAccuracy({"answer_base": answer_base}),
        reg.get_measure("NumSteps")(None),
    ]
    env = BatchedEnv(
        pack,
        table,
        order,
        sensors,
        measures,
        actions,
        max_episode_steps=max_episode_steps,
        reward_spec=RewardSpec(
            reward_measure="answer_accuracy",
            success_measure="answer_accuracy",
            slack_reward=-0.01,
            success_reward=10.0,
            end_on_success=True,
        ),
    )
    env.answer_base = answer_base
    return env


# ---------------------------------------------------------------------------
# Referent-grounding EQA (round 5 — weak-#9 closure for the EQA half)
# ---------------------------------------------------------------------------

EQA_COLORS = ("red", "blue", "green", "yellow")


def referent_eqa_vocab():
    """Vocabulary for the referent questions: base words + categories +
    colors (index 0 = pad)."""
    from habitat_tpu.sims.procedural import OBJECT_CATEGORIES

    words = ["what", "is", "the", "color", "of", "?"]
    words += list(OBJECT_CATEGORIES) + list(EQA_COLORS)
    return {w: i + 1 for i, w in enumerate(words)}


def make_referent_eqa(
    num_scenes: int = 4,
    episodes_per_scene: int = 64,
    seed: int = 0,
    n_objects: int = 4,
    episode_seed: int = None,
):
    """Referent EQA: each episode carries n_objects (category, color) pairs
    exposed SYMMETRICALLY in the observation; the question names ONE
    category ("what is the color of the sofa ?") and the answer is that
    object's color. Language is load-bearing by construction: colors are
    sampled independently of everything else, so without grounding the
    category word an agent caps at chance (1/len(EQA_COLORS)) — unlike
    make_procedural_eqa, whose constant question made the objectgoal
    sensor sufficient. Returns (scenes, episodes, fields, obj_rows)."""
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav
    from habitat_tpu.sims.procedural import OBJECT_CATEGORIES

    vocab = referent_eqa_vocab()
    scenes, pn_eps, fields = make_procedural_pointnav(
        num_scenes=num_scenes, episodes_per_scene=episodes_per_scene,
        seed=seed, episode_seed=episode_seed,
    )
    rng = np.random.default_rng((episode_seed or seed) + 31)
    C = len(OBJECT_CATEGORIES)
    K = n_objects
    episodes = []
    obj_rows = {}
    for ep in pn_eps:
        cats = rng.choice(C, K, replace=False)
        # colors WITHOUT replacement: with repeats, 'always answer row
        # 0's color' scores ~0.44 languagelessly (collision chance); a
        # permutation pins the no-language baseline at exactly 1/K
        cols = rng.permutation(len(EQA_COLORS))[:K]
        k = int(rng.integers(0, K))
        cat_word = OBJECT_CATEGORIES[cats[k]]
        text = f"what is the color of the {cat_word} ?"
        toks = [vocab[w] for w in text.split()]
        eid = "eqar_" + ep.episode_id
        episodes.append(
            EQAEpisode(
                episode_id=eid,
                scene_id=ep.scene_id,
                start_position=ep.start_position,
                start_rotation=ep.start_rotation,
                info=dict(ep.info),
                goals=ep.goals,
                question=QuestionData(
                    question_text=text,
                    question_tokens=toks,
                    answer_text=EQA_COLORS[cols[k]],
                    answer_token=int(cols[k]),
                    question_type="color",
                ),
            )
        )
        # (K, C + n_colors) one-hot rows, row order SHUFFLED independently
        # of which object the question names
        row = np.zeros((K, C + len(EQA_COLORS)), np.float32)
        for j in range(K):
            row[j, cats[j]] = 1.0
            row[j, C + cols[j]] = 1.0
        obj_rows[eid] = row.reshape(-1)
        fields[eid] = fields.pop(ep.episode_id)
    return scenes, episodes, fields, obj_rows


class EQAObjectsSensor(FunctionalSensor):
    """Flattened (K, n_categories + n_colors) one-hot object table —
    symmetric across objects; only the question says which row matters."""

    uuid = "eqa_objects"

    def __init__(self, config=None, dim: int = 0):
        super().__init__(config)
        self.dim = dim

    def observation_space(self):
        return spaces.Box(low=0.0, high=1.0, shape=(self.dim,), dtype=np.float32)

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        return ctx.table.extras["eqa_objects"][ctx.ep_idx]


def make_referent_eqa_env(
    num_envs: int = 64,
    num_scenes: int = 4,
    episodes_per_scene: int = 64,
    seed: int = 0,
    episode_seed: int = None,
    max_episode_steps: int = 10,
):
    """Referent-EQA env: question + object table ONLY (no objectgoal /
    pointgoal leak), nav + len(EQA_COLORS) answer actions."""
    from habitat_tpu.core.batched_env import BatchedEnv, RewardSpec
    from habitat_tpu.core.dataset import build_env_episode_order, build_episode_table
    from habitat_tpu.core.registry import registry as reg
    from habitat_tpu.sims.scene import pack_scenes

    scenes, episodes, fields, obj_rows = make_referent_eqa(
        num_scenes=num_scenes, episodes_per_scene=episodes_per_scene,
        seed=seed, episode_seed=episode_seed,
    )
    scene_index = {s.scene_id: i for i, s in enumerate(scenes)}
    scene_map = {s.scene_id: s for s in scenes}
    pack = pack_scenes(scenes)
    table = build_episode_table(
        episodes, scene_map, scene_index, precomputed_fields=fields
    )
    extras = eqa_extras(episodes)
    extras["eqa_objects"] = jnp.asarray(
        np.stack([obj_rows[ep.episode_id] for ep in episodes])
    )
    table = dataclasses.replace(table, extras=extras)
    order = build_env_episode_order(episodes, num_envs, seed=seed)

    nav_actions = [
        reg.get_task_action(n)(None)
        for n in ("MoveForwardAction", "TurnLeftAction", "TurnRightAction")
    ]
    answer_actions = [AnswerAction(None, answer_id=k) for k in range(len(EQA_COLORS))]
    actions = nav_actions + answer_actions
    answer_base = len(nav_actions)
    dim = extras["eqa_objects"].shape[-1]
    sensors = [QuestionSensor(None), EQAObjectsSensor(None, dim=dim)]
    measures = [
        reg.get_measure("DistanceToGoal")(None),
        EpisodeInfo(None),
        CorrectAnswer(None),
        AnswerAccuracy({"answer_base": answer_base}),
        reg.get_measure("NumSteps")(None),
    ]
    env = BatchedEnv(
        pack, table, order, sensors, measures, actions,
        max_episode_steps=max_episode_steps,
        reward_spec=RewardSpec(
            reward_measure="answer_accuracy",
            success_measure="answer_accuracy",
            slack_reward=-0.01,
            success_reward=10.0,
            end_on_success=True,
        ),
    )
    env.answer_base = answer_base
    return env
