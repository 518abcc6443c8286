"""Instance-image navigation dataset (reference habitat-lab/habitat/datasets/
image_nav/instance_image_nav_dataset.py + tasks/nav/instance_image_nav_task.py
episode schema: goals keyed by object instance with stored image-goal camera
parameters (position, rotation, hfov))."""

from __future__ import annotations

import dataclasses
import gzip
import json
from typing import Dict, List, Optional

import numpy as np

from habitat_tpu.core.dataset import Dataset, Episode, NavigationGoal
from habitat_tpu.core.registry import registry


@dataclasses.dataclass
class InstanceImageParameters:
    position: List[float] = dataclasses.field(default_factory=list)
    rotation: List[float] = dataclasses.field(default_factory=lambda: [0, 0, 0, 1])
    hfov: float = 90.0
    image_dimensions: tuple = (512, 512)


@dataclasses.dataclass
class InstanceImageGoal(NavigationGoal):
    object_id: str = ""
    object_category: Optional[str] = None
    image_goals: List[InstanceImageParameters] = dataclasses.field(default_factory=list)
    view_points: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class InstanceImageGoalNavEpisode(Episode):
    object_category: Optional[str] = None
    goal_object_id: str = ""
    goal_image_id: int = 0
    goals: list = dataclasses.field(default_factory=list)

    @property
    def goal_key(self) -> str:
        """reference instance_image_nav_task.py:53 — '<scene-basename minus
        .glb/.basis>_<goal_object_id>'."""
        import os

        sid = os.path.basename(self.scene_id)
        for x in (".glb", ".basis"):
            sid = sid[: -len(x)] if sid.endswith(x) else sid
        oid = self.goal_object_id or (
            self.goals[0].object_id if self.goals else ""
        )
        return f"{sid}_{oid}"


@registry.register_dataset(name="InstanceImageNav-v1")
class InstanceImageNavDatasetV1(Dataset):
    def __init__(self, config=None) -> None:
        super().__init__()
        self.goals_by_category: Dict[str, list] = {}
        if config is None:
            return
        data_path = config.data_path.format(split=config.split)
        opener = gzip.open if data_path.endswith(".gz") else open
        with opener(data_path, "rt") as f:
            self.from_json(f.read())

    def from_json(self, json_str: str, scenes_dir=None) -> None:
        data = json.loads(json_str)
        goals_by_key = {}
        for key, goals in data.get("goals", data.get("goals_by_category", {})).items():
            # reference schema maps goal_key -> ONE goal dict
            # (instance_image_nav_dataset.py:76-78); earlier repo episodes
            # used a list — accept both
            if isinstance(goals, dict):
                goals = [goals]
            goals_by_key[key] = [
                InstanceImageGoal(
                    position=list(g.get("position", [])),
                    radius=g.get("radius"),
                    object_id=str(g.get("object_id", "")),
                    object_category=g.get("object_category"),
                    image_goals=[
                        InstanceImageParameters(
                            position=list(ig.get("position", [])),
                            rotation=list(ig.get("rotation", [0, 0, 0, 1])),
                            hfov=float(ig.get("hfov", 90.0)),
                            image_dimensions=tuple(
                                ig.get("image_dimensions", (512, 512))
                            ),
                        )
                        for ig in g.get("image_goals", [])
                    ],
                    view_points=g.get("view_points", []),
                )
                for g in goals
            ]
        for ep in data.get("episodes", []):
            episode = InstanceImageGoalNavEpisode(
                episode_id=str(ep["episode_id"]),
                scene_id=ep["scene_id"],
                start_position=list(ep["start_position"]),
                start_rotation=list(ep["start_rotation"]),
                info=ep.get("info", {}),
                object_category=ep.get("object_category"),
                goal_object_id=str(ep.get("goal_object_id", "")),
                goal_image_id=int(ep.get("goal_image_id", 0)),
            )
            key = ep.get("goal_key") or episode.goal_key
            episode.goals = goals_by_key.get(key, [])
            if not episode.goals and goals_by_key:
                # fall back: match by scene prefix
                for k, v in goals_by_key.items():
                    if k.startswith(str(ep["scene_id"]).split("/")[-1]):
                        episode.goals = v
                        break
            self.episodes.append(episode)
