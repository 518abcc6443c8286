"""Episodes, datasets, iterators — host API parity + device episode tables.

Host side mirrors the reference surface (habitat-lab/habitat/core/dataset.py):
``Episode`` (:57), ``Dataset`` (:111 — get_splits:231, filter_episodes:216,
get_scenes_to_load:126) and ``EpisodeIterator`` (:329 — cycle / shuffle /
group-by-scene / max-scene-repeat with jittered switch).

TPU side adds ``EpisodeTable``: all episodes packed into HBM-resident arrays so
episode advance/reset happens inside jit with zero host round trips — the
device-side replacement for the per-worker python iterator
(SURVEY §7 step 3).
"""

from __future__ import annotations

import copy
import dataclasses
from collections import deque
from typing import Any, Callable, Dict, Generic, Iterator, List, Optional, Sequence, TypeVar

import numpy as np

import jax.numpy as jnp
import jax.tree_util as jtu

ALL_SCENES_MASK = "*"


@dataclasses.dataclass
class BaseEpisode:
    episode_id: str
    scene_id: str


@dataclasses.dataclass
class Episode(BaseEpisode):
    """An episode spec: scene + initial agent state (+ task extras).

    start_rotation is quaternion coeffs [x, y, z, w] (reference convention,
    nav.py:90).
    """

    start_position: List[float] = dataclasses.field(default_factory=list)
    start_rotation: List[float] = dataclasses.field(default_factory=lambda: [0, 0, 0, 1])
    info: Dict[str, Any] = dataclasses.field(default_factory=dict)
    _shortest_path_cache: Any = None

    @property
    def start_yaw(self) -> float:
        """Heading angle about +y recovered from the quaternion."""
        x, y, z, w = self.start_rotation
        # yaw of quaternion assumed to be a pure y rotation
        return float(2.0 * np.arctan2(y, w))


@dataclasses.dataclass
class NavigationGoal:
    position: List[float] = dataclasses.field(default_factory=list)
    radius: Optional[float] = None


@dataclasses.dataclass
class NavigationEpisode(Episode):
    goals: List[NavigationGoal] = dataclasses.field(default_factory=list)
    start_room: Optional[str] = None
    shortest_paths: Optional[List[Any]] = None

    def __setattr__(self, name: str, value: Any) -> None:
        # assigning new goals invalidates the cached shortest path (the
        # reference ties the cache's lifetime to the goal list; its
        # test_dataset.py::test_reset_goals pins this contract)
        object.__setattr__(self, name, value)
        if name == "goals" and getattr(self, "_shortest_path_cache", None) is not None:
            object.__setattr__(self, "_shortest_path_cache", None)


T = TypeVar("T", bound=Episode)


class Dataset(Generic[T]):
    """Collection of episodes + splits/filtering (reference dataset.py:111)."""

    episodes: List[T]

    def __init__(self, episodes: Optional[List[T]] = None) -> None:
        self.episodes = episodes or []

    @property
    def scene_ids(self) -> List[str]:
        return sorted({episode.scene_id for episode in self.episodes})

    def scene_from_scene_path(self, scene_path: str) -> str:
        return scene_path.split("/")[-1].split(".")[0]

    def get_scene_episodes(self, scene_id: str) -> List[T]:
        return [e for e in self.episodes if e.scene_id == scene_id]

    def get_episodes(self, indexes: Sequence[int]) -> List[T]:
        return [self.episodes[i] for i in indexes]

    def filter_episodes(self, filter_fn: Callable[[T], bool]) -> "Dataset":
        """New dataset with episodes passing filter_fn (reference :216)."""
        new = copy.copy(self)
        new.episodes = [e for e in self.episodes if filter_fn(e)]
        return new

    def get_splits(
        self,
        num_splits: int,
        episodes_allowed: Optional[Sequence[str]] = None,
        collate_scene_ids: bool = True,
        sort_by_episode_id: bool = False,
        allow_uneven_splits: bool = False,
    ) -> List["Dataset"]:
        """Split into num_splits datasets (reference :231): used for sharding
        episodes across rollout workers / data-parallel replicas."""
        if episodes_allowed is not None:
            allowed = set(episodes_allowed)
            eps = [e for e in self.episodes if e.episode_id in allowed]
        else:
            eps = list(self.episodes)
        if collate_scene_ids:
            eps.sort(key=lambda e: e.scene_id)
        if sort_by_episode_id:
            eps.sort(key=lambda e: e.episode_id)
        n = len(eps)
        if not allow_uneven_splits:
            n = (n // num_splits) * num_splits
        splits: List[Dataset] = []
        for i in range(num_splits):
            new = copy.copy(self)
            new.episodes = eps[i:n:num_splits]
            splits.append(new)
        return splits

    def get_scenes_to_load(self) -> List[str]:
        return self.scene_ids

    def get_episode_iterator(self, *args, **kwargs) -> "EpisodeIterator":
        return EpisodeIterator(self.episodes, *args, **kwargs)


class EpisodeIterator(Iterator[T]):
    """Cycling episode scheduler with scene-grouped ordering and forced scene
    rotation.

    Reproduces the *semantics* of the reference iterator (reference
    core/dataset.py:329-584: cycle / shuffle / group-by-scene /
    max-scene-repeat by episode count or by jittered step count) with a
    different mechanism: instead of chained ``itertools`` iterators, the
    pending order for the current cycle lives in an explicit ``deque`` and all
    randomness flows through one private ``numpy.random.Generator`` (the same
    idiom as :func:`build_env_episode_order`). Scheduling rules:

    * Episodes are (optionally) shuffled each cycle, then stably reordered so
      that each scene's episodes form one contiguous block, blocks ordered by
      first appearance.
    * After ``max_scene_repeat_episodes`` consecutive episodes — or once
      ``max_scene_repeat_steps`` env steps (jittered by
      ``±step_repetition_range``, re-drawn after every forced switch, so
      parallel workers decorrelate) have been taken — in one scene, the
      leading run of same-scene episodes still pending is rotated to the back
      of the deque, so the next episode comes from a different scene.
    * Pulling an episode from a *different* scene than the previous pull
      resets both counters; the episode/step budget is per contiguous scene
      run, not per scene globally.
    """

    def __init__(
        self,
        episodes: Sequence[T],
        cycle: bool = True,
        shuffle: bool = False,
        group_by_scene: bool = True,
        max_scene_repeat_episodes: int = -1,
        max_scene_repeat_steps: int = -1,
        num_episode_sample: int = -1,
        step_repetition_range: float = 0.2,
        seed: Optional[int] = None,
    ) -> None:
        self._rng = np.random.default_rng(seed)
        pool = list(episodes)
        if num_episode_sample >= 0:
            if num_episode_sample > len(pool):
                raise ValueError(
                    f"num_episode_sample {num_episode_sample} > episode count "
                    f"{len(pool)}"
                )
            picks = self._rng.choice(len(pool), num_episode_sample, replace=False)
            pool = [pool[i] for i in picks]
        self.cycle = cycle
        self.shuffle = shuffle
        self.group_by_scene = group_by_scene
        self.max_scene_repetition_episodes = max_scene_repeat_episodes
        self.max_scene_repetition_steps = max_scene_repeat_steps
        self.step_repetition_range = step_repetition_range
        # `episodes` is the current cycle's base ordering (shuffled/grouped at
        # construction and again at each cycle boundary); forced-switch
        # rotation only reorders the in-flight deque, never this list.
        self.episodes: List[T] = self._ordered(pool, shuffle=shuffle)
        self._pending: deque = deque(self.episodes)
        self._scene_now: Optional[str] = None
        self._episodes_in_scene = 0
        self._steps_in_scene = 0
        self._draw_step_quota()

    # -- ordering ----------------------------------------------------------

    def _ordered(self, pool: Sequence[T], shuffle: bool) -> List[T]:
        out = list(pool)
        if shuffle:
            out = [out[i] for i in self._rng.permutation(len(out))]
        if self.group_by_scene:
            first_seen: Dict[str, int] = {}
            for e in out:
                first_seen.setdefault(e.scene_id, len(first_seen))
            out.sort(key=lambda e: first_seen[e.scene_id])  # stable
        return out

    def _rotate_leading_run(self) -> None:
        """Move the pending deque's leading same-scene run to its back, so the
        next pull (if any scene variety remains) changes scene."""
        if not self._pending:
            return
        lead = self._pending[0].scene_id
        run: List[T] = []
        while self._pending and self._pending[0].scene_id == lead:
            run.append(self._pending.popleft())
        if self._pending:
            self._pending.extend(run)
        else:
            self._pending.extendleft(reversed(run))  # single scene: no-op

    # -- iteration ---------------------------------------------------------

    def __iter__(self) -> "EpisodeIterator":
        return self

    def __next__(self) -> T:
        if self._quota_hit():
            self._rotate_leading_run()
            self._draw_step_quota()
        if not self._pending:
            if not self.cycle:
                raise StopIteration
            if self.shuffle:
                self.episodes = self._ordered(self.episodes, shuffle=True)
            self._pending = deque(self.episodes)
            if not self._pending:
                raise StopIteration
        ep = self._pending.popleft()
        if self._scene_now is not None and ep.scene_id != self._scene_now:
            self._episodes_in_scene = 0
            self._steps_in_scene = 0
        self._scene_now = ep.scene_id
        self._episodes_in_scene += 1
        return ep

    # -- budgets -----------------------------------------------------------

    def _quota_hit(self) -> bool:
        if (
            self.max_scene_repetition_episodes > 0
            and self._episodes_in_scene >= self.max_scene_repetition_episodes
        ):
            return True
        return (
            self._step_quota is not None
            and self._steps_in_scene >= self._step_quota
        )

    def _draw_step_quota(self) -> None:
        """(Re)draw the jittered step budget for the upcoming scene run."""
        if self.max_scene_repetition_steps > 0:
            v, r = self.max_scene_repetition_steps, self.step_repetition_range
            self._step_quota: Optional[int] = int(
                self._rng.integers(int(v * (1 - r)), int(v * (1 + r)) + 1)
            )
        else:
            self._step_quota = None

    def step_taken(self) -> None:
        self._steps_in_scene += 1


# ---------------------------------------------------------------------------
# Device-side episode table
# ---------------------------------------------------------------------------

MAX_GOALS_DEFAULT = 1


@dataclasses.dataclass
class EpisodeTable:
    """All episodes packed as device arrays; indexed inside jit by episode id.

    ``dist_field`` holds the per-episode multi-goal geodesic distance-to-goal
    field (min over goals, precomputed on the navgrid), replacing the per-call
    MultiGoalShortestPath + per-episode cache in the reference
    (habitat_simulator.py:528-554).
    """

    scene_idx: jnp.ndarray  # (E,) int32 index into ScenePack
    start_pos: jnp.ndarray  # (E,3) f32
    start_yaw: jnp.ndarray  # (E,) f32
    goal_pos: jnp.ndarray  # (E,G,3) f32
    goal_valid: jnp.ndarray  # (E,G) bool
    geodesic_start: jnp.ndarray  # (E,) f32 — start-to-goal geodesic (SPL denom)
    dist_field: jnp.ndarray  # (E,NX,NZ) f16 — geodesic distance-to-goal
    object_category: jnp.ndarray  # (E,) int32 — objectnav goal category (-1: n/a)
    goal_image: jnp.ndarray  # (E,Hg,Wg,3) u8 — imagegoal renders ((E,1,1,3) if unused)
    extras: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)
    # task-specific per-episode arrays (EQA question tokens/answers, VLN
    # instruction tokens, ...) — sensors index extras[key][ep_idx]

    @property
    def num_episodes(self) -> int:
        return int(self.scene_idx.shape[0])


def _table_flatten(t: EpisodeTable):
    return (
        t.scene_idx,
        t.start_pos,
        t.start_yaw,
        t.goal_pos,
        t.goal_valid,
        t.geodesic_start,
        t.dist_field,
        t.object_category,
        t.goal_image,
        t.extras,
    ), None


def _table_unflatten(aux, children):
    return EpisodeTable(*children)


jtu.register_pytree_node(EpisodeTable, _table_flatten, _table_unflatten)


def build_episode_table(
    episodes: Sequence[NavigationEpisode],
    scenes: Dict[str, Any],  # scene_id -> SceneData
    scene_index: Dict[str, int],
    grid_shape: Optional[tuple] = None,
    max_goals: int = MAX_GOALS_DEFAULT,
    field_dtype=jnp.float16,
    precomputed_fields: Optional[Dict[str, np.ndarray]] = None,
    goal_image_size: Optional[int] = None,
) -> EpisodeTable:
    """Pack episodes + precompute per-episode geodesic fields (host).

    precomputed_fields: optional episode_id -> field map (e.g. from the
    procedural generator, which already ran the geodesic solve).
    """
    from habitat_tpu.sims.scene import geodesic_field

    E = len(episodes)
    if grid_shape is None:
        nx = max(scenes[sid].nav_occ.shape[0] for sid in scene_index)
        nz = max(scenes[sid].nav_occ.shape[1] for sid in scene_index)
        grid_shape = (nx, nz)
    nx, nz = grid_shape

    scene_idx = np.zeros((E,), np.int32)
    start_pos = np.zeros((E, 3), np.float32)
    start_yaw = np.zeros((E,), np.float32)
    goal_pos = np.zeros((E, max_goals, 3), np.float32)
    goal_valid = np.zeros((E, max_goals), bool)
    geo_start = np.zeros((E,), np.float32)
    fields = np.zeros((E, nx, nz), np.float32)
    obj_cat = np.full((E,), -1, np.int32)
    goal_cells: List[np.ndarray] = []

    for i, ep in enumerate(episodes):
        scene = scenes[ep.scene_id]
        scene_idx[i] = scene_index[ep.scene_id]
        start_pos[i] = np.asarray(ep.start_position, np.float32)
        start_yaw[i] = ep.start_yaw
        goals = ep.goals[:max_goals]
        cells = []
        for g, goal in enumerate(goals):
            goal_pos[i, g] = np.asarray(goal.position, np.float32)
            goal_valid[i, g] = True
            cells.append(scene.world_to_cell(np.asarray(goal.position)[[0, 2]]))
        if precomputed_fields is not None and ep.episode_id in precomputed_fields:
            f = precomputed_fields[ep.episode_id]
        else:
            f = geodesic_field(scene.nav_occ, np.asarray(cells), scene.nav_res)
        gx, gz = f.shape
        fields[i, :gx, :gz] = f
        fields[i, gx:, :] = 1e6
        fields[i, :, gz:] = 1e6
        # keep within float16 range (6e4 ~ "unreachable" at scene scale)
        np.minimum(fields[i], 6.0e4, out=fields[i])
        sc = scene.world_to_cell(start_pos[i][[0, 2]])
        geo = ep.info.get("geodesic_distance")
        geo_start[i] = geo if geo is not None else f[sc[0], sc[1]]
        cat = ep.info.get("object_category_id")
        if cat is not None:
            obj_cat[i] = cat
        goal_cells.append(np.asarray(cells[0]) if cells else np.zeros(2, np.int64))

    if goal_image_size:
        goal_imgs = _render_goal_images(
            episodes, scenes, scene_index, goal_image_size
        )
    else:
        goal_imgs = np.zeros((E, 1, 1, 3), np.uint8)

    return EpisodeTable(
        scene_idx=jnp.asarray(scene_idx),
        start_pos=jnp.asarray(start_pos),
        start_yaw=jnp.asarray(start_yaw),
        goal_pos=jnp.asarray(goal_pos),
        goal_valid=jnp.asarray(goal_valid),
        geodesic_start=jnp.asarray(geo_start),
        dist_field=jnp.asarray(fields, dtype=field_dtype),
        object_category=jnp.asarray(obj_cat),
        goal_image=jnp.asarray(goal_imgs),
    )


def _render_goal_images(episodes, scenes, scene_index, size: int) -> np.ndarray:
    """One-time render of goal views for ImageGoalSensor (reference
    tasks/nav/nav.py:210 ImageGoalSensor renders the goal from a
    per-episode pseudo-random heading seeded by episode_id)."""
    import jax
    from habitat_tpu.ops.raycast import render_batch
    from habitat_tpu.sims.scene import pack_scenes

    scene_list = sorted(scene_index, key=lambda k: scene_index[k])
    pack = pack_scenes([scenes[sid] for sid in scene_list])
    E = len(episodes)
    sids = np.asarray([scene_index[e.scene_id] for e in episodes], np.int32)

    def _goal_view(e):
        """(cam_pos, yaw): InstanceImageNav episodes carry stored goal-view
        camera parameters (reference instance_image_nav_task.py
        InstanceImageParameters — position + rotation quat); plain ImageGoal
        uses the goal point + an episode-seeded heading (nav.py:210)."""
        g = e.goals[0] if e.goals else None
        img_goals = getattr(g, "image_goals", None)
        if img_goals:
            p = img_goals[int(getattr(e, "goal_image_id", 0)) % len(img_goals)]
            x, y, z, w = p.rotation
            yaw = float(np.arctan2(2 * (w * y + x * z), 1 - 2 * (y * y + x * x)))
            return np.asarray(p.position, np.float32), yaw
        gp = np.asarray(g.position, np.float32)
        yaw = np.random.RandomState(abs(hash(e.episode_id)) % (2**31)).uniform(
            0, 2 * np.pi
        )
        return gp + np.array([0.0, 1.25, 0.0], np.float32), float(yaw)

    views = [_goal_view(e) for e in episodes]
    cam = np.stack([v[0] for v in views])
    yaws = np.asarray([v[1] for v in views], np.float32)
    out = jax.jit(
        lambda s, c, y, p: render_batch(
            pack, s, c, y, p, height=size, width=size, backend="xla"
        )
    )(
        jnp.asarray(sids),
        jnp.asarray(cam),
        jnp.asarray(yaws),
        jnp.zeros((E,), jnp.float32),
    )
    return np.asarray(out["rgb"])


def build_env_episode_order(
    episodes: Sequence[Episode],
    num_envs: int,
    *,
    group_by_scene: bool = True,
    shuffle: bool = True,
    seed: int = 0,
) -> np.ndarray:
    """(num_envs, L) int32 episode-index schedule reproducing the reference's
    scene-split strategy (habitat_env_factory.py:48-69: scenes round-robin over
    workers) + per-worker shuffled cycling (EpisodeIterator semantics).

    Env i plays order[i, k % L] as its k-th episode.
    """
    rng = np.random.default_rng(seed)
    by_scene: Dict[str, List[int]] = {}
    for idx, e in enumerate(episodes):
        by_scene.setdefault(e.scene_id, []).append(idx)
    scene_list = sorted(by_scene)

    env_eps: List[List[int]] = [[] for _ in range(num_envs)]
    if group_by_scene and len(scene_list) >= num_envs:
        # round-robin scenes over envs; each env owns its scenes' episodes
        for j, sid in enumerate(scene_list):
            env_eps[j % num_envs].extend(by_scene[sid])
    else:
        # fewer scenes than envs: every env cycles all episodes (reference
        # behavior when a worker gets multiple scenes collapses similarly)
        for i in range(num_envs):
            env_eps[i] = list(range(len(episodes)))

    L = max(len(x) for x in env_eps)
    order = np.zeros((num_envs, L), np.int32)
    for i, eps in enumerate(env_eps):
        eps = np.asarray(eps, np.int32)
        if shuffle:
            eps = rng.permutation(eps)
        # tile to L
        reps = int(np.ceil(L / len(eps)))
        order[i] = np.tile(eps, reps)[:L]
    return order
