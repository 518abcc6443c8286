"""Rearrangement episode generation + packing.

Counterpart of the reference RearrangeEpisodeGenerator (datasets/rearrange/
rearrange_generator.py:53: scene/object/target samplers, stability settling
:938 — settling is moot in kinematic mode) and RearrangeDataset episode schema
(datasets/rearrange/rearrange_dataset.py: rigid_objs + targets as transforms).
"""

from __future__ import annotations

import dataclasses
import gzip
import json
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from habitat_tpu.core.dataset import (
    Dataset,
    Episode,
    NavigationGoal,
    NavigationEpisode,
    build_env_episode_order,
    build_episode_table,
)
from habitat_tpu.core.registry import registry
from habitat_tpu.sims.scene import SceneData, geodesic_field


@dataclasses.dataclass
class RearrangeEpisode(Episode):
    """reference RearrangeEpisode (datasets/rearrange/rearrange_dataset.py):
    rigid object inits + target transforms. Positions stand in for the 4x4
    transforms (kinematic mode ignores rotation)."""

    rigid_objs: list = dataclasses.field(default_factory=list)  # [(name, pos)]
    targets: dict = dataclasses.field(default_factory=dict)  # name -> goal pos
    markers: list = dataclasses.field(default_factory=list)
    ao_states: dict = dataclasses.field(default_factory=dict)
    target_receptacles: list = dataclasses.field(default_factory=list)
    goal_receptacles: list = dataclasses.field(default_factory=list)


@registry.register_dataset(name="RearrangeDataset-v0")
class RearrangeDatasetV0(Dataset):
    def __init__(self, config=None) -> None:
        super().__init__()
        if config is None:
            return
        data_path = config.data_path.format(split=config.split)
        opener = gzip.open if data_path.endswith(".gz") else open
        with opener(data_path, "rt") as f:
            self.from_json(f.read())

    def from_json(self, json_str: str, scenes_dir=None) -> None:
        data = json.loads(json_str)
        for ep in data.get("episodes", []):
            rigid = []
            for name, T in ep.get("rigid_objs", []):
                T = np.asarray(T)
                pos = T[:3, 3] if T.ndim == 2 else T[:3]
                rigid.append((name, [float(x) for x in pos]))
            targets = {}
            for name, T in ep.get("targets", {}).items():
                T = np.asarray(T)
                pos = T[:3, 3] if T.ndim == 2 else T[:3]
                targets[name] = [float(x) for x in pos]
            self.episodes.append(
                RearrangeEpisode(
                    episode_id=str(ep["episode_id"]),
                    scene_id=ep["scene_id"],
                    start_position=list(ep.get("start_position", [0, 0, 0])),
                    start_rotation=list(ep.get("start_rotation", [0, 0, 0, 1])),
                    info=ep.get("info", {}),
                    rigid_objs=rigid,
                    targets=targets,
                    markers=ep.get("markers", []),
                    ao_states=ep.get("ao_states", {}),
                )
            )


def generate_rearrange_episode(
    scene: SceneData,
    episode_id: str,
    rng: np.random.Generator,
    *,
    num_objects: int = 3,
    num_targets: int = 1,
    min_start_dist: float = 1.0,
    use_receptacles: bool = False,
) -> Optional[RearrangeEpisode]:
    occ = scene.nav_occ
    nav_cells = np.argwhere(occ)
    if len(nav_cells) < num_objects + 2:
        return None

    def sample_point():
        c = nav_cells[rng.integers(len(nav_cells))]
        xz = scene.cell_to_world(c)
        return [float(xz[0]), scene.floor_y, float(xz[1])]

    def sample_goal():
        # receptacle-surface goals (reference object_sampler places objects
        # on receptacles; sims/receptacles.py) with floor fallback
        if use_receptacles:
            from habitat_tpu.sims.receptacles import sample_on_receptacle

            p = sample_on_receptacle(scene, rng)
            if p is not None:
                return [float(p[0]), float(p[1]), float(p[2])]
        return sample_point()

    objs = [(f"obj_{i}", sample_point()) for i in range(num_objects)]
    target_ids = rng.choice(num_objects, size=num_targets, replace=False)
    targets = {f"obj_{i}": sample_goal() for i in target_ids}
    start = sample_point()
    tries = 0
    while (
        min(
            np.linalg.norm(np.asarray(start) - np.asarray(p))
            for _, p in objs
        )
        < min_start_dist
        and tries < 10
    ):
        start = sample_point()
        tries += 1
    yaw = float(rng.uniform(-np.pi, np.pi))
    from habitat_tpu.datasets.pointnav import _yaw_to_quat_coeffs

    return RearrangeEpisode(
        episode_id=episode_id,
        scene_id=scene.scene_id,
        start_position=start,
        start_rotation=_yaw_to_quat_coeffs(yaw),
        rigid_objs=objs,
        targets=targets,
    )


def make_procedural_rearrange(
    num_scenes: int = 2,
    episodes_per_scene: int = 8,
    seed: int = 0,
    extent: float = 8.0,
    num_objects: int = 3,
    n_rooms_per_axis: int = 2,
    n_clutter: int = 3,
    **kw,
) -> Tuple[List[SceneData], List[RearrangeEpisode]]:
    from habitat_tpu.sims.procedural import generate_apartment

    rng = np.random.default_rng(seed)
    ao_state_sampler = kw.pop("ao_state_sampler", None)
    art_objs = kw.pop("art_objs", None)
    scenes, episodes = [], []
    for s in range(num_scenes):
        scene = generate_apartment(
            seed=seed * 500 + s,
            extent=extent,
            n_clutter=n_clutter,
            n_rooms_per_axis=n_rooms_per_axis,
        )
        scenes.append(scene)
        for e in range(episodes_per_scene):
            ep = generate_rearrange_episode(
                scene, f"re_{s}_{e}", rng, num_objects=num_objects, **kw
            )
            if ep is not None:
                if ao_state_sampler is not None:
                    from habitat_tpu.tasks.rearrange.samplers import ArtObjSpec

                    aos = art_objs or [ArtObjSpec(handle=f"drawer_{s}")]
                    ep.ao_states = ao_state_sampler.sample(aos, rng)
                episodes.append(ep)
    return scenes, episodes


def settle_objects(
    obj_init: np.ndarray,  # (E,O,3)
    obj_valid: np.ndarray,  # (E,O)
    floor_y: np.ndarray,  # (E,)
    steps: int = 30,
) -> np.ndarray:
    """Stability settling at episode-generation time (reference settle_sim,
    datasets/rearrange/rearrange_generator.py:938): run the contact stepper
    until generated placements come to rest — overlapping spawns separate,
    floating spawns drop."""
    import jax
    import jax.numpy as jnp

    from habitat_tpu.tasks.rearrange.rearrange_env import contact_step

    p = jnp.asarray(obj_init, jnp.float32)
    v = jnp.zeros_like(p)
    free = jnp.asarray(obj_valid, bool)
    fy = jnp.asarray(floor_y, jnp.float32)
    agent_far = jnp.full((p.shape[0], 3), 1e6, jnp.float32)

    def body(carry, _):
        p, v = carry
        p, v, _ = contact_step(p, v, free, fy, agent_far)
        return (p, v), None

    (p, v), _ = jax.lax.scan(body, (p, v), None, length=steps)
    return np.asarray(p)


def build_rearrange_table(
    episodes: List[RearrangeEpisode],
    scenes: Dict[str, SceneData],
    scene_index: Dict[str, int],
    max_objects: Optional[int] = None,
    settle: bool = False,
    art_joint: str = "prismatic",
    art_asset=None,  # loaders.ArticulatedObjectAsset: URDF-defined joint
):
    """Pack rearrange episodes into device arrays (+ nav table whose goal is
    the pick-target object's initial position — drives nav-reward fields).

    art_asset: when given, the articulated slot's joint kind, slide/hinge
    axis, joint-origin offset, and open joint value come from the URDF's
    primary movable joint (reference: ao manager loads furniture URDFs,
    rearrange_sim.py:209-233) instead of the procedural drawer defaults.
    """
    from habitat_tpu.tasks.rearrange.rearrange_env import RearrangeTable

    E = len(episodes)
    if max_objects is None:
        max_objects = max(len(e.rigid_objs) for e in episodes)
    O = max_objects

    obj_init = np.zeros((E, O, 3), np.float32)
    obj_valid = np.zeros((E, O), bool)
    # per-object upright-OBB shape from the ASSET: deterministic in the
    # object name, the same dims the renderer draws (reference: Bullet
    # builds collision shapes from the object asset's geometry,
    # rearrange_sim.py object template managers). Episode transforms with a
    # rotation contribute the spawn yaw.
    obj_half = np.full((E, O, 3), 0.12, np.float32)
    obj_yaw = np.zeros((E, O), np.float32)
    target_pos = np.zeros((E, O, 3), np.float32)
    target_mask = np.zeros((E, O), bool)
    pick_target = np.zeros((E,), np.int32)
    A = 1  # one articulated object (drawer) per episode
    art_pos = np.zeros((E, A, 3), np.float32)
    art_axis = np.zeros((E, A, 3), np.float32)
    art_valid = np.zeros((E, A), bool)
    art_target = np.zeros((E,), np.int32)
    art_init_q = np.zeros((E,), np.float32)
    art_goal_q = np.zeros((E,), np.float32)
    art_is_revolute = np.zeros((E, A), bool)
    rng_art = np.random.default_rng(1234)
    nav_episodes = []

    import hashlib

    def _asset_dims(name: str):
        h = int(hashlib.md5(str(name).encode()).hexdigest()[:8], 16)
        r = np.random.default_rng(h)
        return (
            r.uniform(0.07, 0.16, 3).astype(np.float32),
            np.float32(r.uniform(0.0, np.pi)),
        )

    for i, ep in enumerate(episodes):
        names = []
        for j, (name, pos) in enumerate(ep.rigid_objs[:O]):
            obj_init[i, j] = pos
            obj_valid[i, j] = True
            obj_half[i, j], obj_yaw[i, j] = _asset_dims(name)
            names.append(name)
        first_target = None
        for name, goal in ep.targets.items():
            if name in names:
                j = names.index(name)
                target_pos[i, j] = goal
                target_mask[i, j] = True
                if first_target is None:
                    first_target = j
        # objects without targets keep their init as "goal" (distance 0)
        for j in range(O):
            if not target_mask[i, j]:
                target_pos[i, j] = obj_init[i, j]
        pick_target[i] = first_target if first_target is not None else 0
        # articulated drawer: placed from episode metadata when present, else
        # sampled at a navigable spot
        scene = scenes[ep.scene_id]
        markers = ep.markers if getattr(ep, "markers", None) else []
        if markers:
            m0 = markers[0]
            art_pos[i, 0] = m0.get("position", [0, 0, 0])
        else:
            p = scene.sample_navigable_point(rng_art)
            art_pos[i, 0] = p
        ang = rng_art.uniform(-np.pi, np.pi)
        art_valid[i, 0] = True
        task_kind = ep.info.get("art_task", "open")
        if art_asset is not None:
            # URDF-defined articulated object: joint kind, axis, origin and
            # open value come from the asset's primary movable joint; the
            # placement yaw rotates the object-frame axis into the world
            j = art_asset.primary
            revolute = j.joint_type == "revolute"
            ca, sa = np.cos(ang), np.sin(ang)
            axo = j.axis if not revolute else (
                # hinge about vertical: art_axis stores the DOOR DIRECTION
                # at q=0 (the env swings it about +Y); use the child box's
                # center direction, or x if degenerate
                j.box_center if np.linalg.norm(j.box_center[[0, 2]]) > 1e-5
                else np.array([1.0, 0.0, 0.0], np.float32)
            )
            axw = np.array(
                [ca * axo[0] + sa * axo[2], axo[1], -sa * axo[0] + ca * axo[2]],
                np.float32,
            )
            n = np.linalg.norm(axw[[0, 2]])
            axw = axw / max(n, 1e-6)
            axw[1] = 0.0  # furniture joints actuate in the horizontal plane
            art_axis[i, 0] = axw
            oo = j.origin
            art_pos[i, 0] = art_pos[i, 0] + np.array(
                [ca * oo[0] + sa * oo[2], oo[1], -sa * oo[0] + ca * oo[2]],
                np.float32,
            )
            open_q = float(j.upper) if j.upper > j.lower else (
                1.5 if revolute else 0.35
            )
        else:
            art_axis[i, 0] = [np.cos(ang), 0.0, np.sin(ang)]
            # fridge doors are revolute (q in radians about the vertical
            # hinge, reference open_fridge/close_fridge); drawers prismatic
            # (q meters)
            revolute = ep.info.get("art_joint", art_joint) == "revolute"
            open_q = 1.5 if revolute else 0.35
        art_is_revolute[i, 0] = revolute
        if task_kind == "close":
            art_init_q[i], art_goal_q[i] = open_q, 0.0
        else:
            art_init_q[i], art_goal_q[i] = 0.0, open_q
        # episode-declared AO states override the task default (reference
        # ArticulatedObjectStateSampler writes ao_states into the episode,
        # rearrange_sim applies them at reset; samplers.py produces them)
        if ep.ao_states:
            q0 = next(iter(next(iter(ep.ao_states.values())).values()))
            art_init_q[i] = float(q0)
        # nav goal = pick-target object start (NavToObj semantics)
        nav_episodes.append(
            NavigationEpisode(
                episode_id=ep.episode_id,
                scene_id=ep.scene_id,
                start_position=list(ep.start_position),
                start_rotation=list(ep.start_rotation),
                info=dict(ep.info),
                goals=[
                    NavigationGoal(
                        position=[float(x) for x in obj_init[i, pick_target[i]]],
                        radius=0.3,
                    )
                ],
            )
        )

    if settle:
        floor_ys = np.array(
            [scenes[ep.scene_id].floor_y for ep in episodes], np.float32
        )
        obj_init = settle_objects(obj_init, obj_valid, floor_ys)

    nav_table = build_episode_table(nav_episodes, scenes, scene_index)
    return RearrangeTable(
        nav=nav_table,
        obj_init=jnp.asarray(obj_init),
        obj_valid=jnp.asarray(obj_valid),
        obj_half=jnp.asarray(obj_half),
        obj_yaw=jnp.asarray(obj_yaw),
        target_pos=jnp.asarray(target_pos),
        target_mask=jnp.asarray(target_mask),
        pick_target=jnp.asarray(pick_target),
        art_pos=jnp.asarray(art_pos),
        art_axis=jnp.asarray(art_axis),
        art_valid=jnp.asarray(art_valid),
        art_target=jnp.asarray(art_target),
        art_init_q=jnp.asarray(art_init_q),
        art_goal_q=jnp.asarray(art_goal_q),
        art_is_revolute=jnp.asarray(art_is_revolute),
    )


def make_rearrange_env(
    num_envs: int = 4,
    task: str = "pick",
    art_joint: str = "prismatic",
    art_urdf: Optional[str] = None,  # URDF path for the articulated object
    num_scenes: int = 2,
    episodes_per_scene: int = 8,
    seed: int = 0,
    with_visual: bool = True,
    render_size=(128, 128),
    n_rooms_per_axis: int = 2,
    n_clutter: int = 3,
    num_objects: int = 3,
    **env_kw,
):
    from habitat_tpu.sims.scene import pack_scenes
    from habitat_tpu.tasks.rearrange.rearrange_env import RearrangeBatchedEnv

    scenes, episodes = make_procedural_rearrange(
        num_scenes=num_scenes,
        episodes_per_scene=episodes_per_scene,
        seed=seed,
        n_rooms_per_axis=n_rooms_per_axis,
        n_clutter=n_clutter,
        num_objects=num_objects,
    )
    scene_index = {s.scene_id: i for i, s in enumerate(scenes)}
    scene_map = {s.scene_id: s for s in scenes}
    pack = pack_scenes(scenes)
    # contact dynamics: settle generated placements (reference settle_sim)
    art_asset = None
    if art_urdf is not None:
        from habitat_tpu.sims.loaders import load_articulated_object

        art_asset = load_articulated_object(art_urdf)
    table = build_rearrange_table(
        episodes, scene_map, scene_index,
        settle=env_kw.get("dynamics") == "contacts",
        art_joint=art_joint,
        art_asset=art_asset,
    )
    order = build_env_episode_order(episodes, num_envs, seed=seed)
    return RearrangeBatchedEnv(
        pack,
        table,
        order,
        task=task,
        with_visual=with_visual,
        render_size=render_size,
        **env_kw,
    )
