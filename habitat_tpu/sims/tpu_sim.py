"""TpuSim — the registered "Sim-v0": host-facing Simulator over the TPU engine.

Counterpart of HabitatSim (reference sims/habitat_simulator/
habitat_simulator.py:270): translates lab config → engine state, owns the
sensor suite, serves pathfinder-style queries. Where the reference wraps C++
habitat-sim, this wraps the ScenePack + raycast/navgrid kernels: single-agent
host API for parity (examples, Benchmark, user agents), while the batched hot
path goes through core/batched_env.py directly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from habitat_tpu.core.registry import registry
from habitat_tpu.core.simulator import AgentState, Simulator
from habitat_tpu.ops import navgrid as ng
from habitat_tpu.ops.raycast import render_batch
from habitat_tpu.sims.scene import INF_DIST, SceneData, geodesic_field, pack_scenes


class HabitatSimActions:
    """Extensible action-name→index singleton (reference
    sims/habitat_simulator/actions.py:17-91)."""

    _map: Dict[str, int] = {}

    @classmethod
    def extend_action_space(cls, name: str) -> int:
        assert name not in cls._map, f"action {name} already registered"
        cls._map[name] = len(cls._map)
        return cls._map[name]

    @classmethod
    def has_action(cls, name: str) -> bool:
        return name in cls._map

    @classmethod
    def __class_getitem__(cls, name: str) -> int:
        return cls._map[name]

    @classmethod
    def get(cls, name: str) -> int:
        return cls._map[name]


for _a in ("stop", "move_forward", "turn_left", "turn_right", "look_up", "look_down"):
    HabitatSimActions.extend_action_space(_a)


@registry.register_simulator(name="Sim-v0")
class TpuSim(Simulator):
    def __init__(self, config: Any = None, scene: Optional[SceneData] = None):
        self.habitat_config = config
        if scene is None:
            from habitat_tpu.sims.procedural import generate_apartment

            scene_name = "procedural"
            if config is not None:
                scene_name = getattr(config, "scene", "procedural") or "procedural"
            if scene_name.startswith("procedural"):
                seed = 0
                if ":" in scene_name:
                    seed = int(scene_name.split(":")[1])
                scene = generate_apartment(seed=seed)
            else:
                from habitat_tpu.sims.loaders import load_scene

                scene = load_scene(scene_name)
        self._scene = scene
        self.pack = pack_scenes([scene])
        self._fwd_step = float(getattr(config, "forward_step_size", 0.25) if config else 0.25)
        self._turn = np.deg2rad(float(getattr(config, "turn_angle", 10) if config else 10))
        self._tilt = np.deg2rad(float(getattr(config, "tilt_angle", 15) if config else 15))
        self._pos = np.array([0.0, 0.0, 0.0], np.float32)
        self._yaw = 0.0
        self._pitch = 0.0
        self._collided = False
        self._rng = np.random.default_rng(0)
        self._sensor_cfgs = self._collect_sensor_cfgs(config)
        # jitted sliding step (the eager op-by-op try_step cost ~190 ms on
        # CPU — the HITL interactive loop needs milliseconds)
        import functools as _ft

        self._jit_try_step = jax.jit(
            _ft.partial(ng.try_step, self.pack, jnp.int32(0))
        )
        self._field_cache: Dict[Any, np.ndarray] = {}
        self._semantic_scene = None
        self.reset()

    def semantic_annotations(self):
        """SemanticScene hierarchy (levels > regions > objects) built from
        the scene's annotations — reference habitat_simulator.py:249-257
        returns habitat-sim's parsed .semantic.json/.house equivalent."""
        if self._semantic_scene is None:
            from habitat_tpu.sims.semantic_scene import build_semantic_scene

            self._semantic_scene = build_semantic_scene(self._scene)
        return self._semantic_scene

    @property
    def semantic_scene(self):
        return self.semantic_annotations()

    # -- config ----------------------------------------------------------
    def _collect_sensor_cfgs(self, config):
        out = {}
        try:
            agents = config.agents
            for name in config.agents_order or sorted(agents):
                for uuid, c in agents[name].sim_sensors.items():
                    out[c["type"]] = c
        except Exception:
            out = {
                "HabitatSimRGBSensor": {"height": 128, "width": 128},
                "HabitatSimDepthSensor": {"height": 128, "width": 128},
            }
        return out

    # -- core API ----------------------------------------------------------
    def reset(self):
        self._pos = np.asarray(self._scene.sample_navigable_point(self._rng))
        self._yaw = float(self._rng.uniform(-np.pi, np.pi))
        self._pitch = 0.0
        self._collided = False
        return self._observations()

    def step(self, action, *args, **kwargs):
        if isinstance(action, dict):
            name = action.get("action")
            args_ = action.get("action_args", {}) or {}
            if name in ("teleport", "TELEPORT"):
                self._pos = np.asarray(args_["position"], np.float32)
                if "rotation" in args_:
                    x, y, z, w = args_["rotation"]
                    self._yaw = float(2.0 * np.arctan2(y, w))
                return self._observations()
            if name in ("velocity_control", "VELOCITY_CONTROL"):
                lin = float(args_.get("lin_vel", args_.get("linear_velocity", 0.0)))
                ang = float(np.deg2rad(args_.get("ang_vel", args_.get("angular_velocity", 0.0))))
                dt = float(args_.get("time_step", 1.0))
                # integrate: rotate then translate (reference VelocityControl)
                self._yaw += ang * dt
                fwd = np.array([-np.sin(self._yaw), 0.0, -np.cos(self._yaw)], np.float32)
                target = self._pos + fwd * lin * dt
                import jax.numpy as _jnp
                new_pos, collided = self._jit_try_step(
                    _jnp.asarray(self._pos, _jnp.float32),
                    _jnp.asarray(target, _jnp.float32),
                )
                self._pos = np.asarray(new_pos)
                self._collided = bool(collided)
                return self._observations()
            action = name
        if isinstance(action, str):
            action = HabitatSimActions.get(action)
        if action == HabitatSimActions.get("move_forward"):
            fwd = np.array(
                [-np.sin(self._yaw), 0.0, -np.cos(self._yaw)], np.float32
            )
            target = self._pos + fwd * self._fwd_step
            new_pos, collided = self._jit_try_step(
                jnp.asarray(self._pos, jnp.float32),
                jnp.asarray(target, jnp.float32),
            )
            self._pos = np.asarray(new_pos)
            self._collided = bool(collided)
        elif action == HabitatSimActions.get("turn_left"):
            self._yaw += self._turn
        elif action == HabitatSimActions.get("turn_right"):
            self._yaw -= self._turn
        elif action == HabitatSimActions.get("look_up"):
            self._pitch = min(self._pitch + self._tilt, np.pi / 2)
        elif action == HabitatSimActions.get("look_down"):
            self._pitch = max(self._pitch - self._tilt, -np.pi / 2)
        return self._observations()

    def _observations(self):
        h = w = 128
        min_d, max_d, norm = 0.0, 10.0, True
        for t, c in self._sensor_cfgs.items():
            h = int(c.get("height", 128))
            w = int(c.get("width", 128))
            if t == "HabitatSimDepthSensor":
                min_d = float(c.get("min_depth", 0.0))
                max_d = float(c.get("max_depth", 10.0))
                norm = bool(c.get("normalize_depth", True))
        cam = self._pos + np.array([0.0, 1.25, 0.0], np.float32)
        # jit the per-step render once (static camera model): the eager
        # op-by-op path cost ~300 ms/frame on CPU — far below the 30 SPS
        # interactive target the HITL loop serves
        key = (h, w, min_d, max_d, norm)
        if getattr(self, "_jit_render_key", None) != key:
            import functools as _ft

            self._jit_render = jax.jit(
                _ft.partial(
                    render_batch,
                    height=h,
                    width=w,
                    min_depth=min_d,
                    max_depth=max_d,
                    normalize_depth=norm,
                )
            )
            self._jit_render_key = key
        out = self._jit_render(
            self.pack,
            jnp.zeros((1,), jnp.int32),
            jnp.asarray(cam, jnp.float32)[None],
            jnp.asarray(self._yaw, jnp.float32)[None],
            jnp.asarray(self._pitch, jnp.float32)[None],
        )
        obs = {k: np.asarray(v[0]) for k, v in out.items()}
        return obs

    def get_observations_at(
        self, position=None, rotation=None, keep_agent_at_new_pose=False
    ):
        old = (self._pos.copy(), self._yaw, self._pitch)
        if position is not None:
            self._pos = np.asarray(position, np.float32)
        if rotation is not None:
            x, y, z, w = rotation
            self._yaw = float(2.0 * np.arctan2(y, w))
        obs = self._observations()
        if not keep_agent_at_new_pose:
            self._pos, self._yaw, self._pitch = old
        return obs

    # -- agent state -------------------------------------------------------
    def get_agent_state(self, agent_id: int = 0) -> AgentState:
        yaw = self._yaw
        rot = np.array([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)], np.float32)
        return AgentState(position=self._pos.copy(), rotation=rot)

    def set_agent_state(
        self, position, rotation, agent_id: int = 0, reset_sensors: bool = True
    ) -> bool:
        self._pos = np.asarray(position, np.float32)
        x, y, z, w = rotation
        self._yaw = float(2.0 * np.arctan2(y, w))
        return True

    # -- pathfinder queries (reference habitat_simulator.py:528-709) --------
    def _goal_field(self, goals) -> np.ndarray:
        key = tuple(tuple(np.round(np.asarray(g), 3)) for g in goals)
        if key not in self._field_cache:
            cells = np.asarray(
                [self._scene.world_to_cell(np.asarray(g)[[0, 2]]) for g in goals]
            )
            self._field_cache[key] = geodesic_field(
                self._scene.nav_occ, cells, self._scene.nav_res
            )
        return self._field_cache[key]

    def geodesic_distance(self, position_a, position_b, episode=None) -> float:
        pb = np.asarray(position_b, dtype=np.float64)
        goals = pb[None] if pb.ndim == 1 else pb
        field = self._goal_field(list(goals))
        c = self._scene.world_to_cell(np.asarray(position_a)[[0, 2]])
        nx, nz = field.shape
        if not (0 <= c[0] < nx and 0 <= c[1] < nz):
            return float("inf")
        d = float(field[c[0], c[1]])
        return float("inf") if d >= INF_DIST else d

    def sample_navigable_point(self) -> List[float]:
        return list(map(float, self._scene.sample_navigable_point(self._rng)))

    def is_navigable(self, point) -> bool:
        return self._scene.is_navigable(np.asarray(point))

    def island_radius(self, position) -> float:
        """Approximate island radius: obstacle-distance at the point's island
        (reference habitat_simulator.py:708)."""
        c = self._scene.world_to_cell(np.asarray(position)[[0, 2]])
        nx, nz = self._scene.obst_dist.shape
        if not (0 <= c[0] < nx and 0 <= c[1] < nz):
            return 0.0
        return float(self._scene.obst_dist[c[0], c[1]])

    def distance_to_closest_obstacle(self, position, max_search_radius: float = 2.0):
        return min(self.island_radius(position), max_search_radius)

    def get_straight_shortest_path_points(self, position_a, position_b):
        field = self._goal_field([np.asarray(position_b)])
        pts = [list(map(float, position_a))]
        pos = np.asarray(position_a, np.float64)
        res = self._scene.nav_res
        for _ in range(10000):
            c = self._scene.world_to_cell(pos[[0, 2]])
            if field[c[0], c[1]] <= res:
                break
            # descend the field
            best, bestd = None, field[c[0], c[1]]
            for dx in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    i, k = c[0] + dx, c[1] + dz
                    if 0 <= i < field.shape[0] and 0 <= k < field.shape[1]:
                        if field[i, k] < bestd:
                            bestd, best = field[i, k], (i, k)
            if best is None:
                break
            xz = self._scene.cell_to_world(np.asarray(best))
            pos = np.array([xz[0], pos[1], xz[1]])
            pts.append([float(pos[0]), float(pos[1]), float(pos[2])])
        pts.append(list(map(float, position_b)))
        return pts

    def previous_step_collided(self) -> bool:
        return self._collided

    def seed(self, seed: int) -> None:
        self._rng = np.random.default_rng(seed)

    def reconfigure(self, config: Any) -> None:
        self.habitat_config = config

    @property
    def up_vector(self):
        return np.array([0.0, 1.0, 0.0])

    @property
    def forward_vector(self):
        return np.array([0.0, 0.0, -1.0])
