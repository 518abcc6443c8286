"""Navigation task: sensors, measures, actions (functional, batched).

Re-implements the reference nav stack (habitat-lab/habitat/tasks/nav/nav.py)
as pure batched functions over a StepContext:

- sensors: PointGoalSensor (:107, math at _compute_pointgoal:160-192),
  IntegratedPointGoalGPSAndCompassSensor (:287), HeadingSensor (:327),
  EpisodicCompassSensor (:373), EpisodicGPSSensor (:398),
  ProximitySensor (:456), plus visual rgb/depth/semantic
  (sims/habitat_simulator/habitat_simulator.py:106-258) rendered by the
  raycaster.
- measures: Success (:502), SPL (:546), SoftSPL (:611), Collisions (:658),
  DistanceToGoal (:938), DistanceToGoalReward (:1001), NumStepsMeasure.
- actions: stop/move_forward/turn_left/turn_right/look_up/look_down
  (:1059-1121) using the sliding collision filter in ops/navgrid.

Registered names match the reference so YAML ``type:`` strings resolve.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

import jax.numpy as jnp
from gymnasium import spaces

from habitat_tpu.core.embodied_task import (
    FunctionalAction,
    FunctionalMeasure,
    FunctionalSensor,
    StepContext,
)
from habitat_tpu.core.registry import registry
from habitat_tpu.sims.scene import INF_DIST
from habitat_tpu.utils.geometry import rotate_world_to_agent


def _cfg(config, name, default):
    if config is None:
        return default
    if isinstance(config, dict):
        return config.get(name, default)
    return getattr(config, name, default)


# ---------------------------------------------------------------------------
# distance-field lookups over the episode table (fused gathers, no per-env
# field materialization)
# ---------------------------------------------------------------------------


def table_distance_at(ctx: StepContext, pos: jnp.ndarray) -> jnp.ndarray:
    """Geodesic distance-to-goal at world pos (N,3) -> (N,).

    min over the 4 surrounding cells of field + euclidean offset — robust near
    walls (bilinear against INF neighbors would poison the value). Single
    fused gather of 4 corners per env.
    """
    lo = ctx.pack.nav_lo[ctx.sid]  # (N,2)
    res = ctx.pack.nav_res
    field = ctx.table.dist_field  # (E,NX,NZ)
    nx, nz = field.shape[-2], field.shape[-1]
    cf = (pos[:, jnp.array([0, 2])] - lo) / res  # (N,2) float cells
    c0 = jnp.floor(cf).astype(jnp.int32)
    best = jnp.full(pos.shape[:1], INF_DIST, jnp.float32)
    for di in (0, 1):
        for dk in (0, 1):
            ci = jnp.clip(c0[:, 0] + di, 0, nx - 1)
            ck = jnp.clip(c0[:, 1] + dk, 0, nz - 1)
            d = field[ctx.ep_idx, ci, ck].astype(jnp.float32)
            off = (
                jnp.sqrt(
                    (cf[:, 0] - ci.astype(jnp.float32)) ** 2
                    + (cf[:, 1] - ck.astype(jnp.float32)) ** 2
                )
                * res
            )
            best = jnp.minimum(best, d + off)
    return best


def scene_field_at(
    fields: jnp.ndarray, sid, lo, res, pos: jnp.ndarray
) -> jnp.ndarray:
    """Sample a per-SCENE field (S,NX,NZ) at world pos (N,3) (nearest cell)."""
    nx, nz = fields.shape[-2], fields.shape[-1]
    cf = (pos[:, jnp.array([0, 2])] - lo) / res
    c = jnp.round(cf).astype(jnp.int32)
    ci = jnp.clip(c[:, 0], 0, nx - 1)
    ck = jnp.clip(c[:, 1], 0, nz - 1)
    return fields[sid, ci, ck]


# ---------------------------------------------------------------------------
# Sensors
# ---------------------------------------------------------------------------


def _pointgoal_obs(
    source_pos, source_yaw, goal_pos, goal_format: str, dimensionality: int
):
    """Batched _compute_pointgoal (reference nav.py:160-192)."""
    direction = goal_pos - source_pos  # (N,3)
    dva = rotate_world_to_agent(direction, source_yaw)  # agent frame
    if goal_format == "POLAR":
        if dimensionality == 2:
            rho = jnp.sqrt(dva[:, 0] ** 2 + dva[:, 2] ** 2)
            phi = jnp.arctan2(dva[:, 0], -dva[:, 2])
            return jnp.stack([rho, -phi], axis=-1)
        else:
            phi = jnp.arctan2(dva[:, 0], -dva[:, 2])
            norm = jnp.linalg.norm(dva, axis=-1)
            theta = jnp.arccos(jnp.clip(dva[:, 1] / jnp.maximum(norm, 1e-9), -1, 1))
            return jnp.stack([norm, -phi, theta], axis=-1)
    else:  # CARTESIAN
        if dimensionality == 2:
            return jnp.stack([-dva[:, 2], dva[:, 0]], axis=-1)
        else:
            return dva


@registry.register_sensor(name="PointGoalSensor")
class PointGoalSensor(FunctionalSensor):
    """Static pointgoal in the episode-start frame (reference nav.py:107)."""

    uuid = "pointgoal"

    def __init__(self, config=None):
        super().__init__(config)
        self.goal_format = _cfg(config, "goal_format", "POLAR")
        self.dimensionality = _cfg(config, "dimensionality", 2)

    def observation_space(self):
        return spaces.Box(
            low=np.finfo(np.float32).min,
            high=np.finfo(np.float32).max,
            shape=(self.dimensionality,),
            dtype=np.float32,
        )

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        goal = ctx.goal_pos[:, 0]
        return _pointgoal_obs(
            ctx.start_pos, ctx.start_yaw, goal, self.goal_format, self.dimensionality
        ).astype(jnp.float32)


@registry.register_sensor(name="PointGoalWithGPSCompassSensor")
class IntegratedPointGoalGPSAndCompassSensor(PointGoalSensor):
    """Pointgoal in the CURRENT agent frame (reference nav.py:287)."""

    uuid = "pointgoal_with_gps_compass"

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        goal = ctx.goal_pos[:, 0]
        return _pointgoal_obs(
            ctx.pos, ctx.yaw, goal, self.goal_format, self.dimensionality
        ).astype(jnp.float32)


@registry.register_sensor(name="HeadingSensor")
class HeadingSensor(FunctionalSensor):
    """Agent heading in world frame (reference nav.py:327). With our yaw
    convention (yaw about +y, forward=-z) heading == yaw wrapped to [-pi,pi]."""

    uuid = "heading"

    def observation_space(self):
        return spaces.Box(low=-np.pi, high=np.pi, shape=(1,), dtype=np.float32)

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        h = jnp.arctan2(jnp.sin(ctx.yaw), jnp.cos(ctx.yaw))
        return h[:, None].astype(jnp.float32)


@registry.register_sensor(name="CompassSensor")
class EpisodicCompassSensor(FunctionalSensor):
    """Heading relative to episode start (reference nav.py:373)."""

    uuid = "compass"

    def observation_space(self):
        return spaces.Box(low=-np.pi, high=np.pi, shape=(1,), dtype=np.float32)

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        d = ctx.yaw - ctx.start_yaw
        h = jnp.arctan2(jnp.sin(d), jnp.cos(d))
        return h[:, None].astype(jnp.float32)


@registry.register_sensor(name="GPSSensor")
class EpisodicGPSSensor(FunctionalSensor):
    """Position in the episode-start frame (reference nav.py:398):
    2D returns [-z_agent, x_agent] of the start-frame displacement."""

    uuid = "gps"

    def __init__(self, config=None):
        super().__init__(config)
        self.dimensionality = _cfg(config, "dimensionality", 2)

    def observation_space(self):
        return spaces.Box(
            low=np.finfo(np.float32).min,
            high=np.finfo(np.float32).max,
            shape=(self.dimensionality,),
            dtype=np.float32,
        )

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        rel = rotate_world_to_agent(ctx.pos - ctx.start_pos, ctx.start_yaw)
        if self.dimensionality == 2:
            return jnp.stack([-rel[:, 2], rel[:, 0]], axis=-1).astype(jnp.float32)
        return rel.astype(jnp.float32)


@registry.register_sensor(name="ProximitySensor")
class ProximitySensor(FunctionalSensor):
    """Distance to closest obstacle (reference nav.py:456), served from the
    precomputed per-scene obstacle distance field."""

    uuid = "proximity"

    def __init__(self, config=None):
        super().__init__(config)
        self.max_detection_radius = _cfg(config, "max_detection_radius", 2.0)

    def observation_space(self):
        return spaces.Box(
            low=0.0, high=self.max_detection_radius, shape=(1,), dtype=np.float32
        )

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        d = scene_field_at(
            ctx.pack.obst_dist,
            ctx.sid,
            ctx.pack.nav_lo[ctx.sid],
            ctx.pack.nav_res,
            ctx.pos,
        )
        return jnp.clip(d, 0.0, self.max_detection_radius)[:, None].astype(jnp.float32)


class VisualSensorSpec(FunctionalSensor):
    """Marker base for raster sensors; rendering happens once per step in the
    env (one raycast serves rgb+depth+semantic, reference renders each sensor
    via habitat-sim specs habitat_simulator.py:373-407)."""

    projection = "pinhole"

    def __init__(self, config=None):
        super().__init__(config)
        self.height = _cfg(config, "height", 128)
        self.width = _cfg(config, "width", 128)
        self.hfov = _cfg(config, "hfov", 90.0)
        # camera mount height above agent base (reference default sensor
        # position [0, 1.25, 0])
        self.position_y = _cfg(config, "position", [0.0, 1.25, 0.0])[1]


@registry.register_sensor(name="HabitatSimRGBSensor")
class RGBSensor(VisualSensorSpec):
    uuid = "rgb"

    def observation_space(self):
        return spaces.Box(
            low=0, high=255, shape=(self.height, self.width, 3), dtype=np.uint8
        )


@registry.register_sensor(name="HabitatSimDepthSensor")
class DepthSensor(VisualSensorSpec):
    uuid = "depth"

    def __init__(self, config=None):
        super().__init__(config)
        self.min_depth = _cfg(config, "min_depth", 0.0)
        self.max_depth = _cfg(config, "max_depth", 10.0)
        self.normalize_depth = _cfg(config, "normalize_depth", True)

    def observation_space(self):
        lo, hi = (
            (0.0, 1.0)
            if self.normalize_depth
            else (self.min_depth, self.max_depth)
        )
        return spaces.Box(
            low=lo, high=hi, shape=(self.height, self.width, 1), dtype=np.float32
        )


@registry.register_sensor(name="HabitatSimSemanticSensor")
class SemanticSensor(VisualSensorSpec):
    uuid = "semantic"

    def observation_space(self):
        return spaces.Box(
            low=np.iinfo(np.int32).min,
            high=np.iinfo(np.int32).max,
            shape=(self.height, self.width, 1),
            dtype=np.int32,
        )


@registry.register_sensor(name="ObjectGoalSensor")
class ObjectGoalSensor(FunctionalSensor):
    """Goal object category id (reference tasks/nav/object_nav_task.py:100)."""

    uuid = "objectgoal"

    def __init__(self, config=None):
        super().__init__(config)
        self.goal_spec_max_val = _cfg(config, "goal_spec_max_val", 50)

    def observation_space(self):
        return spaces.Box(
            low=0, high=self.goal_spec_max_val - 1, shape=(1,), dtype=np.int64
        )

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        cat = ctx.table.object_category[ctx.ep_idx]
        return jnp.maximum(cat, 0)[:, None].astype(jnp.int32)


# ---------------------------------------------------------------------------
# Measures
# ---------------------------------------------------------------------------


@registry.register_measure(name="NumSteps")
class NumStepsMeasure(FunctionalMeasure):
    uuid = "num_steps"

    def reset(self, ctx):
        return (), jnp.zeros_like(ctx.step, dtype=jnp.float32)

    def update(self, state, ctx, measures):
        return (), ctx.step.astype(jnp.float32)


@registry.register_measure(name="DistanceToGoal")
class DistanceToGoal(FunctionalMeasure):
    """Geodesic distance to goal set (reference nav.py:938): value sampled
    from the per-episode multi-goal field (equivalent to MultiGoalShortestPath
    min over goals, habitat_simulator.py:528-554)."""

    uuid = "distance_to_goal"

    def reset(self, ctx):
        return (), table_distance_at(ctx, ctx.pos)

    def update(self, state, ctx, measures):
        return (), table_distance_at(ctx, ctx.pos)


@registry.register_measure(name="Success")
class Success(FunctionalMeasure):
    """stop called && distance_to_goal < success_distance (reference nav.py:502)."""

    uuid = "success"
    deps = ("distance_to_goal",)

    def __init__(self, config=None):
        super().__init__(config)
        self.success_distance = _cfg(config, "success_distance", 0.2)

    def reset(self, ctx):
        return (), jnp.zeros(ctx.pos.shape[0], jnp.float32)

    def update(self, state, ctx, measures):
        ok = ctx.stop_called & (measures["distance_to_goal"] < self.success_distance)
        return (), ok.astype(jnp.float32)


@registry.register_measure(name="SPL")
class SPL(FunctionalMeasure):
    """Success-weighted path length (reference nav.py:546). State carries
    (agent_path_len, start_geodesic)."""

    uuid = "spl"
    deps = ("distance_to_goal", "success")

    def reset(self, ctx):
        start = table_distance_at(ctx, ctx.pos)
        path = jnp.zeros_like(start)
        return {"path": path, "start": start}, jnp.zeros_like(start)

    def update(self, state, ctx, measures):
        seg = jnp.linalg.norm(ctx.pos - ctx.prev_pos, axis=-1)
        path = state["path"] + seg
        val = measures["success"] * state["start"] / jnp.maximum(
            state["start"], jnp.maximum(path, 1e-6)
        )
        return {"path": path, "start": state["start"]}, val


@registry.register_measure(name="SoftSPL")
class SoftSPL(FunctionalMeasure):
    """SPL with soft success = max(0, 1 - d/d_start) (reference nav.py:611)."""

    uuid = "soft_spl"
    deps = ("distance_to_goal",)

    def reset(self, ctx):
        start = table_distance_at(ctx, ctx.pos)
        path = jnp.zeros_like(start)
        return {"path": path, "start": start}, jnp.zeros_like(start)

    def update(self, state, ctx, measures):
        seg = jnp.linalg.norm(ctx.pos - ctx.prev_pos, axis=-1)
        path = state["path"] + seg
        soft = jnp.maximum(
            0.0, 1.0 - measures["distance_to_goal"] / jnp.maximum(state["start"], 1e-6)
        )
        val = soft * state["start"] / jnp.maximum(state["start"], jnp.maximum(path, 1e-6))
        return {"path": path, "start": state["start"]}, val


@registry.register_measure(name="Collisions")
class Collisions(FunctionalMeasure):
    """Cumulative collision count (reference nav.py:658 returns
    {count, is_collision}; we report count — is_collision exposed as its own
    key by the env info dict)."""

    uuid = "collisions"

    def reset(self, ctx):
        return (), jnp.zeros(ctx.pos.shape[0], jnp.float32)

    def update(self, state, ctx, measures):
        return (), ctx.collision_count.astype(jnp.float32)


@registry.register_measure(name="DistanceToGoalReward")
class DistanceToGoalReward(FunctionalMeasure):
    """-(d_t - d_{t-1}) shaping (reference nav.py:1001)."""

    uuid = "distance_to_goal_reward"
    deps = ("distance_to_goal",)

    def reset(self, ctx):
        d = table_distance_at(ctx, ctx.pos)
        return {"prev": d}, jnp.zeros_like(d)

    def update(self, state, ctx, measures):
        d = measures["distance_to_goal"]
        val = -(d - state["prev"])
        return {"prev": d}, val


@registry.register_measure(name="TopDownMap")
class TopDownMap(FunctionalMeasure):
    """Host-side top-down map measure (reference TopDownMap, nav.py:678):
    occupancy map + fog of war + agent trace, surfaced through
    env.get_metrics() under "top_down_map" with the reference's dict shape
    {map, fog_of_war_mask, agent_map_coord, agent_angle}.

    host_side=True: the batched device step never computes it (the
    reference also strips it from training workers,
    habitat_baselines/common/env_factory.py); the single-env Env wrapper
    updates it on the host after each step."""

    uuid = "top_down_map"
    host_side = True

    def __init__(self, config=None):
        super().__init__(config)
        self._tracker = None
        self._cfg = config

    def host_reset(self, scene, episode, pos, yaw):
        from habitat_tpu.utils.visualizations.maps import TopDownMapTracker

        fog = True
        draw_path = True
        if self._cfg is not None and hasattr(self._cfg, "get"):
            fow = self._cfg.get("fog_of_war", None)
            if hasattr(fow, "get"):
                fog = bool(fow.get("draw", True))
            draw_path = bool(self._cfg.get("draw_shortest_path", True))
        goals = None
        if episode is not None and getattr(episode, "goals", None):
            goals = np.array([g.position for g in episode.goals], np.float32)
        self._tracker = TopDownMapTracker(
            scene, draw_shortest_path=draw_path, fog_of_war=fog
        )
        self._tracker.reset(goal_positions=goals)
        self._tracker.update(np.asarray(pos), float(yaw))
        return self.host_value()

    def host_update(self, pos, yaw, episode_over=False):
        self._tracker.update(np.asarray(pos), float(yaw))
        return self.host_value()

    def host_value(self):
        t = self._tracker
        c, yaw = t._last_pose
        return {
            "map": t.map,
            "fog_of_war_mask": t.fog_mask,
            "agent_map_coord": (int(c[0]), int(c[1])),
            "agent_angle": float(yaw),
        }

    # device protocol unused (host_side) — kept for interface completeness
    def reset(self, ctx):
        return (), jnp.zeros(ctx.pos.shape[0], jnp.float32)

    def update(self, state, ctx, measures):
        return (), jnp.zeros(ctx.pos.shape[0], jnp.float32)


@registry.register_measure(name="RuntimePerfStats")
class RuntimePerfStats(FunctionalMeasure):
    """Host-side step-timing stats (reference RuntimePerfStats,
    rearrange_sensors.py:1166 — uuid "habitat_perf"): wall-clock ms of the
    env step sections, read from g_timer."""

    uuid = "habitat_perf"
    host_side = True

    def __init__(self, config=None):
        super().__init__(config)
        self._t_prev = None

    def host_reset(self, scene, episode, pos, yaw):
        import time as _t

        self._t_prev = _t.time()
        return {}

    def host_update(self, pos, yaw, episode_over=False):
        import time as _t

        from habitat_tpu.utils.timing import g_timer

        now = _t.time()
        out = {"step_ms": (now - self._t_prev) * 1e3}
        self._t_prev = now
        for k, v in g_timer.todict().items():
            out[k] = v * 1e3
        return out

    def reset(self, ctx):
        return (), jnp.zeros(ctx.pos.shape[0], jnp.float32)

    def update(self, state, ctx, measures):
        return (), jnp.zeros(ctx.pos.shape[0], jnp.float32)


@registry.register_measure(name="GfxReplayMeasure")
class GfxReplayMeasure(FunctionalMeasure):
    """Host-side gfx-replay keyframe string (reference GfxReplayMeasure,
    rearrange_sensors.py:500 — uuid "gfx_replay_keyframes_string"): records
    a keyframe per step via sims/gfx_replay and returns the serialized
    replay at episode end (empty while in progress, like the reference)."""

    uuid = "gfx_replay_keyframes_string"
    host_side = True

    def __init__(self, config=None):
        super().__init__(config)
        self._recorder = None

    def host_reset(self, scene, episode, pos, yaw):
        self._kfs = []
        self._scene_id = getattr(scene, "scene_id", "scene")
        self._append(pos, yaw)
        return ""

    def _append(self, pos, yaw):
        self._kfs.append(
            {
                "agent": {
                    "position": [float(x) for x in np.asarray(pos)],
                    "yaw": float(yaw),
                },
                "index": len(self._kfs),
                "scene": self._scene_id,
            }
        )

    def host_update(self, pos, yaw, episode_over=False):
        import json as _json

        self._append(pos, yaw)
        if episode_over:
            return _json.dumps({"keyframes": self._kfs})
        return ""

    def reset(self, ctx):
        return (), jnp.zeros(ctx.pos.shape[0], jnp.float32)

    def update(self, state, ctx, measures):
        return (), jnp.zeros(ctx.pos.shape[0], jnp.float32)


# ---------------------------------------------------------------------------
# Actions (reference nav.py:1059-1121 + HabitatSimActions singleton,
# sims/habitat_simulator/actions.py:17-91)
# ---------------------------------------------------------------------------


@registry.register_task_action(name="StopAction")
class StopAction(FunctionalAction):
    name = "stop"

    def is_stop(self):
        return True


@registry.register_task_action(name="MoveForwardAction")
class MoveForwardAction(FunctionalAction):
    name = "move_forward"

    def move_amount(self):
        return _cfg(self.config, "forward_step_size", 0.25)


@registry.register_task_action(name="TurnLeftAction")
class TurnLeftAction(FunctionalAction):
    name = "turn_left"

    def turn_amount(self):
        return float(np.deg2rad(_cfg(self.config, "turn_angle", 10.0)))


@registry.register_task_action(name="TurnRightAction")
class TurnRightAction(FunctionalAction):
    name = "turn_right"

    def turn_amount(self):
        return -float(np.deg2rad(_cfg(self.config, "turn_angle", 10.0)))


@registry.register_task_action(name="LookUpAction")
class LookUpAction(FunctionalAction):
    name = "look_up"

    def tilt_amount(self):
        # reference default tilt_angle = 15 (default_structured_configs.py:167)
        return float(np.deg2rad(_cfg(self.config, "tilt_angle", 15.0)))


@registry.register_task_action(name="LookDownAction")
class LookDownAction(FunctionalAction):
    name = "look_down"

    def tilt_amount(self):
        return -float(np.deg2rad(_cfg(self.config, "tilt_angle", 15.0)))


@registry.register_sensor(name="ImageGoalSensor")
class ImageGoalSensor(FunctionalSensor):
    """Goal-view image (reference tasks/nav/nav.py:210 ImageGoalSensor): the
    goal rendered from a per-episode deterministic heading. Views are
    precomputed into the episode table (EpisodeTable.goal_image) at build time
    — one gather per step instead of a second render pass."""

    uuid = "imagegoal"

    def __init__(self, config=None):
        super().__init__(config)
        self.height = _cfg(config, "height", 128)
        self.width = _cfg(config, "width", 128)

    def observation_space(self):
        return spaces.Box(
            low=0, high=255, shape=(self.height, self.width, 3), dtype=np.uint8
        )

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        img = ctx.table.goal_image
        assert img.shape[1] == self.height and img.shape[2] == self.width, (
            "EpisodeTable was built without goal images of the right size; "
            "pass goal_image_size to build_episode_table "
            f"(table {img.shape} vs sensor {(self.height, self.width)})"
        )
        return img[ctx.ep_idx]


@registry.register_task_action(name="TeleportAction")
class TeleportAction(FunctionalAction):
    """Teleport to a given pose (reference nav.py:1121). Parameterized
    actions run through the host sim path (TpuSim.step with action_args);
    in the batched discrete env it contributes no pose delta."""

    name = "teleport"


@registry.register_task_action(name="VelocityAction")
class VelocityAction(FunctionalAction):
    """Velocity control (reference nav.py:1170: habitat-sim VelocityControl
    integration with auto-stop thresholds). Continuous (lin, ang) commands
    integrate over time_step on the host sim path; the batched continuous
    action interface is the planned round-2 extension."""

    name = "velocity_control"

    def __init__(self, config=None):
        super().__init__(config)
        self.lin_vel_range = _cfg(config, "lin_vel_range", [0.0, 0.25])
        self.ang_vel_range = _cfg(config, "ang_vel_range", [-10.0, 10.0])
        self.min_abs_lin_speed = _cfg(config, "min_abs_lin_speed", 0.025)
        self.min_abs_ang_speed = _cfg(config, "min_abs_ang_speed", 1.0)
        self.time_step = _cfg(config, "time_step", 1.0)


# -- panoramic projections (reference equirect/fisheye sensors,
# habitat_simulator.py:231-258) — same uuids, different ray generators


@registry.register_sensor(name="HabitatSimEquirectangularRGBSensor")
class EquirectRGBSensor(RGBSensor):
    projection = "equirect"


@registry.register_sensor(name="HabitatSimEquirectangularDepthSensor")
class EquirectDepthSensor(DepthSensor):
    projection = "equirect"


@registry.register_sensor(name="HabitatSimEquirectangularSemanticSensor")
class EquirectSemanticSensor(SemanticSensor):
    projection = "equirect"


@registry.register_sensor(name="HabitatSimFisheyeRGBSensor")
class FisheyeRGBSensor(RGBSensor):
    projection = "fisheye"


@registry.register_sensor(name="HabitatSimFisheyeDepthSensor")
class FisheyeDepthSensor(DepthSensor):
    projection = "fisheye"


@registry.register_sensor(name="HabitatSimFisheyeSemanticSensor")
class FisheyeSemanticSensor(SemanticSensor):
    projection = "fisheye"


@registry.register_sensor(name="InstanceImageGoalSensor")
class InstanceImageGoalSensor(ImageGoalSensor):
    """Goal-instance view (reference tasks/nav/instance_image_nav_task.py:91 —
    renders the goal object from stored camera params; here served from the
    precomputed goal-image table like ImageGoalSensor)."""

    uuid = "instance_imagegoal"


@registry.register_sensor(name="InstanceImageGoalHFOVSensor")
class InstanceImageGoalHFOVSensor(FunctionalSensor):
    """HFOV of the goal view (reference instance_image_nav_task.py:217)."""

    uuid = "instance_imagegoal_hfov"

    def observation_space(self):
        return spaces.Box(low=0.0, high=360.0, shape=(1,), dtype=np.float32)

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        extras = ctx.table.extras
        if "instance_hfov" in extras:
            return extras["instance_hfov"][ctx.ep_idx][:, None].astype(jnp.float32)
        return jnp.full((ctx.pos.shape[0], 1), 90.0, jnp.float32)
