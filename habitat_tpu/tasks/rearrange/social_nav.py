"""Social navigation — robot finds/follows a moving humanoid.

Counterpart of the reference social-nav stack (SURVEY §2.3):
- PddlSocialNavTask-v0 (tasks/rearrange/social_nav/social_nav_task.py:21)
- SocialNavReward (social_nav_sensors.py:37), SocialNavStats (:185),
  SocialNavSeekSuccess (:468), HumanoidDetectorSensor (:552)
- multi-agent sensors: DidAgentsCollide (multi_agent_sensors.py:18),
  OtherAgentGps (:87)

The humanoid is the kinematic waypoint-walking agent (the reference trains
the robot against a scripted/learned humanoid in kinematic mode,
habitat-baselines/README.md:81-160); its pose advances inside the same jitted
step — a 2-agent scene with zero extra processes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from gymnasium import spaces

from habitat_tpu.ops import navgrid as ng
from habitat_tpu.sims.scene import ScenePack
from habitat_tpu.utils.geometry import rotate_world_to_agent, yaw_to_forward

A_STOP, A_FWD, A_LEFT, A_RIGHT = 0, 1, 2, 3
SOCIAL_ACTIONS = ("stop", "move_forward", "turn_left", "turn_right")


@jtu.register_dataclass
@dataclasses.dataclass
class SocialNavTable:
    scene_idx: jnp.ndarray  # (E,)
    start_pos: jnp.ndarray  # (E,3)
    start_yaw: jnp.ndarray  # (E,)
    human_start: jnp.ndarray  # (E,3)
    waypoints: jnp.ndarray  # (E,W,3) humanoid patrol loop


@jtu.register_dataclass
@dataclasses.dataclass
class SocialNavState:
    ep_ptr: jnp.ndarray
    ep_idx: jnp.ndarray
    step: jnp.ndarray
    pos: jnp.ndarray
    yaw: jnp.ndarray
    human_pos: jnp.ndarray  # (N,3)
    human_yaw: jnp.ndarray
    human_wp: jnp.ndarray  # (N,) waypoint index
    follow_steps: jnp.ndarray  # (N,) consecutive steps in the follow band
    found_steps: jnp.ndarray  # (N,) total steps with humanoid detected
    min_human_dist: jnp.ndarray  # (N,)
    # SocialNavStats accumulators (reference social_nav_sensors.py:185-462)
    found_ever: jnp.ndarray  # (N,) bool — has_found_human
    found_step: jnp.ndarray  # (N,) i32 — step of the first encounter
    dis_sum: jnp.ndarray  # (N,) f32 — sum of robot-human distance
    dis_after_sum: jnp.ndarray  # (N,) f32 — same, after first encounter
    after_found_times: jnp.ndarray  # (N,) i32 — detections after encounter
    step_after_found: jnp.ndarray  # (N,) i32 — steps after first encounter
    backup_count: jnp.ndarray  # (N,) i32 — backing up near the human
    yield_count: jnp.ndarray  # (N,) i32 — standing still near the human
    stop_called: jnp.ndarray
    collided: jnp.ndarray
    agents_collide: jnp.ndarray  # (N,) robot-humanoid collision happened
    episode_over: jnp.ndarray
    episode_count: jnp.ndarray
    key: jax.Array


class SocialNavBatchedEnv:
    """Find-and-follow-the-humanoid (reference social nav task semantics:
    seek success = facing + within the follow band for ``need_to_face`` steps)."""

    def __init__(
        self,
        pack: ScenePack,
        table: SocialNavTable,
        episode_order: np.ndarray,
        *,
        max_episode_steps: int = 300,
        human_speed: float = 0.1,  # m/step
        robot_step: float = 0.25,
        turn_angle_deg: float = 10.0,
        follow_band: Tuple[float, float] = (1.0, 2.0),
        detect_dist: float = 4.0,
        detect_fov_deg: float = 90.0,
        need_to_face_steps: int = 5,
        collide_dist: float = 0.5,
        two_agent: bool = False,
        # vision: render the scene + the humanoid body through the dynamic
        # raycast pass (the reference's social-nav robot observes the
        # humanoid through its depth camera, habitat-baselines/README.md:81)
        with_visual: bool = False,
        render_size: Optional[Tuple[int, int]] = (128, 128),
    ):
        self.pack = pack
        self.with_visual = with_visual and render_size is not None
        self.render_size = render_size
        self.table = table
        self.order = jnp.asarray(episode_order, jnp.int32)
        self.num_envs = int(episode_order.shape[0])
        self._order_len = int(episode_order.shape[1])
        self.max_episode_steps = max_episode_steps
        self.human_speed = human_speed
        self.fwd = robot_step
        self.turn = float(np.deg2rad(turn_angle_deg))
        self.follow_band = follow_band
        self.detect_dist = detect_dist
        self.detect_cos = float(np.cos(np.deg2rad(detect_fov_deg) / 2))
        self.need_to_face = need_to_face_steps
        self.collide_dist = collide_dist
        self.num_waypoints = int(table.waypoints.shape[1])
        self.two_agent = two_agent

        agent_obs = {
            "humanoid_detector_sensor": spaces.Box(-np.inf, np.inf, (4,), np.float32),
            "other_agent_gps": spaces.Box(-np.inf, np.inf, (2,), np.float32),
            "gps": spaces.Box(-np.inf, np.inf, (2,), np.float32),
            "compass": spaces.Box(-np.pi, np.pi, (1,), np.float32),
        }
        if self.with_visual:
            h, w = render_size
            agent_obs["robot_head_rgb"] = spaces.Box(0, 255, (h, w, 3), np.uint8)
            agent_obs["robot_head_depth"] = spaces.Box(0.0, 1.0, (h, w, 1), np.float32)
        self.action_space = spaces.Discrete(len(SOCIAL_ACTIONS))
        self.action_names = SOCIAL_ACTIONS
        if two_agent:
            # multi-agent sensor prefixing (reference RearrangeSim
            # tasks/rearrange/rearrange_sim.py:68-82): agent_{i}_<uuid>.
            # Visual sensors are robot-only (agent_0): the humanoid's camera
            # would sit inside its own rendered body
            self.observation_space = spaces.Dict(
                {
                    f"agent_{i}_{k}": sp
                    for i in range(2)
                    for k, sp in agent_obs.items()
                    if i == 0 or not k.startswith("robot_head")
                }
            )
        else:
            self.observation_space = spaces.Dict(agent_obs)
        self._jit_reset = jax.jit(self.reset_fn)
        self._jit_step = jax.jit(self.step_fn, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _sid(self, state):
        return self.table.scene_idx[state.ep_idx]

    def _detected(self, state) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(visible (N,), rel (N,3)) — HumanoidDetectorSensor semantics
        (within fov cone and range)."""
        rel = rotate_world_to_agent(state.human_pos - state.pos, state.yaw)
        dist = jnp.linalg.norm(rel[:, jnp.array([0, 2])], axis=-1)
        fwd_cos = -rel[:, 2] / jnp.maximum(dist, 1e-6)
        visible = (dist < self.detect_dist) & (fwd_cos > self.detect_cos)
        return visible, rel

    def _agent_obs(self, state, pos, yaw, other_pos) -> Dict[str, jnp.ndarray]:
        """One agent's sensor suite (detector of the OTHER agent + episodic
        GPS/compass), reference HumanoidDetectorSensor + multi-agent sensors
        (social_nav_sensors.py:552, multi_agent_sensors.py:87)."""
        rel = rotate_world_to_agent(other_pos - pos, yaw)
        dist = jnp.linalg.norm(rel[:, jnp.array([0, 2])], axis=-1)
        fwd_cos = -rel[:, 2] / jnp.maximum(dist, 1e-6)
        visible = (dist < self.detect_dist) & (fwd_cos > self.detect_cos)
        det = jnp.concatenate(
            [visible[:, None].astype(jnp.float32), rel.astype(jnp.float32)], axis=-1
        )
        start = self.table.start_pos[state.ep_idx]
        syaw = self.table.start_yaw[state.ep_idx]
        gps_rel = rotate_world_to_agent(pos - start, syaw)
        other = rotate_world_to_agent(other_pos - start, syaw)
        comp = yaw - syaw
        return {
            "humanoid_detector_sensor": det,
            "other_agent_gps": jnp.stack([-other[:, 2], other[:, 0]], axis=-1).astype(jnp.float32),
            "gps": jnp.stack([-gps_rel[:, 2], gps_rel[:, 0]], axis=-1).astype(jnp.float32),
            "compass": jnp.arctan2(jnp.sin(comp), jnp.cos(comp))[:, None].astype(jnp.float32),
        }

    def _humanoid_geometry(self, state) -> Dict[str, jnp.ndarray]:
        """Humanoid as torso + head boxes through the dynamic render pass
        (the reference draws the SMPL-X avatar via its render nodes;
        flat-shaded boxes carry the same occlusion/depth signal)."""
        n = self.num_envs
        corners = jnp.array(
            [
                [-1.0, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
            ]
        )
        faces = jnp.array(
            [
                [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
                [0, 4, 5], [0, 5, 1], [1, 5, 6], [1, 6, 2],
                [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0],
            ]
        )
        cube = corners[faces]  # (12,3,3) unit half-extent
        torso = cube * jnp.array([0.18, 0.70, 0.18]) + jnp.array([0.0, 0.70, 0.0])
        head = cube * 0.12 + jnp.array([0.0, 1.55, 0.0])
        body = jnp.concatenate([torso, head], axis=0)  # (24,3,3)
        v = state.human_pos[:, None, None, :] + body[None]
        v = v.reshape(n, 24, 3, 3)
        return dict(
            v0=v[:, :, 0],
            e1=v[:, :, 1] - v[:, :, 0],
            e2=v[:, :, 2] - v[:, :, 0],
            valid=jnp.ones((n, 24), bool),
            color=jnp.broadcast_to(
                jnp.array([0.85, 0.35, 0.25], jnp.float32), (n, 24, 3)
            ),
            sem=jnp.full((n, 24), 9000, jnp.int32),  # humanoid semantic id
        )

    def _render(self, state, pos, yaw) -> Dict[str, jnp.ndarray]:
        from habitat_tpu.ops.raycast import render_batch

        h, w = self.render_size
        return render_batch(
            self.pack,
            self._sid(state),
            pos + jnp.array([0.0, 1.25, 0.0]),
            yaw,
            jnp.full((self.num_envs,), -0.25),
            height=h,
            width=w,
            dynamic=self._humanoid_geometry(state),
        )

    def _observations(self, state) -> Dict[str, jnp.ndarray]:
        robot = self._agent_obs(state, state.pos, state.yaw, state.human_pos)
        if self.with_visual:
            frames = self._render(state, state.pos, state.yaw)
            robot["robot_head_depth"] = frames["depth"]
            robot["robot_head_rgb"] = frames["rgb"]
        if not self.two_agent:
            return robot
        human = self._agent_obs(state, state.human_pos, state.human_yaw, state.pos)
        out = {f"agent_0_{k}": v for k, v in robot.items()}
        out.update({f"agent_1_{k}": v for k, v in human.items()})
        return out

    def _measures(self, state) -> Dict[str, jnp.ndarray]:
        visible, rel = self._detected(state)
        dist = jnp.linalg.norm(
            (state.human_pos - state.pos)[:, jnp.array([0, 2])], axis=-1
        )
        in_band = (dist >= self.follow_band[0]) & (dist <= self.follow_band[1])
        seek_success = (state.follow_steps >= self.need_to_face).astype(jnp.float32)
        stepf = jnp.maximum(state.step.astype(jnp.float32), 1.0)
        saf = jnp.maximum(state.step_after_found.astype(jnp.float32), 1.0)
        # min steps robot-start -> human-start at the step size (the
        # reference uses the navmesh shortest path; straight-line here —
        # a LOWER bound, so first_encounter_spl stays <= the true SPL)
        start_d = jnp.linalg.norm(
            (
                self.table.human_start[state.ep_idx]
                - self.table.start_pos[state.ep_idx]
            )[:, jnp.array([0, 2])],
            axis=-1,
        )
        min_steps = jnp.maximum(start_d / self.fwd, 1.0)
        found_stepf = jnp.maximum(state.found_step.astype(jnp.float32), 1.0)
        fes = state.found_ever.astype(jnp.float32) * (
            min_steps / jnp.maximum(min_steps, found_stepf)
        )
        total = float(self.max_episode_steps)
        return {
            # reference SocialNavSeekSuccess: found + facing for K steps
            "nav_seek_success": seek_success,
            "success": seek_success,
            "did_agents_collide": state.agents_collide.astype(jnp.float32),
            "human_dist": dist,
            "min_human_dist": state.min_human_dist,
            "found_human_rate": state.found_steps.astype(jnp.float32)
            / jnp.maximum(state.step.astype(jnp.float32), 1.0),
            "num_steps": state.step.astype(jnp.float32),
            # full SocialNavStats field set (reference
            # social_nav_sensors.py:427-462; flattened measure.subkey names)
            "social_nav_stats.has_found_human": state.found_ever.astype(
                jnp.float32
            ),
            "social_nav_stats.found_human_rate_over_epi": (
                state.found_steps.astype(jnp.float32) / stepf
            ),
            "social_nav_stats.found_human_rate_after_encounter_over_epi": (
                state.after_found_times.astype(jnp.float32) / saf
            ),
            "social_nav_stats.avg_robot_to_human_dis_over_epi": (
                state.dis_sum / stepf
            ),
            "social_nav_stats.avg_robot_to_human_after_encounter_dis_over_epi": (
                state.dis_after_sum / saf
            ),
            "social_nav_stats.first_encounter_spl": fes,
            "social_nav_stats.frist_ecnounter_steps": (
                state.found_step.astype(jnp.float32)
            ),
            "social_nav_stats.frist_ecnounter_steps_ratio": (
                found_stepf / min_steps
            ),
            "social_nav_stats.follow_human_steps_after_frist_encounter": (
                state.after_found_times.astype(jnp.float32)
            ),
            "social_nav_stats.follow_human_steps_ratio_after_frist_encounter": (
                state.after_found_times.astype(jnp.float32)
                / jnp.maximum(total - min_steps, 1.0)
            ),
            "social_nav_stats.backup_ratio": (
                state.backup_count.astype(jnp.float32) / stepf
            ),
            "social_nav_stats.yield_ratio": (
                state.yield_count.astype(jnp.float32) / stepf
            ),
        }

    # -- humanoid script ----------------------------------------------------
    def _advance_human(self, state):
        sid = self._sid(state)
        wp = self.table.waypoints[state.ep_idx, state.human_wp % self.num_waypoints]
        d = wp - state.human_pos
        dist = jnp.linalg.norm(d[:, jnp.array([0, 2])], axis=-1)
        reach = dist < 0.3
        new_wp = jnp.where(reach, state.human_wp + 1, state.human_wp)
        dirn = d / jnp.maximum(dist, 1e-6)[:, None]
        target = state.human_pos + dirn * self.human_speed
        new_pos, _ = jax.vmap(functools.partial(ng.try_step, self.pack))(
            sid, state.human_pos, target
        )
        yaw = jnp.arctan2(-dirn[:, 0], -dirn[:, 2])
        return new_pos, yaw, new_wp

    # -- lifecycle ------------------------------------------------------------
    def _fresh(self, ep_idx, key):
        n = self.num_envs
        return SocialNavState(
            ep_ptr=jnp.zeros((n,), jnp.int32),
            ep_idx=ep_idx,
            step=jnp.zeros((n,), jnp.int32),
            pos=self.table.start_pos[ep_idx],
            yaw=self.table.start_yaw[ep_idx],
            human_pos=self.table.human_start[ep_idx],
            human_yaw=jnp.zeros((n,)),
            human_wp=jnp.zeros((n,), jnp.int32),
            follow_steps=jnp.zeros((n,), jnp.int32),
            found_steps=jnp.zeros((n,), jnp.int32),
            min_human_dist=jnp.full((n,), 1e6, jnp.float32),
            found_ever=jnp.zeros((n,), bool),
            found_step=jnp.full((n,), self.max_episode_steps, jnp.int32),
            dis_sum=jnp.zeros((n,), jnp.float32),
            dis_after_sum=jnp.zeros((n,), jnp.float32),
            after_found_times=jnp.zeros((n,), jnp.int32),
            step_after_found=jnp.zeros((n,), jnp.int32),
            backup_count=jnp.zeros((n,), jnp.int32),
            yield_count=jnp.zeros((n,), jnp.int32),
            stop_called=jnp.zeros((n,), bool),
            collided=jnp.zeros((n,), bool),
            agents_collide=jnp.zeros((n,), bool),
            episode_over=jnp.zeros((n,), bool),
            episode_count=jnp.zeros((n,), jnp.int32),
            key=key,
        )

    def reset_fn(self, key, env_data=None):
        ep_idx = self.order[jnp.arange(self.num_envs), 0]
        state = self._fresh(ep_idx, key)
        return state, self._observations(state)

    def step_fn(self, state, actions, env_data=None):
        n = self.num_envs
        sid = self._sid(state)
        prev_dist = jnp.linalg.norm(
            (state.human_pos - state.pos)[:, jnp.array([0, 2])], axis=-1
        )

        if self.two_agent:
            # actions (N, 2): [robot, humanoid] — both agents policy-driven
            # (reference MultiPolicy action splitting, pop_play_wrappers.py)
            acts = actions.astype(jnp.int32)
            a = acts[:, 0]
            ah = acts[:, 1]
        else:
            a = actions.astype(jnp.int32)
            ah = None

        prev_pos_stats = state.pos
        stop = state.stop_called | (a == A_STOP)
        yaw = state.yaw + jnp.where(a == A_LEFT, self.turn, 0.0) - jnp.where(
            a == A_RIGHT, self.turn, 0.0
        )
        move = jnp.where(a == A_FWD, self.fwd, 0.0)
        target = state.pos + yaw_to_forward(yaw) * move[:, None]
        new_pos, collided = jax.vmap(functools.partial(ng.try_step, self.pack))(
            sid, state.pos, target
        )
        if self.two_agent:
            h_yaw = state.human_yaw + jnp.where(
                ah == A_LEFT, self.turn, 0.0
            ) - jnp.where(ah == A_RIGHT, self.turn, 0.0)
            h_move = jnp.where(ah == A_FWD, self.fwd, 0.0)
            h_target = state.human_pos + yaw_to_forward(h_yaw) * h_move[:, None]
            h_pos, _ = jax.vmap(functools.partial(ng.try_step, self.pack))(
                sid, state.human_pos, h_target
            )
            h_wp = state.human_wp
        else:
            h_pos, h_yaw, h_wp = self._advance_human(state)

        dist = jnp.linalg.norm((h_pos - new_pos)[:, jnp.array([0, 2])], axis=-1)
        agents_collide = state.agents_collide | (dist < self.collide_dist)

        state = dataclasses.replace(
            state,
            pos=new_pos,
            yaw=yaw,
            human_pos=h_pos,
            human_yaw=h_yaw,
            human_wp=h_wp,
            stop_called=stop,
            collided=collided,
            agents_collide=agents_collide,
            step=state.step + 1,
            min_human_dist=jnp.minimum(state.min_human_dist, dist),
        )
        visible, _ = self._detected(state)
        in_band = (dist >= self.follow_band[0]) & (dist <= self.follow_band[1])
        facing = visible & in_band
        # SocialNavStats accumulators (reference social_nav_sensors.py:
        # 313-462): first-encounter bookkeeping, distance sums, backup/yield
        # counts near the human (backup = moving against the robot's own
        # forward axis; yield = standing nearly still)
        found_now = state.found_ever | visible
        found_step = jnp.where(
            visible & ~state.found_ever, state.step, state.found_step
        )
        disp = new_pos - prev_pos_stats
        fwd_axis = yaw_to_forward(yaw)
        move_vel = jnp.sum(disp * fwd_axis, axis=-1)  # m/step along forward
        near = dist <= 1.5
        backup = near & (move_vel < -1e-3)
        yield_ = near & (jnp.abs(move_vel) < 0.02) & ~backup
        state = dataclasses.replace(
            state,
            follow_steps=jnp.where(facing, state.follow_steps + 1, 0),
            found_steps=state.found_steps + visible.astype(jnp.int32),
            found_ever=found_now,
            found_step=found_step,
            dis_sum=state.dis_sum + dist,
            dis_after_sum=state.dis_after_sum
            + jnp.where(found_now, dist, 0.0),
            after_found_times=state.after_found_times
            + (found_now & visible).astype(jnp.int32),
            step_after_found=state.step_after_found
            + found_now.astype(jnp.int32),
            backup_count=state.backup_count + backup.astype(jnp.int32),
            yield_count=state.yield_count + yield_.astype(jnp.int32),
        )

        m = self._measures(state)
        episode_over = stop | (state.step >= self.max_episode_steps)
        done = episode_over | (m["success"] > 0)
        # SocialNavReward shaping (reference social_nav_sensors.py:37):
        # approach the humanoid into the band, penalty for collisions
        # facing-progress shaping: each CONSECUTIVE facing step pays more, so
        # the policy learns to hold the follow band rather than graze it
        # (round-1 nav_seek_success was 4.8% with a flat facing bonus)
        r = (
            -0.01
            + 0.5 * (prev_dist - dist) * (~in_band).astype(jnp.float32)
            + 0.1 * facing.astype(jnp.float32)
            + 0.05 * jnp.minimum(state.follow_steps, self.need_to_face)
            * facing.astype(jnp.float32)
            - 1.0 * (dist < self.collide_dist).astype(jnp.float32)
            + 5.0 * m["success"] * (state.follow_steps == self.need_to_face)
        )
        info = dict(m)

        # auto-reset
        ep_ptr = jnp.where(done, state.ep_ptr + 1, state.ep_ptr)
        ep_idx = self.order[jnp.arange(n), ep_ptr % self._order_len]
        fresh = self._fresh(ep_idx, state.key)
        sel = lambda new, old: jnp.where(
            done.reshape((n,) + (1,) * (old.ndim - 1)), new, old
        )
        state = SocialNavState(
            ep_ptr=ep_ptr,
            ep_idx=jnp.where(done, ep_idx, state.ep_idx),
            step=sel(fresh.step, state.step),
            pos=sel(fresh.pos, state.pos),
            yaw=sel(fresh.yaw, state.yaw),
            human_pos=sel(fresh.human_pos, state.human_pos),
            human_yaw=sel(fresh.human_yaw, state.human_yaw),
            human_wp=sel(fresh.human_wp, state.human_wp),
            follow_steps=sel(fresh.follow_steps, state.follow_steps),
            found_steps=sel(fresh.found_steps, state.found_steps),
            min_human_dist=sel(fresh.min_human_dist, state.min_human_dist),
            found_ever=sel(fresh.found_ever, state.found_ever),
            found_step=sel(fresh.found_step, state.found_step),
            dis_sum=sel(fresh.dis_sum, state.dis_sum),
            dis_after_sum=sel(fresh.dis_after_sum, state.dis_after_sum),
            after_found_times=sel(
                fresh.after_found_times, state.after_found_times
            ),
            step_after_found=sel(
                fresh.step_after_found, state.step_after_found
            ),
            backup_count=sel(fresh.backup_count, state.backup_count),
            yield_count=sel(fresh.yield_count, state.yield_count),
            stop_called=sel(fresh.stop_called, state.stop_called),
            collided=sel(fresh.collided, state.collided),
            agents_collide=sel(fresh.agents_collide, state.agents_collide),
            episode_over=episode_over,
            episode_count=state.episode_count + done.astype(jnp.int32),
            key=state.key,
        )
        return state, self._observations(state), r, done, info

    def reset(self, seed: int = 0):
        return self._jit_reset(jax.random.PRNGKey(seed))

    def step(self, state, actions):
        return self._jit_step(state, jnp.asarray(actions))


def make_social_nav_env(
    num_envs: int = 8,
    num_scenes: int = 2,
    episodes_per_scene: int = 8,
    seed: int = 0,
    n_rooms_per_axis: int = 1,
    num_waypoints: int = 4,
    **env_kw,
) -> SocialNavBatchedEnv:
    from habitat_tpu.core.dataset import build_env_episode_order, Episode
    from habitat_tpu.sims.procedural import generate_apartment
    from habitat_tpu.sims.scene import pack_scenes

    rng = np.random.default_rng(seed)
    scenes = [
        generate_apartment(
            seed=seed * 77 + s, extent=8.0, n_rooms_per_axis=n_rooms_per_axis, n_clutter=2
        )
        for s in range(num_scenes)
    ]
    episodes = []
    rows = []
    for si, scene in enumerate(scenes):
        for e in range(episodes_per_scene):
            start = scene.sample_navigable_point(rng)
            hstart = scene.sample_navigable_point(rng)
            wps = np.stack(
                [scene.sample_navigable_point(rng) for _ in range(num_waypoints)]
            )
            yaw = float(rng.uniform(-np.pi, np.pi))
            episodes.append(
                Episode(
                    episode_id=f"sn_{si}_{e}",
                    scene_id=scene.scene_id,
                    start_position=[float(x) for x in start],
                )
            )
            rows.append((si, start, yaw, hstart, wps))

    E = len(rows)
    table = SocialNavTable(
        scene_idx=jnp.asarray([r[0] for r in rows], jnp.int32),
        start_pos=jnp.asarray(np.stack([r[1] for r in rows]), jnp.float32),
        start_yaw=jnp.asarray([r[2] for r in rows], jnp.float32),
        human_start=jnp.asarray(np.stack([r[3] for r in rows]), jnp.float32),
        waypoints=jnp.asarray(np.stack([r[4] for r in rows]), jnp.float32),
    )
    pack = pack_scenes(scenes)
    order = build_env_episode_order(episodes, num_envs, seed=seed)
    return SocialNavBatchedEnv(pack, table, order, **env_kw)
