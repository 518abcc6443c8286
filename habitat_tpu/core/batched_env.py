"""Batched functional environment — the TPU replacement for VectorEnv.

The reference runs N envs as N worker processes over pipes
(habitat-lab/habitat/core/vector_env.py:135, worker loop :234-301) around a
single-env ``Env`` (core/env.py:236 reset, :283 step) that calls C++ habitat-sim.
Here all N envs are ONE array program: ``EnvState`` is a batched pytree in HBM,
``reset``/``step`` are pure jittable functions, auto-reset is masking
(VectorEnv's ``auto_reset_done=True`` semantics), and scene switching is an
indexed gather into the packed scene table — no processes, no pipes, no host.

Reward/done composition matches RLTaskEnv (core/environments.py:73-97):
``reward = slack + reward_measure (+ success_reward if success)``,
``done = episode_over or (end_on_success and success)``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from gymnasium import spaces

from habitat_tpu.core.dataset import EpisodeTable
from habitat_tpu.core.embodied_task import (
    FunctionalAction,
    FunctionalMeasure,
    FunctionalSensor,
    StepContext,
    order_measures,
)
from habitat_tpu.ops import navgrid as ng
from habitat_tpu.ops.raycast import render_batch
from habitat_tpu.sims.scene import ScenePack
from habitat_tpu.tasks.nav import VisualSensorSpec, DepthSensor
from habitat_tpu.utils.geometry import yaw_to_forward


@jtu.register_dataclass
@dataclasses.dataclass
class EnvState:
    """Batched env state (one pytree for all N envs, resident in HBM)."""

    ep_ptr: jnp.ndarray  # (N,) i32 — position in the per-env episode order
    ep_idx: jnp.ndarray  # (N,) i32 — current episode id
    step: jnp.ndarray  # (N,) i32
    pos: jnp.ndarray  # (N,3) f32
    yaw: jnp.ndarray  # (N,) f32
    pitch: jnp.ndarray  # (N,) f32
    prev_pos: jnp.ndarray  # (N,3) f32
    stop_called: jnp.ndarray  # (N,) bool
    collided: jnp.ndarray  # (N,) bool — last step
    collision_count: jnp.ndarray  # (N,) i32
    last_action: jnp.ndarray  # (N,) i32
    episode_over: jnp.ndarray  # (N,) bool
    episode_count: jnp.ndarray  # (N,) i32 — completed episodes
    measure_state: Dict[str, Any]
    key: jax.Array  # PRNG key


@dataclasses.dataclass(frozen=True)
class RewardSpec:
    """RLTaskEnv reward composition (reference core/environments.py:42-97)."""

    reward_measure: str = "distance_to_goal_reward"
    success_measure: str = "success"
    slack_reward: float = -0.01
    success_reward: float = 2.5
    end_on_success: bool = True


class BatchedEnv:
    """N batched envs over a ScenePack + EpisodeTable.

    Exposes pure ``reset_fn(key)`` / ``step_fn(state, actions)`` for fusion
    into larger jits (the PPO trainer runs them inside lax.scan), plus jitted
    host conveniences ``reset()`` / ``step(actions)``.
    """

    def __init__(
        self,
        pack: ScenePack,
        table: EpisodeTable,
        episode_order: np.ndarray,  # (N, L) int32 per-env episode schedule
        sensors: Sequence[FunctionalSensor],
        measures: Sequence[FunctionalMeasure],
        actions: Sequence[FunctionalAction],
        *,
        max_episode_steps: int = 500,
        reward_spec: RewardSpec = RewardSpec(),
        slide_substeps: int = 4,
        auto_reset_done: bool = True,
    ):
        self.pack = pack
        self.table = table
        self.order = jnp.asarray(episode_order, jnp.int32)
        self.num_envs = int(episode_order.shape[0])
        self._order_len = int(episode_order.shape[1])
        self.sensors = tuple(sensors)
        self.measures = order_measures(measures)
        self.actions = tuple(actions)
        self.max_episode_steps = int(max_episode_steps)
        self.reward_spec = reward_spec
        self.slide_substeps = slide_substeps
        self.auto_reset_done = auto_reset_done

        # fused per-action parameter tables (stop/move/turn/tilt)
        self._move_amt = jnp.asarray([a.move_amount() for a in self.actions], jnp.float32)
        self._turn_amt = jnp.asarray([a.turn_amount() for a in self.actions], jnp.float32)
        self._tilt_amt = jnp.asarray([a.tilt_amount() for a in self.actions], jnp.float32)
        self._stop_flag = jnp.asarray([a.is_stop() for a in self.actions], bool)

        self.visual_sensors: Tuple[VisualSensorSpec, ...] = tuple(
            s for s in self.sensors if isinstance(s, VisualSensorSpec)
        )
        self.state_sensors = tuple(
            s for s in self.sensors if not isinstance(s, VisualSensorSpec)
        )
        if self.visual_sensors:
            # render groups: one fused raycast per distinct camera model
            # (resolution/hfov/projection/height). The reference attaches any
            # number of differently-configured sensors to the agent
            # (habitat_simulator.py sensor suite); declaring e.g. a 42deg RGB
            # next to a 58deg goal camera just costs one extra pass here.
            by_cam: Dict[Tuple, List[VisualSensorSpec]] = {}
            for s in self.visual_sensors:
                key = (s.height, s.width, s.hfov, s.projection, s.position_y)
                by_cam.setdefault(key, []).append(s)
            self._render_groups = []
            for (h, w, hfov, proj, cam_y), sensors in by_cam.items():
                depth_cfgs = [s for s in sensors if isinstance(s, DepthSensor)]
                d = depth_cfgs[0] if depth_cfgs else DepthSensor(None)
                self._render_groups.append(
                    dict(
                        h=h, w=w, hfov=hfov, proj=proj, cam_y=cam_y,
                        sensors=tuple(sensors),
                        depth_cfg=(d.min_depth, d.max_depth, d.normalize_depth),
                    )
                )
            # single-group fast-path attrs (kept for introspection/tests)
            g0 = self._render_groups[0]
            self._render_h, self._render_w = g0["h"], g0["w"]
            self._render_hfov, self._render_proj = g0["hfov"], g0["proj"]
            self._depth_cfg = g0["depth_cfg"]
            self._cam_height = g0["cam_y"]

        # velocity control (reference VelocityAction, nav.py:1170-1256):
        # when the task declares velocity_control, the env runs continuous
        # (lin, ang) commands integrated through the substep loop below
        self._vel_ctrl = next(
            (a for a in self.actions if a.name == "velocity_control"), None
        )
        if self._vel_ctrl is not None:
            self.action_space = spaces.Box(-1.0, 1.0, (2,), np.float32)
        else:
            self.action_space = spaces.Discrete(len(self.actions))
        self.action_names = tuple(a.name for a in self.actions)
        self.observation_space = spaces.Dict(
            {s.uuid: s.observation_space() for s in self.sensors}
        )

        # the scene pack / episode table / order are DATA: the jitted host
        # conveniences pass them as arguments so they are XLA parameters, not
        # giant embedded constants (which melt the compiler at scale); fused
        # trainers should do the same via ``env_data``
        self._jit_reset = jax.jit(
            lambda data, key: self.reset_fn(key, env_data=data)
        )
        self._jit_step = jax.jit(
            lambda data, state, a: self.step_fn(state, a, env_data=data),
            donate_argnums=(1,),
        )

    @property
    def env_data(self):
        """(pack, table, order) pytree — pass through jit boundaries."""
        return (self.pack, self.table, self.order)

    # ------------------------------------------------------------------
    # functional core
    # ------------------------------------------------------------------

    def _episode_pose(self, ep_idx, table=None):
        table = self.table if table is None else table
        pos = table.start_pos[ep_idx]
        yaw = table.start_yaw[ep_idx]
        return pos, yaw

    def _make_ctx(self, state: EnvState, pack=None, table=None) -> StepContext:
        pack = self.pack if pack is None else pack
        table = self.table if table is None else table
        sid = table.scene_idx[state.ep_idx]
        return StepContext(
            pack=pack,
            table=table,
            ep_idx=state.ep_idx,
            sid=sid,
            pos=state.pos,
            yaw=state.yaw,
            pitch=state.pitch,
            prev_pos=state.prev_pos,
            start_pos=table.start_pos[state.ep_idx],
            start_yaw=table.start_yaw[state.ep_idx],
            step=state.step,
            action=state.last_action,
            stop_called=state.stop_called,
            collided=state.collided,
            collision_count=state.collision_count,
            rng=jnp.zeros((state.pos.shape[0], 2), jnp.uint32),
        )

    def _observations(self, state: EnvState, pack=None, table=None) -> Dict[str, jnp.ndarray]:
        pack = self.pack if pack is None else pack
        ctx = self._make_ctx(state, pack, table)
        obs = {s.uuid: s.compute(ctx) for s in self.state_sensors}
        for g in getattr(self, "_render_groups", ()):
            cam_pos = state.pos + jnp.array([0.0, g["cam_y"], 0.0])
            mn, mx, norm = g["depth_cfg"]
            frames = render_batch(
                pack,
                ctx.sid,
                cam_pos,
                state.yaw,
                state.pitch,
                height=g["h"],
                width=g["w"],
                hfov_deg=g["hfov"],
                min_depth=mn,
                max_depth=mx,
                normalize_depth=norm,
                projection=g["proj"],
            )
            for s in g["sensors"]:
                obs[s.uuid] = frames[s.uuid]
        return obs

    def reset_fn(
        self, key: jax.Array, env_data=None
    ) -> Tuple[EnvState, Dict[str, jnp.ndarray]]:
        pack, table, order = env_data if env_data is not None else self.env_data
        n = self.num_envs
        ep_ptr = jnp.zeros((n,), jnp.int32)
        env_ids = jnp.arange(n)
        ep_idx = order[env_ids, ep_ptr % self._order_len]
        pos, yaw = self._episode_pose(ep_idx, table)
        state = EnvState(
            ep_ptr=ep_ptr,
            ep_idx=ep_idx,
            step=jnp.zeros((n,), jnp.int32),
            pos=pos,
            yaw=yaw,
            pitch=jnp.zeros((n,), jnp.float32),
            prev_pos=pos,
            stop_called=jnp.zeros((n,), bool),
            collided=jnp.zeros((n,), bool),
            collision_count=jnp.zeros((n,), jnp.int32),
            last_action=jnp.full((n,), -1, jnp.int32),
            episode_over=jnp.zeros((n,), bool),
            episode_count=jnp.zeros((n,), jnp.int32),
            measure_state={},
            key=key,
        )
        ctx = self._make_ctx(state, pack, table)
        mstate: Dict[str, Any] = {}
        for m in self.measures:
            ms, _ = m.reset(ctx)
            mstate[m.uuid] = ms
        state = dataclasses.replace(state, measure_state=mstate)
        return state, self._observations(state, pack, table)

    def reset_to_fn(self, key: jax.Array, ep_idx: jnp.ndarray, env_data=None):
        """Reset all envs to explicit episode ids (host Env / evaluator use)."""
        pack, table, order = env_data if env_data is not None else self.env_data
        state, _ = self.reset_fn(key, env_data)
        state = dataclasses.replace(state, ep_idx=jnp.asarray(ep_idx, jnp.int32))
        pos, yaw = self._episode_pose(state.ep_idx, table)
        state = dataclasses.replace(state, pos=pos, yaw=yaw, prev_pos=pos)
        ctx = self._make_ctx(state, pack, table)
        mstate = {}
        for m in self.measures:
            ms, _ = m.reset(ctx)
            mstate[m.uuid] = ms
        state = dataclasses.replace(state, measure_state=mstate)
        return state, self._observations(state, pack, table)

    def measure_values(self, state: EnvState):
        """Current measure values without stepping (Env.get_metrics parity)."""
        ctx = self._make_ctx(state)
        values = {}
        mstate = dict(state.measure_state)
        for m in self.measures:
            ms, v = m.update(mstate[m.uuid], ctx, values)
            values[m.uuid] = v
        return values

    def step_fn(
        self, state: EnvState, actions: jnp.ndarray, env_data=None
    ) -> Tuple[EnvState, Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """One batched step. Returns (state, obs, reward, done, info).

        env_data: optional (pack, table, order) passed as jit ARGUMENTS —
        required at scale (embedding multi-MB tables as closure constants
        chokes XLA constant handling; see env_data property)."""
        pack, table, order = env_data if env_data is not None else self.env_data
        sid = table.scene_idx[state.ep_idx]

        if self._vel_ctrl is not None:
            # velocity control through the substep loop (reference
            # VelocityAction, nav.py:1170-1256: VelocityControl integrates
            # rigid state inside sim.step_filter; auto-stop under the
            # min-speed thresholds). Commands in [-1, 1] map onto the
            # configured ranges; the arc integrates as `slide_substeps`
            # rotate-then-translate sub-moves, each collision-resolved.
            vc = self._vel_ctrl
            acts = jnp.clip(actions.astype(jnp.float32), -1.0, 1.0)
            lo_l, hi_l = float(vc.lin_vel_range[0]), float(vc.lin_vel_range[1])
            lo_a, hi_a = float(vc.ang_vel_range[0]), float(vc.ang_vel_range[1])
            lin_v = lo_l + (acts[:, 0] + 1.0) * 0.5 * (hi_l - lo_l)
            ang_v = lo_a + (acts[:, 1] + 1.0) * 0.5 * (hi_a - lo_a)
            ang_v_rad = jnp.deg2rad(ang_v)
            dt = float(vc.time_step)
            auto_stop = (jnp.abs(lin_v) < float(vc.min_abs_lin_speed)) & (
                jnp.abs(jnp.deg2rad(ang_v)) < np.deg2rad(float(vc.min_abs_ang_speed))
            )
            stop = state.stop_called | auto_stop
            nsub = max(self.slide_substeps, 1)
            yaw = state.yaw
            new_pos = state.pos
            collided = jnp.zeros((self.num_envs,), bool)
            for _ in range(nsub):
                yaw = yaw + ang_v_rad * (dt / nsub)
                tgt = new_pos + yaw_to_forward(yaw) * (lin_v * dt / nsub)[:, None]
                new_pos, c = jax.vmap(
                    functools.partial(ng.try_step, pack, n_substeps=1)
                )(sid, new_pos, tgt)
                collided = collided | c
            moved = jnp.abs(lin_v) * dt > 1e-6
            collided = collided & moved
            pitch = state.pitch
            a = jnp.zeros((self.num_envs,), jnp.int32)
        else:
            a = actions.astype(jnp.int32)
            stop = state.stop_called | self._stop_flag[a]
            yaw = state.yaw + self._turn_amt[a]
            pitch = jnp.clip(
                state.pitch + self._tilt_amt[a], -np.pi / 2, np.pi / 2
            )
            move = self._move_amt[a]
            target = state.pos + yaw_to_forward(yaw) * move[:, None]
            new_pos, collided = jax.vmap(
                functools.partial(ng.try_step, pack, n_substeps=self.slide_substeps)
            )(sid, state.pos, target)
            moved = move > 0
            collided = collided & moved
            new_pos = jnp.where(moved[:, None], new_pos, state.pos)

        step = state.step + 1
        state = dataclasses.replace(
            state,
            pos=new_pos,
            yaw=yaw,
            pitch=pitch,
            prev_pos=state.pos,
            stop_called=stop,
            collided=collided,
            collision_count=state.collision_count + collided.astype(jnp.int32),
            last_action=a,
            step=step,
        )

        # measures in dependency order (reference update_measures,
        # embodied_task.py:168-173)
        ctx = self._make_ctx(state, pack, table)
        values: Dict[str, jnp.ndarray] = {}
        new_mstate: Dict[str, Any] = {}
        for m in self.measures:
            ms, v = m.update(state.measure_state[m.uuid], ctx, values)
            new_mstate[m.uuid] = ms
            values[m.uuid] = v

        # episode termination (Env._past_limit, core/env.py:222 + stop)
        episode_over = stop | (step >= self.max_episode_steps)
        rs = self.reward_spec
        success_val = values.get(rs.success_measure, jnp.zeros_like(step, dtype=jnp.float32))
        is_success = success_val > 0
        done = episode_over | (is_success if rs.end_on_success else jnp.zeros_like(episode_over))

        reward = (
            rs.slack_reward
            + values.get(rs.reward_measure, jnp.zeros_like(success_val))
            + rs.success_reward * is_success.astype(jnp.float32)
        )

        info = dict(values)
        info["is_collision"] = collided.astype(jnp.float32)

        if not self.auto_reset_done:
            state = dataclasses.replace(
                state, episode_over=episode_over, measure_state=new_mstate
            )
            obs = self._observations(state, pack, table)
            return state, obs, reward, done, info

        # ---- auto-reset done envs (VectorEnv auto_reset_done semantics) ----
        n = self.num_envs
        env_ids = jnp.arange(n)
        ep_ptr = jnp.where(done, state.ep_ptr + 1, state.ep_ptr)
        ep_idx = order[env_ids, ep_ptr % self._order_len]
        rpos, ryaw = self._episode_pose(ep_idx, table)
        d1 = done[:, None]
        state = dataclasses.replace(
            state,
            ep_ptr=ep_ptr,
            ep_idx=ep_idx,
            step=jnp.where(done, 0, step),
            pos=jnp.where(d1, rpos, state.pos),
            yaw=jnp.where(done, ryaw, yaw),
            pitch=jnp.where(done, 0.0, pitch),
            prev_pos=jnp.where(d1, rpos, state.prev_pos),
            stop_called=jnp.where(done, False, stop),
            collided=jnp.where(done, False, collided),
            collision_count=jnp.where(done, 0, state.collision_count),
            last_action=jnp.where(done, -1, a),
            episode_over=episode_over,
            episode_count=state.episode_count + done.astype(jnp.int32),
            measure_state=new_mstate,
        )

        # merge measure reset state for done envs
        reset_ctx = self._make_ctx(state, pack, table)
        merged: Dict[str, Any] = {}
        for m in self.measures:
            rms, _ = m.reset(reset_ctx)
            merged[m.uuid] = jtu.tree_map(
                lambda r, u: jnp.where(
                    done.reshape(done.shape + (1,) * (r.ndim - 1)), r, u
                )
                if hasattr(r, "ndim") and r.ndim >= 1
                else u,
                rms,
                new_mstate[m.uuid],
            )
        state = dataclasses.replace(state, measure_state=merged)

        obs = self._observations(state, pack, table)
        return state, obs, reward, done, info

    # ------------------------------------------------------------------
    # host conveniences
    # ------------------------------------------------------------------

    def reset(self, seed: int = 0):
        return self._jit_reset(self.env_data, jax.random.PRNGKey(seed))

    def step(self, state: EnvState, actions):
        return self._jit_step(self.env_data, state, jnp.asarray(actions))

    def get_metrics(self, info) -> Dict[str, np.ndarray]:
        """Host view of the last info dict (Env.get_metrics parity)."""
        return {k: np.asarray(v) for k, v in info.items()}
