"""Host-facing Env / RLEnv — single-env API parity layer.

Counterpart of the reference's fundamental Env (habitat-lab/habitat/core/
env.py: reset:236, step:283, _past_limit:222, get_metrics:219, seed:331) and
RLEnv (:358-494). The TPU hot path is core/batched_env.py (all envs in one
array program); this class exists so reference-style user code, examples and
Benchmark agents run unchanged: it drives a 1-env BatchedEnv with a host
EpisodeIterator for episode scheduling (exact iterator semantics: cycling,
shuffling, scene grouping — core/dataset.py).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Iterator, List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from habitat_tpu.config.omega import Config
from habitat_tpu.core.dataset import Dataset, Episode
from habitat_tpu.core.embodied_task import Metrics
from habitat_tpu.core.logging import logger


class Env:
    observation_space: Any
    action_space: Any

    def __init__(self, config: Config, dataset: Optional[Dataset] = None) -> None:
        from habitat_tpu.core.construct import (
            _action_instances,
            _measure_instances,
            _sensor_instances,
            load_dataset,
        )
        from habitat_tpu.core.batched_env import BatchedEnv, RewardSpec
        from habitat_tpu.core.dataset import build_episode_table
        from habitat_tpu.sims.scene import pack_scenes

        self._config = config
        if dataset is not None:
            self._dataset = dataset
            scenes = None
            fields = None
            from habitat_tpu.sims.loaders import load_scene

            scenes = [load_scene(sid) for sid in dataset.scene_ids]
            episodes = dataset.episodes
        else:
            scenes, episodes, fields = load_dataset(config.habitat.dataset)
            self._dataset = Dataset(episodes)

        assert len(episodes) > 0, "Env requires a non-empty dataset"
        self._episodes: List[Episode] = list(episodes)
        self._ep_index = {e.episode_id: i for i, e in enumerate(self._episodes)}

        it = config.habitat.environment.get("iterator_options", Config())
        self._episode_iterator = self._dataset.get_episode_iterator(
            cycle=bool(it.get("cycle", True)),
            shuffle=bool(it.get("shuffle", True)),
            group_by_scene=bool(it.get("group_by_scene", True)),
            max_scene_repeat_episodes=int(it.get("max_scene_repeat_episodes", -1)),
            # reference IteratorOptionsConfig default (structured_configs:109)
            max_scene_repeat_steps=int(it.get("max_scene_repeat_steps", int(1e4))),
            num_episode_sample=int(it.get("num_episode_sample", -1)),
            step_repetition_range=float(it.get("step_repetition_range", 0.2)),
            seed=int(config.habitat.get("seed", 100)),
        )

        scene_index = {s.scene_id: i for i, s in enumerate(scenes)}
        scene_map = {s.scene_id: s for s in scenes}
        self._scene_map = scene_map
        pack = pack_scenes(list(scenes))
        table = build_episode_table(
            self._episodes, scene_map, scene_index, precomputed_fields=fields
        )
        order = np.zeros((1, 1), np.int32)
        task = config.habitat.task
        # host-side measures (TopDownMap / RuntimePerfStats / GfxReplay —
        # reference strips these from training workers too,
        # habitat_baselines/common/habitat_env_factory.py:76-93): updated on
        # the host after each step, surfaced through get_metrics() alongside
        # the device measures
        all_measures = _measure_instances(config)
        self._host_measures = [
            m for m in all_measures if getattr(m, "host_side", False)
        ]
        device_measures = [
            m for m in all_measures if not getattr(m, "host_side", False)
        ]
        self._inner = BatchedEnv(
            pack,
            table,
            order,
            _sensor_instances(config),
            device_measures,
            _action_instances(config),
            max_episode_steps=int(
                config.habitat.environment.get("max_episode_steps", 500)
            ),
            reward_spec=RewardSpec(
                reward_measure=task.get("reward_measure") or "distance_to_goal_reward",
                success_measure=task.get("success_measure") or "success",
                slack_reward=float(task.get("slack_reward", -0.01)),
                success_reward=float(task.get("success_reward", 2.5)),
                end_on_success=bool(task.get("end_on_success", False)),
            ),
            auto_reset_done=False,
        )
        self.observation_space = self._inner.observation_space
        self.action_space = self._inner.action_space
        self.number_of_episodes = len(self._episodes)
        self._current_episode: Optional[Episode] = None
        self._state = None
        self._last_info: Dict[str, Any] = {}
        self._episode_over = False
        self._elapsed_steps = 0
        self._episode_start_time: Optional[float] = None
        self._key = jax.random.PRNGKey(int(config.habitat.get("seed", 100)))

    # -- properties (reference env.py surface) -----------------------------
    @property
    def current_episode(self) -> Episode:
        assert self._current_episode is not None
        return self._current_episode

    @property
    def episodes(self) -> List[Episode]:
        return self._episodes

    @property
    def episode_iterator(self) -> Iterator:
        return self._episode_iterator

    @property
    def sim(self):
        return self._inner

    @property
    def task(self):
        return self._inner

    @property
    def episode_over(self) -> bool:
        return self._episode_over

    @property
    def episode_start_time(self) -> Optional[float]:
        return self._episode_start_time

    @property
    def elapsed_steps(self) -> int:
        return self._elapsed_steps

    def get_metrics(self) -> Metrics:
        return Metrics(self._last_info)

    def _past_limit(self) -> bool:
        max_steps = self._inner.max_episode_steps
        return max_steps != 0 and self._elapsed_steps >= max_steps

    # -- lifecycle ----------------------------------------------------------
    def reset(self) -> Dict[str, np.ndarray]:
        self._episode_start_time = time.time()
        self._episode_over = False
        self._elapsed_steps = 0
        self._current_episode = next(self._episode_iterator)
        idx = self._ep_index[self._current_episode.episode_id]
        self._key, k = jax.random.split(self._key)
        if not hasattr(self, "_jit_reset_to"):
            self._jit_reset_to = jax.jit(
                lambda data, key, idx: self._inner.reset_to_fn(key, idx, env_data=data)
            )
        self._state, obs = self._jit_reset_to(
            self._inner.env_data, k, jnp.asarray([idx], jnp.int32)
        )
        self._last_info = {
            k2: np.asarray(v)[0]
            for k2, v in self._inner.measure_values(self._state).items()
        }
        if self._host_measures:
            scene = self._scene_map.get(self._current_episode.scene_id)
            pos = np.asarray(self._state.pos)[0]
            yaw = float(np.asarray(self._state.yaw)[0])
            for m in self._host_measures:
                self._last_info[m.uuid] = m.host_reset(
                    scene, self._current_episode, pos, yaw
                )
        return {k2: np.asarray(v[0]) for k2, v in obs.items()}

    def step(
        self, action: Union[int, str, Dict[str, Any]], **kwargs
    ) -> Dict[str, np.ndarray]:
        assert self._current_episode is not None, "Call reset before step"
        assert not self._episode_over, "Episode over; call reset"
        if isinstance(action, dict):
            action = action["action"]
        if isinstance(action, str):
            action = self._inner.action_names.index(action)
        self._state, obs, reward, done, info = self._inner._jit_step(
            self._inner.env_data, self._state, jnp.asarray([action], jnp.int32)
        )
        self._elapsed_steps += 1
        self._episode_over = bool(np.asarray(self._state.episode_over)[0])
        self._last_info = {k: np.asarray(v)[0] for k, v in info.items()}
        if self._host_measures:
            pos = np.asarray(self._state.pos)[0]
            yaw = float(np.asarray(self._state.yaw)[0])
            for m in self._host_measures:
                self._last_info[m.uuid] = m.host_update(
                    pos, yaw, episode_over=self._episode_over
                )
        self._last_reward_done = (float(np.asarray(reward)[0]), bool(np.asarray(done)[0]))
        if self._episode_iterator is not None:
            self._episode_iterator.step_taken()
        return {k: np.asarray(v[0]) for k, v in obs.items()}

    def seed(self, seed: int) -> None:
        self._key = jax.random.PRNGKey(seed)

    def reconfigure(self, config: Config) -> None:
        self._config = config

    def render(self, mode: str = "rgb") -> np.ndarray:
        obs = self._inner._observations(self._state)
        if "rgb" in obs:
            return np.asarray(obs["rgb"][0])
        if "depth" in obs:
            d = np.asarray(obs["depth"][0])
            return (np.repeat(d, 3, axis=-1) * 255).astype(np.uint8)
        # no visual sensors: render a debug frame through the raycaster
        from habitat_tpu.ops.raycast import render_batch
        import jax.numpy as jnp

        out = render_batch(
            self._inner.pack,
            self._inner.table.scene_idx[self._state.ep_idx][:1],
            self._state.pos[:1] + jnp.array([0.0, 1.25, 0.0]),
            self._state.yaw[:1],
            self._state.pitch[:1],
            height=256,
            width=256,
        )
        return np.asarray(out["rgb"][0])

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


class RLEnv:
    """gym-style wrapper with reward/done/info (reference core/env.py:358-494).

    The concrete reward composition lives in the batched engine (RewardSpec ==
    RLTaskEnv, core/environments.py:42); subclasses may override
    get_reward/get_done/get_info for custom shaping.
    """

    def __init__(self, config: Config, dataset: Optional[Dataset] = None):
        self._env = Env(config, dataset)
        self.observation_space = self._env.observation_space
        self.action_space = self._env.action_space
        self.number_of_episodes = self._env.number_of_episodes
        self.reward_range = (-float("inf"), float("inf"))

    @property
    def env(self) -> Env:
        return self._env

    @property
    def habitat_env(self) -> Env:
        return self._env

    @property
    def episodes(self) -> List[Episode]:
        return self._env.episodes

    @property
    def current_episode(self) -> Episode:
        return self._env.current_episode

    def reset(self, *, return_info: bool = False, **kwargs):
        obs = self._env.reset()
        if return_info:
            return obs, self.get_info(obs)
        return obs

    def get_reward_range(self):
        return self.reward_range

    def get_reward(self, observations) -> float:
        return self._env._last_reward_done[0]

    def get_done(self, observations) -> bool:
        return self._env._last_reward_done[1]

    def get_info(self, observations) -> dict:
        return dict(self._env.get_metrics())

    def step(self, *args, **kwargs):
        obs = self._env.step(*args, **kwargs)
        return obs, self.get_reward(obs), self.get_done(obs), self.get_info(obs)

    def seed(self, seed=None):
        self._env.seed(seed)

    def render(self, mode: str = "rgb"):
        return self._env.render(mode)

    def close(self):
        self._env.close()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()
