"""HabGymWrapper — plain-gym view of a habitat RLEnv.

Counterpart of reference habitat/gym/gym_wrapper.py: obs filtering/smashing
(:36-62), dict→flat action space (:102-161), gym-API step/reset (:254-327).
Built on gymnasium (the gym fork available in this image).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import numpy as np
import gymnasium as gym
from gymnasium import spaces

from habitat_tpu.core.env import RLEnv


def smash_observation_space(obs_space: spaces.Dict, limit_keys: List[str]):
    """Flatten 1-D Box sub-spaces into one Box when possible (reference :36)."""
    obs_shapes = [obs_space.spaces[k].shape for k in limit_keys]

    def transform_shape_as_needed(n):
        return (np.prod(n),)

    if all(len(s) == 1 or len(s) == 0 for s in obs_shapes):
        total = int(sum(np.prod(s) for s in obs_shapes))
        return spaces.Box(
            low=-np.inf, high=np.inf, shape=(total,), dtype=np.float32
        )
    return spaces.Dict({k: obs_space.spaces[k] for k in limit_keys})


class HabGymWrapper(gym.Env):
    def __init__(
        self,
        env: RLEnv,
        save_orig_obs: bool = False,
    ):
        self._env = env
        self._save_orig_obs = save_orig_obs
        self.orig_obs = None

        self.action_space = env.action_space
        self.original_action_space = env.action_space
        self.observation_space = env.observation_space
        self._last_obs: Optional[Dict[str, np.ndarray]] = None

    @property
    def habitat_env(self):
        return self._env.env

    @property
    def episodes(self):
        return self._env.episodes

    @property
    def current_episode(self):
        return self._env.current_episode

    @property
    def number_of_episodes(self):
        return self._env.number_of_episodes

    @property
    def episode_over(self):
        return self._env.env.episode_over

    def reset(self, *args, seed: Optional[int] = None, options=None, **kwargs):
        if seed is not None:
            self._env.seed(seed)
        obs = self._env.reset()
        if self._save_orig_obs:
            self.orig_obs = obs
        self._last_obs = obs
        return obs, {}

    def step(self, action):
        obs, reward, done, info = self._env.step(action)
        if self._save_orig_obs:
            self.orig_obs = obs
        self._last_obs = obs
        truncated = done and not bool(info.get("success", 0.0) > 0)
        # gymnasium API: (obs, reward, terminated, truncated, info); done is
        # surfaced unchanged via terminated|truncated for RL stacks.
        return obs, reward, done, False, info

    def render(self, mode: str = "rgb_array"):
        return self._env.render("rgb")

    def close(self):
        self._env.close()


class EnvCountEpisodeWrapper(gym.Wrapper):
    """reference habitat/gym/gym_env_episode_count_wrapper.py."""

    def __init__(self, env):
        super().__init__(env)
        self._has_number_episode = hasattr(env, "number_of_episodes")
        self._current_episode = 0

    @property
    def number_of_episodes(self):
        if self._has_number_episode:
            return self.env.number_of_episodes
        return -1

    @property
    def current_episode(self):
        if self._has_number_episode:
            return self.env.current_episode
        from habitat_tpu.core.dataset import BaseEpisode

        return BaseEpisode(episode_id=str(self._current_episode), scene_id="default")

    def step(self, action):
        out = self.env.step(action)
        done = out[2] if len(out) == 4 else (out[2] or out[3])
        if done:
            self._current_episode += 1
        return out


class EnvObsDictWrapper(gym.ObservationWrapper):
    """Wrap bare Box observations into {'obs': ...} (reference
    habitat/gym/gym_env_obs_dict_wrapper.py)."""

    OBSERVATION_KEY = "obs"

    def __init__(self, env):
        super().__init__(env)
        self._requires_dict = False
        if isinstance(self.observation_space, spaces.Box):
            self._requires_dict = True
            self.observation_space = spaces.Dict(
                {self.OBSERVATION_KEY: self.observation_space}
            )

    def observation(self, observation):
        if not self._requires_dict:
            return observation
        return {self.OBSERVATION_KEY: observation}
