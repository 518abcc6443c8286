"""VectorEnv — API-parity facade (reference habitat-lab/habitat/core/vector_env.py).

The reference runs one env per worker PROCESS over pipes (VectorEnv:135,
worker loop :234-301, async_step_at:402, pause_at:486, call_at:511) because
its simulator is single-env and host-bound. On TPU that architecture is
obsolete: core/batched_env.py steps thousands of envs as one array program.

This facade preserves the reference's surface for user code that expects it
(construct-by-factory, sync/async step, pause/resume, call-by-name). Envs run
in-process (the reference's own ThreadedVectorEnv debugging mode,
vector_env.py:622-668, has the same execution model); "async" steps are
buffered, satisfying the one-outstanding-message discipline
(_ReadWrapper/_WriteWrapper, vector_env.py:95-132) by construction.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

STEP_COMMAND = "step"
RESET_COMMAND = "reset"
RENDER_COMMAND = "render"
CLOSE_COMMAND = "close"
CALL_COMMAND = "call"
COUNT_EPISODES_COMMAND = "count_episodes"


class VectorEnv:
    def __init__(
        self,
        make_env_fn: Callable,
        env_fn_args: Sequence[Tuple] = (),
        auto_reset_done: bool = True,
        multiprocessing_start_method: str = "forkserver",  # accepted, unused
        workers_ignore_signals: bool = False,
    ) -> None:
        self._envs = [make_env_fn(*args) for args in env_fn_args]
        assert len(self._envs) > 0, "VectorEnv requires at least one env"
        self._auto_reset_done = auto_reset_done
        self._paused: List[Tuple[int, Any]] = []
        self._pending: Dict[int, Any] = {}
        self._is_closed = False
        first = self._envs[0]
        self.observation_spaces = [e.observation_space for e in self._envs]
        self.action_spaces = [e.action_space for e in self._envs]
        self.orig_action_spaces = list(self.action_spaces)
        self.number_of_episodes = [
            getattr(e, "number_of_episodes", None) for e in self._envs
        ]

    @property
    def num_envs(self) -> int:
        return len(self._envs)

    # -- reset -------------------------------------------------------------
    def reset(self) -> List[Any]:
        return [self.reset_at(i) for i in range(self.num_envs)]

    def reset_at(self, index_env: int):
        out = self._envs[index_env].reset()
        return out

    # -- step --------------------------------------------------------------
    def _step_env(self, index_env: int, action):
        env = self._envs[index_env]
        out = env.step(action)
        if isinstance(out, tuple) and len(out) == 4 and self._auto_reset_done:
            obs, reward, done, info = out
            if done:
                obs = env.reset()
            out = (obs, reward, done, info)
        elif not isinstance(out, tuple) and self._auto_reset_done:
            if getattr(env, "episode_over", False):
                out = env.reset()
        return out

    def async_step_at(self, index_env: int, action) -> None:
        assert index_env not in self._pending, (
            "Already waiting on a step for this env"  # one-outstanding-message
        )
        self._pending[index_env] = self._step_env(index_env, action)

    def wait_step_at(self, index_env: int):
        assert index_env in self._pending, "No pending step for this env"
        return self._pending.pop(index_env)

    def async_step(self, data: Sequence) -> None:
        for i, action in enumerate(data):
            self.async_step_at(i, action)

    def wait_step(self) -> List[Any]:
        return [self.wait_step_at(i) for i in range(self.num_envs)]

    def step(self, data: Sequence) -> List[Any]:
        """Synchronous batched step (reference vector_env.py:440)."""
        self.async_step(data)
        return self.wait_step()

    def step_at(self, index_env: int, action):
        self.async_step_at(index_env, action)
        return self.wait_step_at(index_env)

    def post_step(self, observations):
        """Batch-renderer hook (reference :451) — frames are already batched
        device arrays in this engine; identity."""
        return observations

    # -- pause/resume (reference :486-510) ----------------------------------
    def pause_at(self, index: int) -> None:
        env = self._envs.pop(index)
        self.observation_spaces.pop(index)
        self.action_spaces.pop(index)
        self._paused.append((index, env))

    def resume_all(self) -> None:
        for index, env in reversed(self._paused):
            self._envs.insert(index, env)
            self.observation_spaces.insert(index, env.observation_space)
            self.action_spaces.insert(index, env.action_space)
        self._paused = []

    # -- call-by-name (reference :511-556) -----------------------------------
    def call_at(
        self,
        index: int,
        function_name: str,
        function_args: Optional[Dict[str, Any]] = None,
    ) -> Any:
        fn = getattr(self._envs[index], function_name)
        if callable(fn):
            return fn(**(function_args or {}))
        return fn

    def call(
        self,
        function_names: List[str],
        function_args_list: Optional[List[Any]] = None,
    ) -> List[Any]:
        if function_args_list is None:
            function_args_list = [None] * len(function_names)
        return [
            self.call_at(i, fn, args)
            for i, (fn, args) in enumerate(zip(function_names, function_args_list))
        ]

    def count_episodes(self) -> List[int]:
        return [len(getattr(e, "episodes", [])) for e in self._envs]

    def render(self, mode: str = "human", *args, **kwargs):
        images = [e.render(mode="rgb") for e in self._envs]
        from habitat_tpu.utils.visualizations.utils import tile_images

        tiled = tile_images(images)
        if mode == "rgb_array":
            return tiled
        return tiled

    def close(self) -> None:
        if self._is_closed:
            return
        for e in self._envs:
            e.close()
        for _, e in self._paused:
            e.close()
        self._is_closed = True

    def __del__(self):
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


class ThreadedVectorEnv(VectorEnv):
    """Same API (reference vector_env.py:622-668); in this engine both run
    in-process, so this is an alias kept for HABITAT_ENV_DEBUG parity."""
