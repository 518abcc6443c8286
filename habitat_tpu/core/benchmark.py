"""Benchmark — agent-vs-env evaluation loop (reference core/benchmark.py:23).

The remote (evalai gRPC) path is stubbed: this image has zero egress; local
evaluation matches the reference loop exactly.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

from habitat_tpu.core.agent import Agent
from habitat_tpu.core.env import Env
from habitat_tpu.core.logging import logger


class Benchmark:
    def __init__(self, config_path: Optional[str] = None, eval_remote: bool = False):
        from habitat_tpu.config.default import get_config

        config_env = get_config(config_path or "benchmark/nav/pointnav/pointnav_procgen.yaml")
        self._eval_remote = eval_remote
        self._env = Env(config_env)

    def remote_evaluate(self, agent: Agent, num_episodes: Optional[int] = None):
        raise NotImplementedError(
            "remote evaluation (evalai gRPC) is unavailable in this environment"
        )

    def local_evaluate(
        self, agent: Agent, num_episodes: Optional[int] = None
    ) -> Dict[str, float]:
        if num_episodes is None:
            num_episodes = len(self._env.episodes)
        assert num_episodes <= len(self._env.episodes), (
            "num_episodes({}) is larger than number of episodes in environment ({})"
        ).format(num_episodes, len(self._env.episodes))
        assert num_episodes > 0

        agg_metrics: Dict[str, float] = defaultdict(float)
        count_episodes = 0
        while count_episodes < num_episodes:
            agent.reset()
            observations = self._env.reset()
            while not self._env.episode_over:
                action = agent.act(observations)
                observations = self._env.step(action)
            metrics = self._env.get_metrics()
            for m, v in metrics.items():
                if isinstance(v, dict):
                    for sub_m, sub_v in v.items():
                        agg_metrics[m + "/" + str(sub_m)] += sub_v
                else:
                    agg_metrics[m] += float(v)
            count_episodes += 1

        return {k: v / count_episodes for k, v in agg_metrics.items()}

    def evaluate(
        self, agent: Agent, num_episodes: Optional[int] = None
    ) -> Dict[str, float]:
        if self._eval_remote:
            return self.remote_evaluate(agent, num_episodes)
        return self.local_evaluate(agent, num_episodes)


class Challenge(Benchmark):
    """reference core/challenge.py."""

    def __init__(self, eval_remote: bool = False):
        import os

        config_path = os.environ.get(
            "CHALLENGE_CONFIG_FILE", "benchmark/nav/pointnav/pointnav_procgen.yaml"
        )
        super().__init__(config_path, eval_remote=eval_remote)

    def submit(self, agent: Agent):
        metrics = self.evaluate(agent)
        for k, v in metrics.items():
            logger.info(f"{k}: {v}")
        return metrics
