"""Benchmark — agent-vs-env evaluation loop (reference core/benchmark.py:23).

Both evaluation paths are implemented: local (the reference loop exactly)
and remote — the evalai gRPC protocol (reference core/benchmark.py:43-121)
via `core/evalai_remote.py` (hand-written wire-compatible Package codec +
EnvironmentStub; the challenge-side env server lives there too). The
zero-egress image cannot reach the real evalai endpoint, so the remote
loop is exercised over localhost in tests/test_evalai_remote.py.
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
        # reference: the remote path does NOT build a local env — the
        # challenge server owns it (core/benchmark.py:39-42)
        self._env = None if eval_remote else Env(config_env)

    def remote_evaluate(
        self, agent: Agent, num_episodes: Optional[int] = None
    ) -> Dict[str, float]:
        """Drive the evalai challenge server (reference loop,
        core/benchmark.py:44-121): reset -> act_on_environment until
        episode_over, get_metrics per episode, average, then
        evalai_update_submission. Server address from EVALENV_ADDPORT
        (reference default localhost:8085)."""
        import os

        import grpc

        from habitat_tpu.core.evalai_remote import EnvironmentStub

        env_address_port = os.environ.get("EVALENV_ADDPORT", "localhost:8085")
        channel = grpc.insecure_channel(env_address_port)
        stub = EnvironmentStub(channel)

        base = stub.call("num_episodes")
        total = base["num_episodes"]
        if num_episodes is not None:
            total = min(total, num_episodes)

        agg_metrics: Dict[str, float] = defaultdict(float)
        count_episodes = 0
        while count_episodes < total:
            agent.reset()
            res_env = stub.call("reset")
            action = None
            while not stub.call("episode_over")["episode_over"]:
                obs = res_env["observations"]
                action = agent.act(obs)
                res_env = stub.call("act_on_environment", action)
            metrics = stub.call("get_metrics", action)
            for m, v in metrics["metrics"].items():
                if isinstance(v, dict):
                    for sub_m, sub_v in v.items():
                        agg_metrics[m + "/" + str(sub_m)] += sub_v
                else:
                    agg_metrics[m] += float(v)
            count_episodes += 1
        avg_metrics = {k: v / count_episodes for k, v in agg_metrics.items()}
        stub.call("evalai_update_submission")
        return avg_metrics

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
