"""Remote (evalai gRPC) evaluation over localhost: the full reference
protocol loop (core/benchmark.py:44-121) with the challenge-side env
server from core/evalai_remote.py — zero egress, real wire traffic.

Also pins the hand-written Package codec against the protobuf wire format
it must be compatible with."""

import numpy as np
import pytest

from habitat_tpu.config.default import get_config

CFG = "benchmark/nav/pointnav/pointnav_procgen.yaml"
SMALL_OVERRIDES = [
    "habitat.dataset.procedural.num_scenes=2",
    "habitat.dataset.procedural.episodes_per_scene=3",
    "habitat.simulator.agents.main_agent.sim_sensors.depth_sensor.width=32",
    "habitat.simulator.agents.main_agent.sim_sensors.depth_sensor.height=32",
    "habitat.environment.max_episode_steps=20",
]


def test_package_codec_wire_format():
    from habitat_tpu.core.evalai_remote import pack_package, unpack_package

    # tag 0x0A (field 1, length-delimited) + varint length + payload —
    # the exact bytes `Package(SerializedEntity=...).SerializeToString()`
    # produces, including the 2-byte varint for >127 lengths
    assert pack_package(b"abc") == b"\x0a\x03abc"
    big = b"x" * 300
    assert pack_package(big) == b"\x0a\xac\x02" + big
    assert unpack_package(pack_package(big)) == big
    assert pack_package(b"") == b""
    assert unpack_package(b"") == b""


@pytest.mark.smoke
def test_remote_evaluate_loopback_matches_local():
    """Server hosts a real env; Benchmark.remote_evaluate drives it over
    grpc. A deterministic agent on identically-seeded envs must produce
    identical averaged metrics through BOTH paths."""
    import os

    from habitat_tpu.baselines.agents.simple_agents import GoalFollower
    from habitat_tpu.core.benchmark import Benchmark
    from habitat_tpu.core.env import Env
    from habitat_tpu.core.evalai_remote import serve_env

    cfg = get_config(CFG, SMALL_OVERRIDES)

    # challenge side: env behind the grpc service on an ephemeral port
    server_env = Env(cfg)
    server, port = serve_env(server_env, "localhost:0")
    try:
        os.environ["EVALENV_ADDPORT"] = f"localhost:{port}"
        bench = Benchmark(CFG, eval_remote=True)
        assert bench._env is None  # reference: remote builds no local env
        remote_metrics = bench.evaluate(GoalFollower(), num_episodes=2)
    finally:
        server.stop(None)
        server_env.close()
        os.environ.pop("EVALENV_ADDPORT", None)

    local_env = Env(cfg)

    class _B(Benchmark):
        def __init__(self):
            self._eval_remote = False
            self._env = local_env

    local_metrics = _B().evaluate(GoalFollower(), num_episodes=2)
    local_env.close()

    assert "spl" in remote_metrics and "success" in remote_metrics
    assert set(remote_metrics) == set(local_metrics)
    for k in local_metrics:
        assert np.isclose(remote_metrics[k], local_metrics[k]), (
            k, remote_metrics[k], local_metrics[k],
        )
