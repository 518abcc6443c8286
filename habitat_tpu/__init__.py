"""habitat_tpu: a TPU-native embodied-AI framework (habitat-lab capabilities,
re-architected for JAX/XLA/Pallas — see SURVEY.md for the reference map).

Top-level surface mirrors the reference ``habitat`` package exports
(habitat-lab/habitat/__init__.py): Env, RLEnv, Dataset, Episode, registry,
get_config, make_dataset, Benchmark/Challenge, Agent, VectorEnv...
"""

__version__ = "0.1.0"

from habitat_tpu.core.logging import logger
from habitat_tpu.core.registry import registry

__all__ = [
    "registry",
    "logger",
    "__version__",
    "Env",
    "RLEnv",
    "Agent",
    "Benchmark",
    "Challenge",
    "Dataset",
    "Episode",
    "EpisodeIterator",
    "VectorEnv",
    "ThreadedVectorEnv",
    "Simulator",
    "SensorTypes",
    "get_config",
    "read_write",
    "make_dataset",
]


def __getattr__(name):  # lazy exports: avoid importing jax at package import
    if name in ("Env", "RLEnv"):
        from habitat_tpu.core import env as _env

        return getattr(_env, name)
    if name == "Agent":
        from habitat_tpu.core.agent import Agent

        return Agent
    if name in ("Benchmark", "Challenge"):
        from habitat_tpu.core import benchmark as _b

        return getattr(_b, name)
    if name in ("Dataset", "Episode", "EpisodeIterator"):
        from habitat_tpu.core import dataset as _d

        return getattr(_d, name)
    if name in ("VectorEnv", "ThreadedVectorEnv"):
        from habitat_tpu.core import vector_env as _v

        return getattr(_v, name)
    if name in ("Simulator", "SensorTypes", "Sensor", "SensorSuite", "AgentState"):
        from habitat_tpu.core import simulator as _s

        return getattr(_s, name)
    if name in ("get_config", "read_write"):
        from habitat_tpu.config import default as _c

        return getattr(_c, name)
    if name == "make_dataset":
        from habitat_tpu.datasets.registration import make_dataset

        return make_dataset
    raise AttributeError(name)
