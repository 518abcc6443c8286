"""Registering custom sensors and measures
(reference examples/register_new_sensors_and_measures.py) — same decorator
registry; components are pure batched functions here."""

import numpy as np
import jax.numpy as jnp
from gymnasium import spaces

import habitat_tpu as habitat
from habitat_tpu.core.embodied_task import FunctionalMeasure, FunctionalSensor
from habitat_tpu.core.registry import registry


@registry.register_sensor(name="agent_position_sensor")
class AgentPositionSensor(FunctionalSensor):
    uuid = "agent_position"

    def observation_space(self):
        return spaces.Box(low=-np.inf, high=np.inf, shape=(3,), dtype=np.float32)

    def compute(self, ctx):
        return ctx.pos.astype(jnp.float32)


@registry.register_measure(name="episode_length_squared")
class EpisodeLengthSquared(FunctionalMeasure):
    uuid = "episode_length_squared"

    def reset(self, ctx):
        return (), jnp.zeros(ctx.pos.shape[0], jnp.float32)

    def update(self, state, ctx, measures):
        return (), (ctx.step.astype(jnp.float32)) ** 2


def main():
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav

    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=1, episodes_per_scene=2
    )
    env = make_nav_env(
        scenes,
        episodes,
        num_envs=2,
        sensor_specs=(
            ("PointGoalWithGPSCompassSensor", None),
            ("agent_position_sensor", None),
        ),
        measure_specs=(
            ("DistanceToGoal", None),
            ("Success", None),
            ("episode_length_squared", None),
        ),
        precomputed_fields=fields,
    )
    state, obs = env.reset()
    print("agent_position:", np.asarray(obs["agent_position"]))
    state, obs, r, d, info = env.step(state, [1, 1])
    print("episode_length_squared:", np.asarray(info["episode_length_squared"]))


if __name__ == "__main__":
    main()
