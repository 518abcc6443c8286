"""Canonical minimal example (reference examples/example.py — the 10-line
habitat API demo, same surface on the TPU engine)."""

import habitat_tpu as habitat


def example():
    env = habitat.Env(
        config=habitat.get_config(
            "benchmark/nav/pointnav/pointnav_procgen.yaml",
            [
                "habitat.dataset.procedural.num_scenes=1",
                "habitat.dataset.procedural.episodes_per_scene=2",
                "habitat.simulator.agents.main_agent.sim_sensors.depth_sensor.width=64",
                "habitat.simulator.agents.main_agent.sim_sensors.depth_sensor.height=64",
                "habitat.environment.max_episode_steps=20",
            ],
        )
    )
    print("Environment creation successful")
    observations = env.reset()  # noqa: F841

    print("Agent stepping around inside environment.")
    count_steps = 0
    while not env.episode_over:
        observations = env.step(env.action_space.sample())  # noqa: F841
        count_steps += 1
    print(f"Episode finished after {count_steps} steps.")


if __name__ == "__main__":
    example()
