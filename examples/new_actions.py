"""Registering a new task action (reference examples/new_actions.py): a
strafe-right action built from the FunctionalAction protocol. Actions that
reduce to (move, turn, tilt, stop) compile into the env's fused per-action
tables; richer behaviors subclass the env step."""

import numpy as np

import habitat_tpu as habitat
from habitat_tpu.core.embodied_task import FunctionalAction
from habitat_tpu.core.registry import registry


@registry.register_task_action(name="TurnLeft45Action")
class TurnLeft45(FunctionalAction):
    """A coarser turn (45 degrees) — shows parameterized action registration."""

    name = "turn_left_45"

    def turn_amount(self):
        return float(np.deg2rad(45.0))


def main():
    from habitat_tpu.core.env_factory import make_nav_env
    from habitat_tpu.datasets.pointnav import make_procedural_pointnav

    scenes, episodes, fields = make_procedural_pointnav(
        num_scenes=1, episodes_per_scene=2
    )
    env = make_nav_env(
        scenes,
        episodes,
        num_envs=1,
        action_names=("StopAction", "MoveForwardAction", "TurnLeft45Action"),
        precomputed_fields=fields,
    )
    state, obs = env.reset()
    yaw0 = float(np.asarray(state.yaw)[0])
    state, obs, r, d, info = env.step(state, [2])
    yaw1 = float(np.asarray(state.yaw)[0])
    print(f"turned {np.rad2deg(yaw1 - yaw0):.1f} degrees")
    assert abs(np.rad2deg(yaw1 - yaw0) - 45.0) < 1e-3


if __name__ == "__main__":
    main()
