"""Greedy geodesic follower demo + top-down-map video
(reference examples/shortest_path_follower_example.py)."""

import os

import numpy as np

from habitat_tpu.sims.tpu_sim import TpuSim
from habitat_tpu.tasks.shortest_path_follower import ShortestPathFollower
from habitat_tpu.utils.visualizations.maps import TopDownMapTracker
from habitat_tpu.utils.visualizations.utils import (
    images_to_video,
    observations_to_image,
)

IMAGE_DIR = os.path.join("examples", "images")


def shortest_path_example(max_steps: int = 120, make_video: bool = True):
    sim = TpuSim(None)
    sim.seed(7)
    obs = sim.reset()
    goal = np.asarray(sim.sample_navigable_point())
    follower = ShortestPathFollower(sim, goal_radius=0.3, return_one_hot=False)
    tracker = TopDownMapTracker(sim._scene)
    tracker.reset(goal_positions=goal[None])

    frames = []
    for step in range(max_steps):
        action = follower.get_next_action(goal)
        if action == 0:
            print(f"reached goal in {step} steps")
            break
        obs = sim.step(action)
        tracker.update(sim.get_agent_state().position, sim._yaw)
        if make_video:
            frames.append(
                observations_to_image(obs, {"top_down_map": tracker.frame()})
            )
    if make_video and frames:
        images_to_video(frames, IMAGE_DIR, "shortest_path_example", fps=10)


if __name__ == "__main__":
    shortest_path_example()
