"""ShortestPathFollower — greedy geodesic action oracle.

Counterpart of reference tasks/nav/shortest_path_follower.py:24-95 (which
wraps the C++ GreedyGeodesicFollower): here it descends the on-device
geodesic distance field (ops/navgrid.greedy_follower_step).
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np

import jax.numpy as jnp

from habitat_tpu.ops.navgrid import greedy_follower_step
from habitat_tpu.sims.scene import geodesic_field


class ShortestPathFollower:
    def __init__(
        self,
        sim,  # TpuSim
        goal_radius: float,
        return_one_hot: bool = True,
        stop_on_error: bool = True,
    ):
        self._sim = sim
        self._goal_radius = goal_radius
        self._return_one_hot = return_one_hot
        self._field = None
        self._goal = None

    def _maybe_field(self, goal_pos):
        g = tuple(np.round(np.asarray(goal_pos), 3))
        if self._goal != g:
            scene = self._sim._scene
            cell = scene.world_to_cell(np.asarray(goal_pos)[[0, 2]])
            self._field = geodesic_field(scene.nav_occ, cell[None], scene.nav_res)
            self._goal = g

    def get_next_action(self, goal_pos) -> Union[int, np.ndarray, None]:
        """0=stop 1=fwd 2=left 3=right (HabitatSimActions order)."""
        self._maybe_field(goal_pos)
        scene = self._sim._scene
        act = greedy_follower_step(
            self._sim.pack,
            jnp.int32(0),
            jnp.asarray(self._field),
            jnp.asarray(self._sim._pos),
            jnp.asarray(self._sim._yaw),
            goal_radius=self._goal_radius,
            forward_step=self._sim._fwd_step,
            turn_angle=float(self._sim._turn),
        )
        act = int(act)
        if self._return_one_hot:
            out = np.zeros(4, np.float32)
            out[act] = 1.0
            return out
        return act

    @property
    def mode(self) -> str:
        return "geodesic_path"

    @mode.setter
    def mode(self, new_mode: str):
        assert new_mode in ("geodesic_path", "greedy")
