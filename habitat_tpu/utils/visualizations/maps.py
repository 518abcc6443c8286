"""Top-down map rasterization + drawing.

Counterpart of reference habitat/utils/visualizations/maps.py
(get_topdown_map_from_sim:326, to_grid:186/from_grid:217,
colorize_topdown_map:347, draw_path:378, draw_agent:55). The occupancy source
is our navgrid (already a top-down map) instead of sampled navmesh queries.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

MAP_INVALID_POINT = 0
MAP_VALID_POINT = 1
MAP_BORDER_INDICATOR = 2
MAP_SOURCE_POINT_INDICATOR = 4
MAP_TARGET_POINT_INDICATOR = 6
MAP_SHORTEST_PATH_COLOR = 7
MAP_VIEW_POINT_INDICATOR = 8
MAP_TARGET_BOUNDING_BOX = 9

TOP_DOWN_MAP_COLORS = np.full((256, 3), 150, dtype=np.uint8)
TOP_DOWN_MAP_COLORS[MAP_INVALID_POINT] = [255, 255, 255]
TOP_DOWN_MAP_COLORS[MAP_VALID_POINT] = [150, 150, 150]
TOP_DOWN_MAP_COLORS[MAP_BORDER_INDICATOR] = [50, 50, 50]
TOP_DOWN_MAP_COLORS[MAP_SOURCE_POINT_INDICATOR] = [0, 0, 200]
TOP_DOWN_MAP_COLORS[MAP_TARGET_POINT_INDICATOR] = [200, 0, 0]
TOP_DOWN_MAP_COLORS[MAP_SHORTEST_PATH_COLOR] = [0, 200, 0]
TOP_DOWN_MAP_COLORS[MAP_VIEW_POINT_INDICATOR] = [245, 150, 150]
TOP_DOWN_MAP_COLORS[MAP_TARGET_BOUNDING_BOX] = [0, 175, 0]


def to_grid(
    realworld_x: float,
    realworld_y: float,
    grid_resolution: Tuple[int, int],
    lower_bound,
    upper_bound,
) -> Tuple[int, int]:
    """World xz -> grid cell (reference maps.py:186)."""
    grid_size = (
        (upper_bound[0] - lower_bound[0]) / grid_resolution[0],
        (upper_bound[1] - lower_bound[1]) / grid_resolution[1],
    )
    grid_x = int((realworld_x - lower_bound[0]) / grid_size[0])
    grid_y = int((realworld_y - lower_bound[1]) / grid_size[1])
    return grid_x, grid_y


def from_grid(
    grid_x: int,
    grid_y: int,
    grid_resolution: Tuple[int, int],
    lower_bound,
    upper_bound,
) -> Tuple[float, float]:
    grid_size = (
        (upper_bound[0] - lower_bound[0]) / grid_resolution[0],
        (upper_bound[1] - lower_bound[1]) / grid_resolution[1],
    )
    realworld_x = lower_bound[0] + grid_x * grid_size[0]
    realworld_y = lower_bound[1] + grid_y * grid_size[1]
    return realworld_x, realworld_y


def get_topdown_map(scene, draw_border: bool = True) -> np.ndarray:
    """Occupancy top-down map from a SceneData navgrid
    (reference get_topdown_map_from_sim:326 samples the navmesh instead)."""
    occ = scene.nav_occ
    top_down_map = np.where(occ, MAP_VALID_POINT, MAP_INVALID_POINT).astype(np.uint8)
    if draw_border:
        from scipy import ndimage

        eroded = ndimage.binary_erosion(occ)
        border = occ & ~eroded
        top_down_map[border] = MAP_BORDER_INDICATOR
    return top_down_map


def get_topdown_map_from_sim(sim, draw_border: bool = True, **kw) -> np.ndarray:
    return get_topdown_map(sim._scene, draw_border=draw_border)


def colorize_topdown_map(
    top_down_map: np.ndarray,
    fog_of_war_mask: Optional[np.ndarray] = None,
    fog_of_war_desat_amount: float = 0.5,
) -> np.ndarray:
    """reference maps.py:347."""
    _map = TOP_DOWN_MAP_COLORS[top_down_map]
    if fog_of_war_mask is not None:
        fog_of_war_desat_values = np.array([[fog_of_war_desat_amount], [1.0]])
        desat_mask = top_down_map != MAP_INVALID_POINT
        _map[desat_mask] = (
            _map * fog_of_war_desat_values[fog_of_war_mask.astype(np.int64)]
        ).astype(np.uint8)[desat_mask]
    return _map


def draw_path(
    top_down_map: np.ndarray,
    path_points: Sequence[Tuple[int, int]],
    color: int = MAP_SHORTEST_PATH_COLOR,
    thickness: int = 2,
) -> None:
    """reference maps.py:378."""
    import cv2

    for prev_pt, next_pt in zip(path_points[:-1], path_points[1:]):
        cv2.line(
            top_down_map,
            prev_pt[::-1],
            next_pt[::-1],
            color,
            thickness=thickness,
        )


def draw_agent(
    image: np.ndarray,
    agent_center_coord: Tuple[int, int],
    agent_rotation: float,
    agent_radius_px: int = 5,
) -> np.ndarray:
    """Triangle marker oriented by heading (reference maps.py:55 uses a
    sprite; a marker avoids shipping binary assets)."""
    import cv2

    cy, cx = agent_center_coord
    r = max(agent_radius_px, 3)
    # heading 0 faces -z (up in map coords if rows are z)
    a = agent_rotation
    tip = (int(cx - r * np.sin(a) * 1.8), int(cy - r * np.cos(a) * 1.8))
    left = (
        int(cx - r * np.sin(a + 2.5)),
        int(cy - r * np.cos(a + 2.5)),
    )
    right = (
        int(cx - r * np.sin(a - 2.5)),
        int(cy - r * np.cos(a - 2.5)),
    )
    pts = np.array([tip, left, right], np.int32)
    cv2.fillPoly(image, [pts], (0, 0, 255) if image.ndim == 3 else 5)
    return image


class TopDownMapTracker:
    """Host-side per-episode top-down map with agent trace + fog of war —
    the eval/video counterpart of the reference TopDownMap measure
    (tasks/nav/nav.py:678-937). Device training never computes it (the
    reference also strips it from workers, habitat_env_factory.py:76-93)."""

    def __init__(self, scene, draw_shortest_path: bool = True, fog_of_war: bool = True):
        self.scene = scene
        self.base_map = get_topdown_map(scene)
        self.fog_enabled = fog_of_war
        self.reset()

    def reset(self, goal_positions: Optional[np.ndarray] = None):
        self.map = self.base_map.copy()
        self.fog_mask = np.zeros_like(self.map)
        self.trace: List[Tuple[int, int]] = []
        if goal_positions is not None:
            for g in np.atleast_2d(goal_positions):
                c = self.scene.world_to_cell(np.asarray(g)[[0, 2]])
                self._stamp(c, MAP_TARGET_POINT_INDICATOR)

    def _stamp(self, cell, value, size: int = 2):
        i, k = int(cell[0]), int(cell[1])
        self.map[
            max(i - size, 0) : i + size + 1, max(k - size, 0) : k + size + 1
        ] = value

    def update(self, agent_pos, agent_yaw: float):
        c = self.scene.world_to_cell(np.asarray(agent_pos)[[0, 2]])
        self.trace.append((int(c[0]), int(c[1])))
        if self.fog_enabled:
            from habitat_tpu.utils.visualizations.fog_of_war import (
                reveal_fog_of_war,
            )

            self.fog_mask = reveal_fog_of_war(
                self.base_map != MAP_INVALID_POINT,
                self.fog_mask,
                np.asarray(c),
                agent_yaw,
                fov=90.0,
                max_line_len=5.0 / self.scene.nav_res,
            )
        self._last_pose = (c, agent_yaw)

    def frame(self) -> np.ndarray:
        m = self.map.copy()
        if len(self.trace) > 1:
            draw_path(m, self.trace, MAP_SHORTEST_PATH_COLOR, 1)
        img = colorize_topdown_map(
            m, self.fog_mask if self.fog_enabled else None
        )
        if self.trace:
            c, yaw = self._last_pose
            draw_agent(img, (int(c[0]), int(c[1])), yaw)
        return img
