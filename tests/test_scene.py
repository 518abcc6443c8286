"""Scene building, navgrid, geodesic fields (SURVEY §2.9 PathFinder parity)."""

import numpy as np
import pytest

from habitat_tpu.sims.procedural import generate_apartment, generate_empty_room
from habitat_tpu.sims.scene import INF_DIST, geodesic_field, pack_scenes


def test_empty_room_navgrid():
    scene = generate_empty_room(extent=6.0)
    assert scene.num_triangles > 0
    occ = scene.nav_occ
    # center should be navigable, outside shouldn't
    assert scene.is_navigable(np.array([3.0, 0.0, 3.0]))
    assert not scene.is_navigable(np.array([-1.0, 0.0, 3.0]))
    assert not scene.is_navigable(np.array([6.5, 0.0, 3.0]))
    # most of the interior is navigable
    frac = occ.mean()
    assert frac > 0.5, frac


def test_apartment_connected():
    scene = generate_apartment(seed=0, extent=10.0)
    occ = scene.nav_occ
    assert occ.sum() > 100
    # geodesic field from one navigable point should reach most navigable cells
    ii, kk = np.nonzero(occ)
    src = np.array([[ii[0], kk[0]]])
    field = geodesic_field(occ, src, scene.nav_res)
    reachable = (field < INF_DIST) & occ
    assert reachable.sum() / occ.sum() > 0.9  # door gaps connect rooms


def test_geodesic_field_straight_line():
    scene = generate_empty_room(extent=6.0)
    occ = scene.nav_occ
    a = scene.world_to_cell(np.array([1.0, 1.0]))
    b = scene.world_to_cell(np.array([5.0, 1.0]))
    field = geodesic_field(occ, np.array([b]), scene.nav_res)
    d = field[a[0], a[1]]
    assert abs(d - 4.0) < 0.1, d  # straight-line geodesic = euclidean


def test_geodesic_field_around_wall():
    # wall between start and goal => geodesic > euclidean
    scene = generate_apartment(seed=3, extent=8.0, n_clutter=0)
    occ = scene.nav_occ
    ii, kk = np.nonzero(occ)
    # pick two navigable cells far apart
    a = np.array([ii.min(), kk[ii.argmin()]])
    b = np.array([ii.max(), kk[ii.argmax()]])
    field = geodesic_field(occ, np.array([b]), scene.nav_res)
    geo = field[a[0], a[1]]
    euc = np.linalg.norm((a - b).astype(float)) * scene.nav_res
    assert geo < INF_DIST
    assert geo >= euc - 1e-3


def test_pack_scenes():
    scenes = [generate_apartment(seed=s, extent=8.0) for s in range(3)]
    pack = pack_scenes(scenes)
    assert pack.num_scenes == 3
    assert pack.max_triangles % 128 == 0
    assert pack.tri_valid.shape == (3, pack.max_triangles)
    assert bool(pack.tri_valid[0].sum() == scenes[0].num_triangles)
