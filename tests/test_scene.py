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


def test_glb_roundtrip(tmp_path):
    """Export a procedural scene to GLB and load it back through the real-data
    path (sims/loaders.load_scene) — validates the glTF parser end to end."""
    from habitat_tpu.sims.loaders import load_scene, save_scene_glb

    scene = generate_apartment(seed=11, extent=8.0)
    path = str(tmp_path / "apartment.glb")
    save_scene_glb(scene, path)
    loaded = load_scene(path)
    assert loaded.num_triangles == scene.num_triangles
    # triangle soup is preserved up to reordering: compare sorted centroids
    c0 = np.sort(scene.vertices.mean(axis=1), axis=0)
    c1 = np.sort(loaded.vertices.mean(axis=1), axis=0)
    np.testing.assert_allclose(c0, c1, atol=1e-4)
    # navgrid rebuilt from the loaded mesh matches
    assert loaded.nav_occ.shape == scene.nav_occ.shape
    agree = (loaded.nav_occ == scene.nav_occ).mean()
    assert agree > 0.99, agree
    # renders
    from habitat_tpu.sims.scene import pack_scenes
    from habitat_tpu.ops.raycast import render_env
    import jax.numpy as jnp

    pack = pack_scenes([loaded])
    out = render_env(
        pack, jnp.int32(0), jnp.array([4.0, 1.25, 4.0]), jnp.float32(0.4),
        jnp.float32(0.0), height=32, width=32,
    )
    assert np.asarray(out["depth"]).std() > 0.001


def test_obj_and_npz_loaders(tmp_path):
    from habitat_tpu.sims.loaders import load_scene, save_scene_npz

    scene = generate_empty_room(extent=5.0)
    # npz
    p = str(tmp_path / "room.npz")
    save_scene_npz(scene, p)
    loaded = load_scene(p)
    assert loaded.num_triangles == scene.num_triangles
    # obj
    po = str(tmp_path / "tri.obj")
    with open(po, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 0 1\nv 1 0 1\nf 1 2 3\nf 2 4 3\n")
    obj = load_scene(po)
    assert obj.num_triangles == 2


def test_gltf_texture_bake(tmp_path):
    """A textured glTF primitive (TEXCOORD_0 + baseColorTexture, external
    .bin + PNG — the real-scan asset layout) bakes to per-triangle colors
    sampled at centroid UVs."""
    import json as _json

    from PIL import Image

    from habitat_tpu.sims.loaders import load_scene

    # texture: left half red, right half green
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :4, 0] = 255
    tex[:, 4:, 1] = 255
    Image.fromarray(tex).save(str(tmp_path / "atlas.png"))

    # two triangles: one with centroid UV in the left half, one in the right
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 0, 1], [2, 0, 0], [3, 0, 0], [2, 0, 1]],
        np.float32,
    )
    uv = np.array(
        [[0.0, 0.5], [0.2, 0.5], [0.1, 0.4], [0.8, 0.5], [0.9, 0.5], [0.85, 0.4]],
        np.float32,
    )
    blob = pos.tobytes() + uv.tobytes()
    with open(tmp_path / "mesh.bin", "wb") as f:
        f.write(blob)
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                        "material": 0,
                        "mode": 4,
                    }
                ]
            }
        ],
        "materials": [
            {"pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}}
        ],
        "textures": [{"source": 0}],
        "images": [{"uri": "atlas.png"}],
        "buffers": [{"uri": "mesh.bin", "byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": pos.nbytes, "byteLength": uv.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 6, "type": "VEC3",
             "min": [0, 0, 0], "max": [3, 0, 1]},
            {"bufferView": 1, "componentType": 5126, "count": 6, "type": "VEC2"},
        ],
    }
    with open(tmp_path / "mesh.gltf", "w") as f:
        _json.dump(gltf, f)

    scene = load_scene(str(tmp_path / "mesh.gltf"))
    assert scene.num_triangles == 2
    np.testing.assert_allclose(scene.colors[0], [1.0, 0.0, 0.0], atol=1e-2)
    np.testing.assert_allclose(scene.colors[1], [0.0, 1.0, 0.0], atol=1e-2)


def test_semantic_scene_hierarchy():
    """SemanticScene levels > regions > objects (habitat-sim
    semantic_annotations parity; reference habitat_simulator.py:249-257)."""
    import numpy as np

    from habitat_tpu.sims.procedural import generate_apartment
    from habitat_tpu.sims.semantic_scene import build_semantic_scene
    from habitat_tpu.sims.tpu_sim import TpuSim

    scene = generate_apartment(seed=3, n_rooms_per_axis=2, n_clutter=5)
    ss = build_semantic_scene(scene)
    assert len(ss.levels) == 1
    assert len(ss.regions) == 4  # 2x2 room grid
    assert len(ss.objects) == 5
    # every object is inside its region's bounds and carries a category
    for o in ss.objects:
        assert o.region is not None
        assert o.region.aabb.contains(o.aabb.center)
        assert o.category.name()
        assert o.id.startswith(o.region.id)
    # id lookup used by the semantic sensor
    o0 = ss.objects[0]
    assert ss.get_object(o0.semantic_id) is o0
    # region point query
    rs = ss.get_regions_for_point(ss.objects[0].aabb.center)
    assert o0.region in rs
    # level rollup + region categories
    assert len(ss.levels[0].objects) == 5
    assert ss.regions[0].category.name() in (
        "living room", "kitchen", "bedroom", "bathroom",
        "hallway", "office", "dining room", "closet",
    )

    # exposed through the Simulator API
    sim = TpuSim(None, scene=scene)
    assert sim.semantic_annotations() is sim.semantic_scene
    assert len(sim.semantic_scene.objects) == 5
