"""sim_utilities / object states / kinematic relationships / debug viz
(reference §2.2 coverage)."""

import numpy as np
import jax.numpy as jnp

from habitat_tpu.sims import sim_utilities as su
from habitat_tpu.sims.procedural import generate_empty_room


def test_spatial_predicates():
    # box A on top of box B
    b_c, b_s = [0, 0.25, 0], [1.0, 0.5, 1.0]
    a_c, a_s = [0.1, 0.6, 0.1], [0.2, 0.2, 0.2]
    assert su.above(a_c, a_s, b_c, b_s)
    assert su.ontop(a_c, a_s, b_c, b_s)
    assert not su.ontop(b_c, b_s, a_c, a_s)
    assert su.within([0, 0.3, 0], b_c, b_s)
    assert not su.within([2, 0.3, 0], b_c, b_s)
    assert su.object_in_region([0.5, 0, 0.5], [0, -1, 0], [1, 1, 1])
    # batched
    pts = jnp.asarray([[0.0, 0.3, 0.0], [5.0, 0.0, 0.0]])
    inside = su.batched_within(pts, jnp.asarray([-0.5, 0.0, -0.5]), jnp.asarray([0.5, 0.5, 0.5]))
    assert bool(inside[0]) and not bool(inside[1])


def test_snap_down_and_on_floor():
    scene = generate_empty_room(extent=6.0)
    c = su.snap_down(scene, [3.0, 1.0, 3.0], [0.2, 0.3, 0.2])
    assert c is not None
    assert abs(c[1] - (scene.floor_y + 0.15)) < 1e-6
    assert su.on_floor(scene, c, [0.2, 0.3, 0.2])
    # outside the room -> None
    assert su.snap_down(scene, [-2.0, 1.0, 3.0], [0.2, 0.3, 0.2]) is None


def test_object_state_machine():
    from habitat_tpu.sims.object_state_machine import (
        BooleanObjectState,
        ObjectStateMachine,
        init_state_channels,
        set_state,
    )

    from habitat_tpu.sims.object_state_machine import (
        ObjectIsPoweredOn,
        get_state_of_obj,
        set_state_of_obj,
    )

    specs = [BooleanObjectState("is_clean", default_value=False)]
    osm = ObjectStateMachine(specs)
    osm.register_object("cup", semantic_class=0)
    assert osm.get_state("cup", "is_clean") is False
    osm.set_state("cup", "is_clean", True)
    # snapshot is grouped by state name (reference get_snapshot_dict:320)
    assert osm.get_snapshot_dict()["is_clean"]["cup"] is True
    # toggle + module-level get/set (reference :27-66, :207)
    assert specs[0].toggle(osm, "cup") is False
    set_state_of_obj(osm, "cup", "is_clean", True)
    assert get_state_of_obj(osm, "cup", "is_clean") is True
    assert get_state_of_obj(osm, "missing", "is_clean") is None

    # concrete specs + update loop (reference ObjectIsPoweredOn:238,
    # update_states:302)
    class Discharges(BooleanObjectState):
        def __init__(self):
            super().__init__(name="is_powered_on", default_value=True)

        def update_state(self, sim, handle, value, dt):
            return value and dt < 1.0

    osm2 = ObjectStateMachine([Discharges()])
    osm2.initialize_object_state_map([("tv", 0), ("lamp", 0)])
    osm2.update_states(dt=0.1)
    assert osm2.get_state("tv", "is_powered_on") is True
    osm2.update_states(dt=2.0)
    assert osm2.get_state("tv", "is_powered_on") is False
    assert ObjectIsPoweredOn().default_value is False

    ch = init_state_channels(specs, num_envs=3, num_objects=2)
    ch = set_state(ch, "is_clean", jnp.asarray([True, False, True]), jnp.asarray([0, 0, 1]), True)
    arr = np.asarray(ch["is_clean"])
    assert arr[0, 0] and not arr[1, 0] and arr[2, 1]


def test_kinematic_relationships():
    from habitat_tpu.sims.kinematic_relationship_manager import (
        KinematicRelationshipManager,
    )

    centers = np.array([[0, 0.25, 0], [0, 0.6, 0], [3, 0.25, 3]])
    sizes = np.array([[1, 0.5, 1], [0.2, 0.2, 0.2], [1, 0.5, 1]])
    krm = KinematicRelationshipManager(3)
    krm.initialize_from_obj_state(centers, sizes)
    assert krm.relationship_graph.get_parent(1) == 0
    assert krm.relationship_graph.get_children(0) == [1]
    # parent 0 moves by (1,0,0): child 1 follows
    pos = jnp.asarray(centers)[None]
    delta = jnp.zeros((1, 3, 3)).at[0, 0].set(jnp.asarray([1.0, 0.0, 0.0]))
    new = np.asarray(krm.apply_relations(pos, delta))[0]
    np.testing.assert_allclose(new[1], centers[1] + [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(new[2], centers[2], atol=1e-6)


def test_debug_visualizer(tmp_path):
    """dbv parity surface: subject peek with auto-framing, all-axis matrix,
    overlays, DebugObservation save, project_point (reference
    debug_visualizer.py peek:562/_peek_bb:647/project_point:23)."""
    from habitat_tpu.sims.debug_visualizer import (
        DebugVisualizer,
        draw_object_highlight,
        project_point,
        stitch_image_matrix,
    )
    from habitat_tpu.sims.scene import pack_scenes

    scene = generate_empty_room(extent=6.0)
    dbv = DebugVisualizer(pack_scenes([scene]), resolution=(48, 48))

    # subject framing from an AABB + overlay circles/lines
    obs = dbv.peek(
        ([2.0, 0.0, 2.0], [4.0, 1.0, 4.0]),
        debug_lines=[([[2, 0.5, 2], [4, 0.5, 4]], (0, 255, 0))],
        debug_circles=[([3, 0.5, 3], 0.5, [0, 1, 0], (255, 0, 0))],
    )
    frame = np.asarray(obs.obs_data)
    assert frame.shape == (48, 48, 3)
    assert frame.std() > 1.0
    p = obs.save(str(tmp_path), prefix="dbv_")
    assert p.endswith(".png")

    # all-axis = 3x2 stitched matrix
    allax = dbv.peek({"center": [3, 0.5, 3], "size": [1, 1, 1]}, peek_all_axis=True)
    assert np.asarray(allax.obs_data).shape == (2 * 48, 3 * 48, 3)

    # scene peek + camera-state API + video
    assert dbv.peek_scene().shape == (48, 48, 3)
    dbv.look_at([3, 0, 3], look_from=[3, 2, 6])
    dbv.translate([0, 0, -0.5], local=True)
    dbv.rotate(d_yaw=0.1)
    dbv.make_debug_video(str(tmp_path))

    # projection: a point straight ahead of the camera lands mid-image
    pt = project_point([0, 1, 0], 0.0, 0.0, [0, 1, -2])
    np.testing.assert_allclose(pt, [0.5, 0.5], atol=1e-6)
    hi = draw_object_highlight(frame, dbv.eye, dbv.yaw, dbv.pitch, [3, 0.5, 3])
    assert hi.shape == frame.shape
    grid = stitch_image_matrix([frame, frame, frame], num_col=2)
    assert grid.shape == (2 * 48, 2 * 48, 3)


# -- round-2 additions: link helpers, raycast snap, receptacle matching ------


def test_link_state_helpers():
    from habitat_tpu.sims import sim_utilities as su

    lo, hi = 0.0, 0.5
    assert su.link_is_closed(0.02, lo, hi)
    assert not su.link_is_open(0.02, lo, hi)
    assert su.link_is_open(0.3, lo, hi)
    assert su.open_link(lo, hi) == 0.5
    assert su.close_link(lo, hi) == 0.0
    assert abs(su.get_link_normalized_joint_position(0.25, lo, hi) - 0.5) < 1e-9
    assert abs(su.set_link_normalized_joint_position(0.5, lo, hi) - 0.25) < 1e-9


def test_snap_down_raycast():
    import numpy as np
    from habitat_tpu.sims import sim_utilities as su

    # one floor quad at y=0 (2 tris)
    v = np.array(
        [
            [[-5, 0, -5], [5, 0, -5], [5, 0, 5]],
            [[-5, 0, -5], [5, 0, 5], [-5, 0, 5]],
        ],
        np.float32,
    )
    # pad to chunk size 128
    pad = np.zeros((126, 3, 3), np.float32)
    tri = np.concatenate([v, pad])
    valid = np.zeros((128,), np.float32)
    valid[:2] = 1.0
    v0, e1, e2 = tri[:, 0], tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]
    out = su.snap_down_raycast(v0, e1, e2, valid, [0.0, 1.0, 0.0], [0.2, 0.2, 0.2])
    assert out is not None
    assert abs(out[1] - 0.1) < 1e-3  # rests with bottom on the floor
    # too high -> None
    out2 = su.snap_down_raycast(
        v0, e1, e2, valid, [0.0, 5.0, 0.0], [0.2, 0.2, 0.2], max_drop=2.0
    )
    assert out2 is None


def test_receptacle_matching():
    import numpy as np
    from habitat_tpu.sims import sim_utilities as su
    from habitat_tpu.sims.receptacles import AABBReceptacle

    table = AABBReceptacle("table", lo=[0, 0.7, 0], hi=[1, 0.75, 1])
    shelf = AABBReceptacle("shelf", lo=[3, 1.0, 3], hi=[4, 1.05, 4])
    obj_c = [0.5, 0.8, 0.5]  # resting on the table top
    m = su.get_obj_receptacle_matches(obj_c, [0.1, 0.1, 0.1], [table, shelf])
    assert m and m[0][0] == "table"
    assert su.find_receptacle_for_object(obj_c, [0.1, 0.1, 0.1], [table, shelf]) == "table"
    assert su.find_receptacle_for_object([9, 9, 9], [0.1] * 3, [table, shelf]) is None


def test_krm_snapshots_and_rotation():
    """Transform-snapshot application: a rotating+translating parent swings
    its child around it, chains compose root-first, grasp detach works
    (reference kinematic_relationship_manager.py:293-454)."""
    import numpy as np

    from habitat_tpu.sims.kinematic_relationship_manager import (
        KinematicRelationshipManager,
        apply_relations_rotating,
    )

    centers = np.array([[0.0, 0, 0], [1.0, 0, 0], [1.5, 0, 0]])
    krm = KinematicRelationshipManager(3)
    krm.relationship_graph.add_relation(0, 1, "ontop")
    krm.relationship_graph.add_relation(1, 2, "within")
    krm.update_snapshots(centers, [0.0, 0.0, 0.0])

    # parent 0 translates +z and rotates yaw by pi/2 (x offset -> -z... our
    # yaw convention: off_rot_x = cos*x + sin*z)
    new = np.array(centers, copy=True)
    new[0] = [0.0, 0.0, 2.0]
    yaws = [np.pi / 2, 0.0, 0.0]
    out = krm.apply_relationships_snapshot(new, yaws)
    # child 1 offset (1,0,0) rotated by +pi/2 about y: (cos*1+sin*0, 0,
    # -sin*1+cos*0) = (0,0,-1); then + parent at (0,0,2) = (0,0,1)
    np.testing.assert_allclose(out[1], [0.0, 0.0, 1.0], atol=1e-6)
    # grandchild keeps its 0.5 offset from child 1, rotated through the chain
    np.testing.assert_allclose(out[2], [0.0, 0.0, 0.5], atol=1e-6)

    # forest dump + relations snapshot + detach
    assert krm.get_relations_snapshot() == {0: {1: "ontop"}, 1: {2: "within"}}
    forest = krm.relationship_graph.get_human_readable_relationship_forest(
        {0: "table", 1: "tray", 2: "cup"}
    )
    assert forest[0] == "- table" and "[within]" in forest[2]
    krm.relationship_graph.remove_obj_relations(1)
    assert krm.relationship_graph.get_parent(1) is None
    assert krm.relationship_graph.get_children(1) == []

    # batched rotating form matches the host walk for a single-level chain
    import jax.numpy as jnp

    parent = jnp.asarray([[-1, 0, -1]])
    prev = jnp.asarray(centers)[None]
    newp = jnp.asarray(new)[None]
    dyaw = jnp.asarray([[np.pi / 2, 0.0, 0.0]])
    out_b = np.asarray(
        apply_relations_rotating(jnp.asarray(centers)[None], parent, prev, newp, dyaw)
    )[0]
    np.testing.assert_allclose(out_b[1], [0.0, 0.0, 1.0], atol=1e-6)
