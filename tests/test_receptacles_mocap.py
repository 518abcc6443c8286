"""Receptacle samplers + humanoid mocap loading."""

import numpy as np
import pytest

from habitat_tpu.articulated_agents.humanoid import (
    HumanoidRearrangeController,
    HumanoidSeqPoseController,
    Motion,
    load_motion,
)
from habitat_tpu.sims.procedural import generate_apartment
from habitat_tpu.sims.receptacles import (
    AABBReceptacle,
    ReceptacleSet,
    ReceptacleTracker,
    TriangleMeshReceptacle,
    find_receptacles,
    sample_on_receptacle,
)


def test_aabb_receptacle_samples_on_top():
    r = AABBReceptacle("r", lo=(0, 0, 0), hi=(2, 1, 3))
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = r.sample_uniform_global(rng)
        assert 0 <= p[0] <= 2 and 0 <= p[2] <= 3
        assert p[1] == pytest.approx(1.0)
    assert r.total_area == pytest.approx(6.0)


def test_triangle_mesh_receptacle_area_weighted():
    # one tiny + one big triangle in y=0 plane: samples should concentrate
    # on the big one
    tris = np.array(
        [
            [[0, 0, 0], [0.1, 0, 0], [0, 0, 0.1]],
            [[5, 0, 5], [15, 0, 5], [5, 0, 15]],
        ],
        np.float32,
    )
    r = TriangleMeshReceptacle("tm", tris)
    rng = np.random.default_rng(1)
    pts = np.stack([r.sample_uniform_local(rng) for _ in range(200)])
    frac_big = (pts[:, 0] > 1).mean()
    assert frac_big > 0.95
    assert np.allclose(pts[:, 1], 0)
    # barycentric samples stay inside the triangles
    assert (pts[:, 0] + pts[:, 2] <= 20 + 1e-4).all()


def test_find_receptacles_procedural_scene():
    scene = generate_apartment(seed=7, n_clutter=12)
    receps = find_receptacles(scene)
    # vocabulary guarantees some receptacle categories among 12 objects
    assert len(receps) > 0
    rng = np.random.default_rng(0)
    p = sample_on_receptacle(scene, rng)
    assert p is not None and p.shape == (3,)
    # the sample sits above some annotated object's top face
    tops = [
        (np.asarray(o["center"]), np.asarray(o["size"]))
        for o in scene.objects
    ]
    ok = any(
        abs(p[1] - (c[1] + s[1] / 2) - 0.05) < 1e-4
        and abs(p[0] - c[0]) <= s[0] / 2
        and abs(p[2] - c[2]) <= s[2] / 2
        for c, s in tops
    )
    assert ok


def test_receptacle_set_and_tracker():
    rs = ReceptacleSet("tables", included_object_substrings=("table",))
    receps = [
        AABBReceptacle("receptacle_aabb_table_4", (0, 0, 0), (1, 1, 1)),
        AABBReceptacle("receptacle_aabb_shelf_5", (0, 0, 0), (1, 1, 1)),
    ]
    assert [r.name for r in rs.filter(receps)] == ["receptacle_aabb_table_4"]
    tracker = ReceptacleTracker({"receptacle_aabb_table_4": 1}, {"tables": rs})
    assert tracker.allocate("receptacle_aabb_table_4")
    assert not tracker.allocate("receptacle_aabb_table_4")  # consumed
    assert tracker.allocate("receptacle_aabb_shelf_5")  # untracked = infinite


def _make_clip(tmp_path, fmt):
    T, J = 12, 17
    joints = np.tile(np.array([0, 0, 0, 1], np.float32), (T, J, 1))
    tf = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    tf[:, 2, 3] = -np.linspace(0, 1.1, T)  # forward displacement
    if fmt == "npz":
        path = tmp_path / "walk.npz"
        np.savez(path, joints_quat_array=joints, transform_array=tf, fps=30.0)
    else:
        import pickle

        path = tmp_path / "walk.pkl"
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "walk_motion": {
                        "joints_quat_array": joints,
                        "transform_array": tf,
                        "fps": 30.0,
                    }
                },
                f,
            )
    return str(path)


@pytest.mark.parametrize("fmt", ["npz", "pkl"])
def test_load_motion_formats(tmp_path, fmt):
    m = load_motion(_make_clip(tmp_path, fmt))
    assert isinstance(m, Motion)
    assert m.num_poses == 12 and m.fps == 30.0
    assert m.displacement[-1] == pytest.approx(1.1, abs=1e-5)
    assert m.dist_per_step_size > 0


def test_controller_uses_mocap(tmp_path):
    path = _make_clip(tmp_path, "pkl")
    ctrl = HumanoidRearrangeController(walk_pose_path=path)
    assert ctrl.walk_motion is not None
    f0 = ctrl._motion_frame
    ctrl.calculate_walk_pose(np.array([0.0, 0.0, -1.0]))
    assert ctrl._motion_frame != f0
    pose = ctrl.get_pose()
    assert np.isfinite(pose).all()
    # seq controller from the same clip
    seq = HumanoidSeqPoseController.from_file(path)
    assert len(seq.poses) == 12
    seq.next_pose()
    assert seq._t == 1
