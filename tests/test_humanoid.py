

# -- round 2: reach grid + blending (reference _trilinear_interpolate) --------


def test_reach_grid_blend_tracks_target():
    import numpy as np
    from habitat_tpu.articulated_agents.humanoid import ReachPoseGrid

    g = ReachPoseGrid.synthetic(0)
    # a grid-corner target reproduces the corner pose exactly
    corner = g.poses[0, 0, 0]
    out = g.blend([g.xs[0], g.ys[0], g.zs[0]])
    np.testing.assert_allclose(np.abs(np.sum(out * corner, -1)), 1.0, atol=1e-5)
    # mid-cell target blends (not equal to any single corner), unit quats
    mid = g.blend([
        (g.xs[0] + g.xs[1]) / 2, (g.ys[0] + g.ys[1]) / 2, (g.zs[0] + g.zs[1]) / 2
    ])
    np.testing.assert_allclose(np.linalg.norm(mid, axis=-1), 1.0, atol=1e-5)
    assert not np.allclose(np.abs(np.sum(mid * corner, -1)), 1.0)


def test_reach_pose_moves_only_the_arm():
    import numpy as np
    from habitat_tpu.articulated_agents.humanoid import (
        HumanoidRearrangeController,
    )

    c = HumanoidRearrangeController()
    c.reset(np.eye(4))
    before = c.joint_pose.copy()
    c.calculate_reach_pose(np.array([0.3, 1.2, -0.5]), index_hand=0)
    changed = ~np.isclose(c.joint_pose, before).all(axis=-1)
    assert changed[11:14].any()  # left arm chain moved
    assert not changed[:11].any()  # legs/torso untouched
    # different targets produce different arm poses (grid actually blends)
    p1 = c.joint_pose.copy()
    c.calculate_reach_pose(np.array([-0.4, 0.5, -0.3]), index_hand=0)
    assert not np.allclose(p1[11:14], c.joint_pose[11:14])


def test_walk_and_reach_blend():
    import numpy as np
    from habitat_tpu.articulated_agents.humanoid import (
        HumanoidRearrangeController,
    )

    c = HumanoidRearrangeController()
    c.reset(np.eye(4))
    c.calculate_walk_and_reach_pose(
        np.array([0.0, 0.0, -1.0]), np.array([0.3, 1.0, -0.6])
    )
    # walking advanced the base AND the arm is posed
    assert np.linalg.norm(c.obj_transform_base[:3, 3]) > 0
    assert np.abs(c.joint_pose[11:14, 0]).sum() > 0
