"""URDF chain loading + FK/IK (reference loads URDFs through Bullet,
articulated_agents/manipulator.py:79-120; here urdf.py + kinematics.fk_chain).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from habitat_tpu.articulated_agents.kinematics import (
    ee_chain,
    fk_chain,
    ik_solve_chain,
)
from habitat_tpu.articulated_agents.manipulator import UrdfManipulator
from habitat_tpu.articulated_agents.urdf import parse_urdf

# A Franka-ish 7-DoF arm: rpy joint origins, alternating axes, a fixed
# flange joint that must fold into the EE tail, and an unused finger branch.
FRANKA_URDF = """
<robot name="mini_panda">
  <link name="base"/>
  <link name="l1"/> <link name="l2"/> <link name="l3"/> <link name="l4"/>
  <link name="l5"/> <link name="l6"/> <link name="l7"/>
  <link name="flange"/> <link name="finger"/>
  <joint name="j1" type="revolute">
    <parent link="base"/> <child link="l1"/>
    <origin xyz="0 0 0.333"/> <axis xyz="0 0 1"/>
    <limit lower="-2.8973" upper="2.8973" effort="87" velocity="2.175"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/> <child link="l2"/>
    <origin rpy="-1.57079632679 0 0"/> <axis xyz="0 0 1"/>
    <limit lower="-1.7628" upper="1.7628" effort="87" velocity="2.175"/>
  </joint>
  <joint name="j3" type="revolute">
    <parent link="l2"/> <child link="l3"/>
    <origin rpy="1.57079632679 0 0" xyz="0 -0.316 0"/> <axis xyz="0 0 1"/>
    <limit lower="-2.8973" upper="2.8973" effort="87" velocity="2.175"/>
  </joint>
  <joint name="j4" type="revolute">
    <parent link="l3"/> <child link="l4"/>
    <origin rpy="1.57079632679 0 0" xyz="0.0825 0 0"/> <axis xyz="0 0 1"/>
    <limit lower="-3.0718" upper="-0.0698" effort="87" velocity="2.175"/>
  </joint>
  <joint name="j5" type="revolute">
    <parent link="l4"/> <child link="l5"/>
    <origin rpy="-1.57079632679 0 0" xyz="-0.0825 0.384 0"/> <axis xyz="0 0 1"/>
    <limit lower="-2.8973" upper="2.8973" effort="12" velocity="2.61"/>
  </joint>
  <joint name="j6" type="revolute">
    <parent link="l5"/> <child link="l6"/>
    <origin rpy="1.57079632679 0 0"/> <axis xyz="0 0 1"/>
    <limit lower="-0.0175" upper="3.7525" effort="12" velocity="2.61"/>
  </joint>
  <joint name="j7" type="revolute">
    <parent link="l6"/> <child link="l7"/>
    <origin rpy="1.57079632679 0 0" xyz="0.088 0 0"/> <axis xyz="0 0 1"/>
    <limit lower="-2.8973" upper="2.8973" effort="12" velocity="2.61"/>
  </joint>
  <joint name="jflange" type="fixed">
    <parent link="l7"/> <child link="flange"/>
    <origin xyz="0 0 0.107"/>
  </joint>
  <joint name="jfinger" type="prismatic">
    <parent link="flange"/> <child link="finger"/>
    <origin xyz="0 0 0.06"/> <axis xyz="0 1 0"/>
    <limit lower="0.0" upper="0.04" effort="20" velocity="0.2"/>
  </joint>
</robot>
"""


def test_parse_topology():
    model = parse_urdf(FRANKA_URDF)
    assert model.root_link == "base"
    assert model.movable_joint_names() == [
        "j1", "j2", "j3", "j4", "j5", "j6", "j7", "jfinger",
    ]
    chain = model.extract_chain(ee_link="flange")
    assert chain.num_joints == 7
    assert chain.joint_names[-1] == "j7"
    # the fixed flange joint folds into the EE tail
    np.testing.assert_allclose(chain.ee_offset, [0, 0, 0.107], atol=1e-7)


def test_fk_zero_pose_height():
    """At q=0 every axis is z and all rotations are about z after rpy frames;
    the arm stands at a known analytic reach."""
    chain = parse_urdf(FRANKA_URDF).extract_chain(ee_link="flange")
    pts = np.asarray(fk_chain(chain, jnp.zeros(7)))
    assert pts.shape == (8, 3)
    # frame origins accumulate the origin_xyz translations rotated through
    # the rpy frames; verify against a hand-rolled numpy walk
    R = np.eye(3)
    p = np.zeros(3)
    expect = []
    for j in range(7):
        p = p + R @ chain.origin_xyz[j]
        R = R @ chain.origin_rot[j]
        expect.append(p.copy())
    expect.append(p + R @ chain.ee_offset)
    np.testing.assert_allclose(pts[1:], np.asarray(expect)[1:], atol=1e-5)


def test_fk_single_joint_analytic():
    """One revolute joint about z: rotating pi/2 moves an x-offset EE to y."""
    urdf = """
    <robot name="one">
      <link name="base"/><link name="tip"/>
      <joint name="j" type="revolute">
        <parent link="base"/><child link="tip"/>
        <axis xyz="0 0 1"/>
        <limit lower="-3.14" upper="3.14"/>
      </joint>
      <joint name="tipoff" type="fixed">
        <parent link="tip"/><child link="tip2"/>
        <origin xyz="1 0 0"/>
      </joint>
      <link name="tip2"/>
    </robot>
    """
    chain = parse_urdf(urdf).extract_chain(ee_link="tip2")
    ee0 = np.asarray(ee_chain(chain, jnp.zeros(1)))
    ee90 = np.asarray(ee_chain(chain, jnp.asarray([np.pi / 2])))
    np.testing.assert_allclose(ee0, [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(ee90, [0, 1, 0], atol=1e-6)


def test_prismatic_joint():
    chain = parse_urdf(FRANKA_URDF).extract_chain(ee_link="finger")
    assert chain.num_joints == 8 and bool(chain.is_prismatic[-1])
    closed = np.asarray(ee_chain(chain, jnp.zeros(8)))
    q = jnp.zeros(8).at[-1].set(0.04)
    open_ = np.asarray(ee_chain(chain, q))
    assert np.linalg.norm(open_ - closed) == pytest.approx(0.04, abs=1e-6)


def test_ik_reaches_target():
    chain = parse_urdf(FRANKA_URDF).extract_chain(ee_link="flange")
    q0 = jnp.asarray(np.clip(np.zeros(7), chain.lower, chain.upper) + 0.3)
    target = np.asarray(ee_chain(chain, q0 + 0.25))
    q = ik_solve_chain(chain, jnp.asarray(target), q0, iters=40)
    err = np.linalg.norm(np.asarray(ee_chain(chain, q)) - target)
    assert err < 0.02
    assert np.all(np.asarray(q) >= chain.lower - 1e-6)
    assert np.all(np.asarray(q) <= chain.upper + 1e-6)


def test_urdf_manipulator(tmp_path):
    p = tmp_path / "panda.urdf"
    p.write_text(FRANKA_URDF)
    robot = UrdfManipulator(str(p), ee_link="flange")
    assert robot.params.arm_joints == 7
    ee = robot.ee_local_pos
    assert ee.shape == (3,)
    q = robot.calculate_ee_inverse_kinematics(ee + np.array([0.05, 0.0, -0.05]))
    assert q.shape == (7,)
