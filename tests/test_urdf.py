"""URDF compiler tests against known facts of the GR1T1 lower-limb robot
(counted directly from `resources/robots/GR1T1/urdf/GR1T1_lower_limb.urdf`:
10 revolute + 26 fixed joints, see SURVEY.md §2.5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.models.urdf import compile_robot, parse_urdf

PENDULUM = """
<robot name="pendulum">
  <link name="base">
    <inertial><origin xyz="0 0 0"/><mass value="100.0"/>
      <inertia ixx="1" ixy="0" ixz="0" iyy="1" iyz="0" izz="1"/></inertial>
  </link>
  <link name="bob">
    <inertial><origin xyz="0 0 -1.0"/><mass value="2.0"/>
      <inertia ixx="1e-6" ixy="0" ixz="0" iyy="1e-6" iyz="0" izz="1e-6"/></inertial>
    <collision><origin xyz="0 0 -1.0"/><geometry><sphere radius="0.05"/></geometry></collision>
  </link>
  <joint name="hinge" type="revolute">
    <parent link="base"/><child link="bob"/>
    <origin xyz="0 0 0" rpy="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-3" upper="3" effort="100" velocity="50"/>
  </joint>
</robot>
"""


def test_pendulum_compiles():
    m = compile_robot(PENDULUM)
    assert m.num_bodies == 2
    assert m.num_dof == 1
    assert m.dof_names == ("hinge",)
    np.testing.assert_allclose(m.mass, [100.0, 2.0])
    np.testing.assert_allclose(m.com[1], [0.0, 0.0, -1.0], atol=1e-6)
    assert m.num_points == 1
    np.testing.assert_allclose(m.point_offset[0], [0.0, 0.0, -1.0], atol=1e-6)


def test_gr1t1_lower_structure(gr1t1_lower):
    m = gr1t1_lower
    assert m.num_dof == 10
    assert m.num_bodies == 11
    # DOF order: left-leg chain then right-leg chain
    assert m.dof_names == (
        "left_hip_roll_joint",
        "left_hip_yaw_joint",
        "left_hip_pitch_joint",
        "left_knee_pitch_joint",
        "left_ankle_pitch_joint",
        "right_hip_roll_joint",
        "right_hip_yaw_joint",
        "right_hip_pitch_joint",
        "right_knee_pitch_joint",
        "right_ankle_pitch_joint",
    )
    # limits match the URDF (left_hip_roll: [-0.09, 0.79], effort 48)
    np.testing.assert_allclose(m.dof_lower[0], -0.09, atol=1e-6)
    np.testing.assert_allclose(m.dof_upper[0], 0.79, atol=1e-6)
    np.testing.assert_allclose(m.dof_effort_limit[0], 48.0, atol=1e-6)
    np.testing.assert_allclose(m.dof_effort_limit[3], 130.0, atol=1e-6)  # knee
    # total mass preserved by welding
    np.testing.assert_allclose(float(jnp.sum(m.mass)), 52.8268, atol=1e-2)


def test_gr1t1_lower_feet(gr1t1_lower):
    m = gr1t1_lower
    feet = m.find_links("foot_roll")
    assert feet == ("left_foot_roll_link", "right_foot_roll_link")
    # each foot has 2 collision cylinders -> 4 proxy spheres
    mask = m.link_point_mask(["left_foot_roll_link"])
    assert float(mask.sum()) == 4.0
    # foot proxies sit at z=-0.035, radius 0.02 (sole at -0.055)
    idx = [i for i in range(m.num_points) if mask[i] > 0]
    for i in idx:
        assert abs(float(m.point_offset[i][2]) - (-0.035)) < 1e-6
        assert abs(float(m.point_radius[i]) - 0.02) < 1e-6


def test_gr1t1_lower_welded_torso(gr1t1_lower):
    m = gr1t1_lower
    body, pos, quat = m.link_frame("torso_link")
    assert body == 0  # welded into the base
    # torso z offset = 0 + 0.0873 + 0.081 + 0.16071 from the waist chain
    np.testing.assert_allclose(pos[2], 0.0873 + 0.081 + 0.16071, atol=1e-5)
    # termination bodies resolve (legged_gym gr1t1_config.py:79-86)
    for name in ("IMU_link", "torso_link", "head_pitch_link"):
        b, _, _ = m.link_frame(name)
        assert b == 0


def test_parent_topology(gr1t1_lower):
    m = gr1t1_lower
    assert m.parent[0] == -1
    for i in range(1, m.num_bodies):
        assert 0 <= m.parent[i] < i  # topological order


def test_full_body_gr1t1():
    from pathlib import Path

    from wiki_grx_gym_tpu.models.serialize import load_robot

    path = Path(__file__).resolve().parents[1] / "wiki_grx_gym_tpu/models/resources/gr1t1.json"
    m = load_robot(str(path))
    assert m.num_dof == 32
    assert m.num_bodies == 33
    np.testing.assert_allclose(float(jnp.sum(m.mass)), 52.8268, atol=1e-2)
