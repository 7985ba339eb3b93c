"""MJCF importer: the same 3-link leg authored as MJCF and URDF must
compile to the same RobotModel (masses, tree, axes, limits, contact
proxies) — reference N3 handles both formats (physics.rst.txt:66-73)."""

import numpy as np

from wiki_grx_gym_tpu.models.urdf import compile_robot

URDF = """
<robot name="leg">
  <link name="base">
    <inertial><mass value="5.0"/><origin xyz="0 0 0.1"/>
      <inertia ixx="0.1" iyy="0.1" izz="0.05" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 0"/><geometry><sphere radius="0.12"/></geometry></collision>
  </link>
  <link name="thigh">
    <inertial><mass value="2.0"/><origin xyz="0 0 -0.15"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.004" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="shank">
    <inertial><mass value="1.0"/><origin xyz="0 0 -0.12"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.002" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 -0.3"/><geometry><sphere radius="0.04"/></geometry></collision>
  </link>
  <link name="foot">
    <inertial><mass value="0.3"/><origin xyz="0.02 0 -0.02"/>
      <inertia ixx="0.001" iyy="0.001" izz="0.001" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0.05 0 -0.03"/><geometry><sphere radius="0.03"/></geometry></collision>
  </link>
  <joint name="hip_pitch" type="revolute">
    <parent link="base"/><child link="thigh"/>
    <origin xyz="0 0.1 -0.05"/><axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.2" effort="100" velocity="20"/>
  </joint>
  <joint name="knee_pitch" type="revolute">
    <parent link="thigh"/><child link="shank"/>
    <origin xyz="0 0 -0.3"/><axis xyz="0 1 0"/>
    <limit lower="-0.1" upper="2.0" effort="120" velocity="18"/>
  </joint>
  <joint name="ankle_weld" type="fixed">
    <parent link="shank"/><child link="foot"/>
    <origin xyz="0 0 -0.35"/>
  </joint>
</robot>
"""

# the same robot in MJCF: angles in degrees, quat (w,x,y,z), nested bodies,
# a <default> class providing the joint type, sizes as half-extents
MJCF = """
<mujoco model="leg">
  <compiler angle="degree"/>
  <default>
    <joint type="hinge" limited="true"/>
  </default>
  <worldbody>
    <body name="base" pos="0 0 0">
      <freejoint/>
      <inertial pos="0 0 0.1" mass="5.0" diaginertia="0.1 0.1 0.05"/>
      <geom type="sphere" size="0.12"/>
      <body name="thigh" pos="0 0.1 -0.05">
        <joint name="hip_pitch" axis="0 1 0" range="-85.94366926962348 68.75493541569878"
               actuatorfrcrange="-100 100"/>
        <inertial pos="0 0 -0.15" mass="2.0" diaginertia="0.02 0.02 0.004"/>
        <body name="shank" pos="0 0 -0.3">
          <joint name="knee_pitch" axis="0 1 0" range="-5.729577951308232 114.59155902616465"
                 actuatorfrcrange="-120 120"/>
          <inertial pos="0 0 -0.12" mass="1.0" diaginertia="0.01 0.01 0.002"/>
          <geom type="sphere" size="0.04" pos="0 0 -0.3"/>
          <body name="foot" pos="0 0 -0.35">
            <inertial pos="0.02 0 -0.02" mass="0.3" diaginertia="0.001 0.001 0.001"/>
            <geom type="sphere" size="0.03" pos="0.05 0 -0.03"/>
          </body>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_mjcf_matches_urdf():
    mu = compile_robot(URDF, armature=0.01)
    mm = compile_robot(MJCF, armature=0.01)

    assert mm.dof_names == mu.dof_names == ("hip_pitch", "knee_pitch")
    assert mm.parent == mu.parent
    np.testing.assert_allclose(np.asarray(mm.mass), np.asarray(mu.mass), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mm.com), np.asarray(mu.com), atol=1e-7)
    np.testing.assert_allclose(np.asarray(mm.inertia), np.asarray(mu.inertia), atol=1e-7)
    np.testing.assert_allclose(np.asarray(mm.tree_pos), np.asarray(mu.tree_pos), atol=1e-7)
    np.testing.assert_allclose(np.asarray(mm.tree_quat), np.asarray(mu.tree_quat), atol=1e-7)
    np.testing.assert_allclose(np.asarray(mm.axis), np.asarray(mu.axis), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(mm.dof_lower), np.asarray(mu.dof_lower), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mm.dof_upper), np.asarray(mu.dof_upper), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mm.dof_effort_limit), np.asarray(mu.dof_effort_limit), atol=1e-6
    )
    assert mm.num_points == mu.num_points
    np.testing.assert_allclose(
        np.asarray(mm.point_offset), np.asarray(mu.point_offset), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(mm.point_radius), np.asarray(mu.point_radius), atol=1e-7
    )
    assert mm.point_body == mu.point_body


def test_mjcf_joint_anchor_shift():
    """A hinge with a nonzero MJCF ``pos`` anchor must behave as if the
    child frame sat at the anchor (URDF rotates about the frame origin):
    the compiled tree offset absorbs the anchor and the child-local
    quantities shift back."""
    mj = """
<mujoco model="anchor">
  <compiler angle="radian"/>
  <worldbody>
    <body name="base">
      <inertial pos="0 0 0" mass="3.0" diaginertia="0.1 0.1 0.1"/>
      <body name="arm" pos="0.2 0 0">
        <joint name="j" type="hinge" axis="0 0 1" pos="0.05 0 0" range="-1 1" limited="true"/>
        <inertial pos="0.15 0 0" mass="1.0" diaginertia="0.01 0.01 0.01"/>
        <geom type="sphere" size="0.02" pos="0.3 0 0"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""
    m = compile_robot(mj)
    # child frame at the anchor: 0.2 + 0.05
    np.testing.assert_allclose(np.asarray(m.tree_pos)[1], [0.25, 0.0, 0.0], atol=1e-7)
    # the COM and the proxy sphere shifted back by the anchor
    np.testing.assert_allclose(np.asarray(m.com)[1], [0.10, 0.0, 0.0], atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(m.point_offset)[0], [0.25, 0.0, 0.0], atol=1e-7
    )


def test_mjcf_geom_euler_orientation():
    """A ``<geom euler="...">`` must rotate the collision proxy exactly like
    the equivalent ``quat`` (regression: euler was silently parsed as
    identity, misorienting box/cylinder proxies)."""
    base = """
<mujoco model="g"><compiler angle="degree"/><worldbody>
  <body name="base">
    <inertial pos="0 0 0" mass="2.0" diaginertia="0.1 0.1 0.1"/>
    <geom type="box" size="0.3 0.05 0.05" pos="0 0 0" {orient}/>
  </body>
</worldbody></mujoco>
"""
    # 90 deg about z: quat (w,x,y,z) = (cos45, 0, 0, sin45)
    m_euler = compile_robot(base.format(orient='euler="0 0 90"'))
    m_quat = compile_robot(
        base.format(orient='quat="0.7071067811865476 0 0 0.7071067811865476"')
    )
    m_ident = compile_robot(base.format(orient=""))
    np.testing.assert_allclose(
        np.asarray(m_euler.point_offset), np.asarray(m_quat.point_offset), atol=1e-7
    )
    # and the rotation actually moved the proxies (x-major box -> y-major)
    assert not np.allclose(
        np.asarray(m_euler.point_offset), np.asarray(m_ident.point_offset), atol=1e-3
    )


def test_mjcf_unsupported_joint_raises():
    import pytest

    mj = """
<mujoco><worldbody><body name="b0">
  <inertial pos="0 0 0" mass="1" diaginertia="1 1 1"/>
  <body name="b1"><joint type="slide" axis="0 0 1"/>
    <inertial pos="0 0 0" mass="1" diaginertia="1 1 1"/></body>
</body></worldbody></mujoco>
"""
    with pytest.raises(NotImplementedError):
        compile_robot(mj)
