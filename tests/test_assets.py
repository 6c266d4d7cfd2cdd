import glob
import os

import numpy as np
import pytest

from test_isaacgym_tpu.assets import (
    DOF_ROTATION,
    DOF_TRANSLATION,
    AssetSpec,
    create_box,
    create_capsule,
    create_sphere,
    load_mjcf,
    load_urdf,
)

ROOT = "/root/reference/assets"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(ROOT), reason="reference assets not mounted"
)


def test_cartpole_topology():
    a = load_urdf(ROOT, "urdf/cartpole.urdf")
    assert a.rigid_body_names() == ["slider", "cart", "pole"]
    assert a.dof_names() == ["slider_to_cart", "cart_to_pole"]
    assert a.dof_types() == [DOF_TRANSLATION, DOF_ROTATION]
    props = a.dof_properties()
    assert props[0]["hasLimits"] and props[0]["lower"] == -4.0 and props[0]["upper"] == 4.0
    assert not props[1]["hasLimits"]  # continuous joint
    assert props[1]["velocity"] == pytest.approx(8.0)
    # parents form a chain
    assert [l.parent for l in a.links] == [-1, 0, 1]


def test_franka_topology_matches_isaacgym_counts():
    a = load_urdf(ROOT, "urdf/franka_description/robots/franka_panda.urdf")
    assert a.num_bodies == 11
    assert a.num_dofs == 9
    d = a.dof_dict()
    assert d["panda_joint1"] == 0 and d["panda_finger_joint2"] == 8
    rb = a.rigid_body_dict()
    assert rb["panda_link0"] == 0
    assert "panda_hand" in rb
    # joint frames: joint1 is 0.333 up in z
    j1 = a.links[1].joint
    np.testing.assert_allclose(j1.parent_pos, [0, 0, 0.333], atol=1e-9)
    assert j1.damping == pytest.approx(10.0)
    assert j1.has_limits and j1.lower == pytest.approx(-2.8973)


def test_collapse_fixed_joints_preserves_mass():
    a = load_urdf(ROOT, "urdf/franka_description/robots/franka_panda.urdf")
    b = load_urdf(ROOT, "urdf/franka_description/robots/franka_panda.urdf", collapse_fixed=True)
    assert b.num_bodies < a.num_bodies
    assert b.num_dofs == a.num_dofs
    assert sum(l.mass for l in b.links) == pytest.approx(sum(l.mass for l in a.links), rel=1e-6)


def test_every_reference_urdf_parses():
    files = glob.glob(os.path.join(ROOT, "urdf/**/*.urdf"), recursive=True) + glob.glob(
        os.path.join(ROOT, "urdf/*.urdf")
    )
    assert len(files) >= 40
    for f in sorted(set(files)):
        rel = os.path.relpath(f, ROOT)
        a = load_urdf(ROOT, rel)
        assert a.num_bodies >= 1, rel
        assert all(l.mass > 0 for l in a.links), rel
        # topo order: parent before child
        for i, l in enumerate(a.links):
            assert l.parent < i


def test_mjcf_ant_humanoid():
    ant = load_mjcf(ROOT, "mjcf/nv_ant.xml")
    assert ant.num_dofs == 8
    assert not ant.fix_base_link  # freejoint root
    hum = load_mjcf(ROOT, "mjcf/nv_humanoid.xml")
    assert hum.num_dofs == 21
    props = hum.dof_properties()
    # defaults cascade: abdomen_z uses class big_stiff_joint (stiffness 20)
    i = hum.dof_dict()["abdomen_z"]
    assert props[i]["stiffness"] == pytest.approx(20.0)
    assert props[i]["hasLimits"]
    # degrees converted to radians
    assert props[i]["lower"] == pytest.approx(-45 * np.pi / 180)


def test_primitives():
    s = create_sphere(0.5, density=100.0)
    assert s.links[0].mass == pytest.approx(100 * 4 / 3 * np.pi * 0.125, rel=1e-5)
    b = create_box(1.0, 2.0, 3.0, density=1.0)
    assert b.links[0].mass == pytest.approx(6.0, rel=1e-5)
    c = create_capsule(0.5, 1.0)
    assert c.links[0].geoms[0].size == (0.5, 1.0)


def test_spherical_joint_dofs():
    a = load_urdf(ROOT, "urdf/dof_spherical_joint_test.urdf")
    assert a.num_dofs == 6  # 3 prismatic + spherical(3)
    types = a.dof_types()
    assert types[:3] == [DOF_TRANSLATION] * 3
    assert types[3:] == [DOF_ROTATION] * 3
