import numpy as np
import pytest

from pyrite_tpu.project import load_project
from pyrite_tpu.project import ir

REF = "/root/reference/pyrite/test"

ALL_SCENES = [
    "spheres/spheres",
    "cornell/cornell",
    "diamonds/diamonds",
    "dragon/dragon",
    "snowflake/snowflake",
    "colors/colors",
    "textures/textures",
    "rgb_reflection/rgb_reflection",
    "rgb_emission/rgb_emission",
]


@pytest.mark.parametrize("scene", ALL_SCENES)
def test_all_reference_scenes_parse(scene):
    pd = load_project(f"{REF}/{scene}.lua")
    p = pd.project
    assert p.image.width > 0 and p.image.height > 0
    assert p.renderer.pixel_samples > 0
    assert len(p.world.objects) > 0


def test_spheres_scene_details():
    p = load_project(f"{REF}/spheres/spheres.lua").project
    assert (p.image.width, p.image.height) == (512, 256)
    assert p.renderer.algorithm == "simple"
    assert p.renderer.spectrum_samples == 10
    assert p.renderer.light_samples == 4
    assert p.renderer.bounces == 8  # default
    # four spheres; second is emissive d65*3
    spheres = [o for o in p.world.objects if isinstance(o, ir.Sphere)]
    assert len(spheres) == 4
    emissive = spheres[1]
    assert emissive.material.surface.kind == "emissive"
    color = emissive.material.surface.fields["color"]
    assert color.kind == "binary" and color.fields["operator"] == "mul"
    assert color.fields["lhs"].fields["spectrum"].builtin == "d65"
    assert color.fields["rhs"] == 3.0
    # :with on a vector expression keeps other fields: position y modified clone
    pos = ir.eval_vector3(emissive.position)
    np.testing.assert_allclose(pos, [0.0, 1.5, 10.0])
    # third sphere has a fresnel mix of mirror and a curve-spectrum diffuse
    mixed = spheres[2].material.surface
    assert mixed.kind == "mix"
    assert mixed.fields["amount"].kind == "fresnel"
    assert mixed.fields["lhs"].kind == "mirror"
    assert mixed.fields["rhs"].kind == "diffuse"
    curve = mixed.fields["rhs"].fields["color"].fields["spectrum"]
    assert curve.format == "curve" and len(curve.points) == 5


def test_cornell_scene_details():
    p = load_project(f"{REF}/cornell/cornell.lua").project
    assert p.renderer.algorithm == "bidirectional"
    assert p.renderer.bounces == 4 and p.renderer.light_bounces == 4
    # white balance program present
    assert p.image.white is not None and p.image.white.kind == "blackbody"
    mesh = [o for o in p.world.objects if isinstance(o, ir.Mesh)][0]
    assert set(mesh.materials) == {
        "light", "left", "right", "tall", "short", "back", "ceiling", "floor",
    }
    # the light material is emissive + diffuse (material Add node)
    light = mesh.materials["light"].surface
    assert light.kind == "binary" and light.fields["operator"] == "add"
    assert light.fields["lhs"].kind == "emissive"
    assert light.fields["rhs"].kind == "diffuse"
    # shared require()d color spectra dedupe to the same IR node
    left = mesh.materials["left"].surface.fields["color"]
    right = mesh.materials["right"].surface.fields["color"]
    assert left is not right
    fractal = [o for o in p.world.objects if isinstance(o, ir.RayMarched)][0]
    assert isinstance(fractal.shape, ir.QuaternionJulia)
    assert fractal.shape.variant == "cubic"
    assert isinstance(fractal.bounds, ir.BoundingBox)


def test_textures_scene_details():
    p = load_project(f"{REF}/textures/textures.lua").project
    plane = [o for o in p.world.objects if isinstance(o, ir.Plane)][0]
    assert plane.texture_scale == 5.0
    # normal map: linear texture * vector(1, -1, 1)
    nm = plane.material.normal_map
    assert nm.kind == "binary" and nm.fields["operator"] == "mul"
    assert nm.fields["lhs"].kind == "color_texture"
    assert nm.fields["lhs"].fields["linear"] is True
    assert nm.fields["rhs"].kind == "vector"
    scaled = [
        o
        for o in p.world.objects
        if isinstance(o, ir.Sphere) and o.texture_scale is not None
    ][0]
    np.testing.assert_allclose(ir.eval_vector2(scaled.texture_scale), [0.5, 1.0])


def test_diamonds_scene_details():
    p = load_project(f"{REF}/diamonds/diamonds.lua").project
    assert p.renderer.bounces == 256
    assert p.renderer.spectrum_samples == 1
    assert p.camera.aperture == 0.02
    assert p.camera.focus_distance == 11.08
    mesh = p.world.objects[0]
    diamond = mesh.materials["diamonds"].surface
    assert diamond.kind == "refractive"
    assert diamond.fields["ior"] == pytest.approx(2.37782)
    assert diamond.fields["dispersion"] == pytest.approx(0.01371)


def test_shared_prototype_clone_does_not_alias():
    # rgb_reflection clones color_ball repeatedly with different colors;
    # each clone must get its own material node.
    p = load_project(f"{REF}/rgb_reflection/rgb_reflection.lua").project
    spheres = [o for o in p.world.objects if isinstance(o, ir.Sphere)]
    colored = [
        s for s in spheres if s.material.surface.kind == "diffuse"
    ]
    rgb_values = []
    for s in colored:
        c = s.material.surface.fields["color"]
        assert c.kind == "rgb"
        rgb_values.append((c.fields["red"], c.fields["green"], c.fields["blue"]))
    assert len(set(rgb_values)) == 6  # six distinct colors


def test_obj_loader_cornell_box():
    pd = load_project(f"{REF}/cornell/cornell.lua")
    mesh_ir = [o for o in pd.project.world.objects if isinstance(o, ir.Mesh)][0]
    obj = pd.meshes.load(mesh_ir.file)
    names = [o.name for o in obj.objects]
    assert set(names) == {
        "tall", "short", "left", "right", "back", "ceiling", "light", "floor",
    }
    total_tris = sum(len(o.faces_v) for o in obj.objects)
    assert total_tris == 36
    assert obj.positions.shape[1] == 3
    # normals present via v//vn
    assert np.all(obj.objects[0].faces_vn >= 0)


def test_obj_parser_edge_cases(tmp_path):
    from pyrite_tpu.project.meshes import load_obj

    obj = tmp_path / "edge.obj"
    obj.write_text(
        """
o quadskip
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
f 1/1 2/2 3/3 4/1
f 1/1 2/2 3/3
f -3/-3 -2/-2 -1/-1
"""
    )
    mesh = load_obj(str(obj))
    assert len(mesh.objects) == 1
    o = mesh.objects[0]
    # the quad is skipped (reference keeps triangles only)
    assert len(o.faces_v) == 2
    np.testing.assert_array_equal(o.faces_v[0], [0, 1, 2])
    # negative indices count back from the current vertex pool (4 verts)
    np.testing.assert_array_equal(o.faces_v[1], [1, 2, 3])
    np.testing.assert_array_equal(o.faces_vt[0], [0, 1, 2])
    np.testing.assert_array_equal(o.faces_vt[1], [0, 1, 2])
    # no normals -> -1
    assert (o.faces_vn == -1).all()

    # native parser agrees
    from pyrite_tpu import native

    if native.available():
        nat = native.load_obj(str(obj))
        np.testing.assert_array_equal(nat.objects[0].faces_v, o.faces_v)
        np.testing.assert_array_equal(nat.objects[0].faces_vt, o.faces_vt)
