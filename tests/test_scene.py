"""Scene hierarchy, visibility, glTF export/import round-trip (analogue of
reference ecs_test.cpp + meshopt_sandbox.cpp round-trip style)."""

import numpy as np

from granite_tpu.math import Frustum, perspective, look_at_matrix
from granite_tpu.scene import Scene, GLTFParser
from granite_tpu.scene.scene import (
    RENDERABLE_OPAQUE, RENDERABLE_CASTS_SHADOW, RENDERABLE_DYNAMIC,
)
from granite_tpu.scene.mesh_util import cube_mesh, sphere_mesh, plane_mesh
from granite_tpu.scene.scene_formats import (
    MaterialData, NodeData, SceneInfo, LightData, CameraData,
    LIGHT_DIRECTIONAL,
)
from granite_tpu.scene_export import export_gltf


def test_transform_tree_levels():
    s = Scene()
    root = s.create_node(translation=[1, 0, 0])
    child = s.create_node(parent=root, translation=[0, 2, 0])
    grand = s.create_node(parent=child, scale=[2, 2, 2])
    s.update_transform_tree()
    assert np.allclose(s.world[root][:3, 3], [1, 0, 0])
    assert np.allclose(s.world[child][:3, 3], [1, 2, 0])
    assert np.allclose(s.world[grand][:3, 3], [1, 2, 0])
    assert np.allclose(s.world[grand][0, 0], 2.0)
    # Reparent: child under a rotated root must move.
    import granite_tpu.math.muglm as mg
    s.rotation[root] = mg.quat_from_axis_angle([0, 0, 1], np.pi / 2)
    s.update_transform_tree()
    assert np.allclose(s.world[child][:3, 3], [1 - 2, 0, 0], atol=1e-6)


def test_scene_visibility_queries():
    s = Scene()
    n_front = s.create_node(translation=[0, 0, -5])
    n_behind = s.create_node(translation=[0, 0, 5])
    s.add_renderable(n_front, 0, RENDERABLE_OPAQUE | RENDERABLE_CASTS_SHADOW,
                     [-1, -1, -1], [1, 1, 1])
    s.add_renderable(n_behind, 1, RENDERABLE_OPAQUE, [-1, -1, -1], [1, 1, 1])
    s.add_renderable(n_front, 2,
                     RENDERABLE_CASTS_SHADOW | RENDERABLE_DYNAMIC,
                     [-1, -1, -1], [1, 1, 1])
    s.update_transform_tree()
    vp = perspective(np.pi / 2, 1.0, 0.1, 100.0) @ \
        look_at_matrix([0, 0, 0], [0, 0, -1], [0, 1, 0])
    fr = Frustum(vp)
    assert s.gather_visible_opaque_renderables(fr).tolist() == [0]
    assert s.gather_visible_static_shadow_renderables(fr).tolist() == [0]
    assert s.gather_visible_dynamic_shadow_renderables(fr).tolist() == [2]


def _make_scene() -> SceneInfo:
    info = SceneInfo()
    info.meshes = [cube_mesh(0), sphere_mesh(6, 1), plane_mesh(1)]
    info.materials = [
        MaterialData(name="red",
                     base_color_factor=np.array([1, 0, 0, 1], np.float32),
                     roughness_factor=0.4, metallic_factor=0.1),
        MaterialData(name="tex", base_color_image=0, roughness_factor=0.9),
    ]
    rng = np.random.RandomState(1)
    info.images = [rng.randint(0, 255, (16, 16, 4), np.uint8)]
    info.image_srgb = [True]
    root = NodeData(name="root")
    c0 = NodeData(name="cube", translation=np.array([2, 0, 0], np.float32),
                  meshes=[0])
    c1 = NodeData(name="sphere",
                  rotation=np.array([0.92387953, 0, 0.38268343, 0],
                                    np.float32),
                  scale=np.array([2, 2, 2], np.float32), meshes=[1])
    c2 = NodeData(name="floor", meshes=[2])
    root.children = [1, 2, 3]
    info.nodes = [root, c0, c1, c2]
    info.roots = [0]
    info.lights = [LightData(type=LIGHT_DIRECTIONAL,
                             color=np.array([1, .9, .8], np.float32),
                             intensity=3.0)]
    info.cameras = [CameraData(fovy=1.1, znear=0.5, zfar=50.0)]
    return info


def test_gltf_roundtrip(tmp_path):
    info = _make_scene()
    path = str(tmp_path / "scene.gltf")
    export_gltf(info, path)
    parsed = GLTFParser(path).get_scene()

    assert len(parsed.meshes) == 3
    for a, b in zip(info.meshes, parsed.meshes):
        assert np.allclose(a.positions, b.positions, atol=1e-6)
        assert np.allclose(a.normals, b.normals, atol=1e-6)
        assert np.allclose(a.uvs, b.uvs, atol=1e-6)
        assert np.array_equal(a.indices, b.indices)
        assert a.material == b.material
    assert len(parsed.materials) == 2
    assert np.allclose(parsed.materials[0].base_color_factor, [1, 0, 0, 1])
    assert parsed.materials[0].roughness_factor == 0.4
    assert parsed.materials[1].base_color_image == 0
    assert parsed.image_srgb[0]          # baseColor is sRGB
    assert np.array_equal(parsed.images[0], info.images[0])
    # nodes & hierarchy
    assert parsed.nodes[0].children == [1, 2, 3]
    assert np.allclose(parsed.nodes[1].translation, [2, 0, 0])
    assert np.allclose(parsed.nodes[2].rotation,
                       [0.92387953, 0, 0.38268343, 0], atol=1e-6)
    assert np.allclose(parsed.nodes[2].scale, [2, 2, 2])
    assert parsed.roots == [0]
    # lights + cameras
    assert len(parsed.lights) == 1
    assert parsed.lights[0].intensity == 3.0
    assert len(parsed.cameras) == 1
    assert abs(parsed.cameras[0].fovy - 1.1) < 1e-6


def test_generated_normals_and_tangents():
    m = plane_mesh()
    assert np.allclose(m.normals, [[0, 1, 0]] * 4)
    assert m.tangents.shape == (4, 4)
    # Tangents orthogonal to normals.
    dots = (m.tangents[:, :3] * m.normals).sum(axis=1)
    assert np.allclose(dots, 0, atol=1e-6)
    s = sphere_mesh(8)
    ln = np.linalg.norm(s.normals, axis=1)
    assert np.allclose(ln, 1.0, atol=1e-5)


def test_camera():
    from granite_tpu.scene.camera import FPSCamera
    cam = FPSCamera()
    cam.look_at([0, 0, 5], [0, 0, 0])
    v = cam.get_view()
    assert np.allclose((v @ [0, 0, 0, 1])[:3], [0, 0, -5], atol=1e-5)
    assert np.allclose(cam.get_front(), [0, 0, -1], atol=1e-5)
    cam.move(forward=1.0, right=0.0, up=0.0, dt=1.0)
    assert np.allclose(cam.position, [0, 0, 5 - cam.speed], atol=1e-5)
    cam.rotate(yaw=np.pi / 2 / cam.turn_speed, pitch=0.0, dt=1.0)
    f = cam.get_front()
    assert abs(f[1]) < 1e-5 and abs(np.linalg.norm(f) - 1) < 1e-5
    assert f[0] < -0.9  # yawed left 90 degrees -> facing -X


def test_scene_loader_composition(tmp_path):
    # Export a small glTF, compose it twice with per-instance transforms
    # via a .scene document (scene_loader.cpp analogue), and verify the
    # merged SceneInfo.
    import json
    from granite_tpu.scene.scene_loader import SceneLoader
    info = _make_scene()
    export_gltf(info, str(tmp_path / "part.gltf"))
    doc = {"scenes": [{
        "path": "part.gltf",
        "instances": [
            {"translation": [10, 0, 0]},
            {"translation": [-10, 0, 0], "scale": [2, 2, 2]},
        ]}],
        "terrain": True}
    (tmp_path / "world.scene").write_text(json.dumps(doc))
    loader = SceneLoader(str(tmp_path / "world.scene"))
    merged = loader.get_scene()
    assert loader.terrain_config is not None
    assert len(merged.meshes) == len(info.meshes)       # shared, not dup
    assert len(merged.roots) == 2
    assert len(merged.nodes) == 2 * (len(info.nodes) + 1)
    r0 = merged.nodes[merged.roots[0]]
    r1 = merged.nodes[merged.roots[1]]
    assert np.allclose(r0.translation, [10, 0, 0])
    assert np.allclose(r1.scale, [2, 2, 2])
    # Children remapped into the merged node table and lights carried.
    assert all(0 <= c < len(merged.nodes) for c in r0.children)
    assert len(merged.lights) == len(info.lights)
    # Renders through the full pipeline (smoke): pack it.
    from granite_tpu.renderer.scene_renderer import pack_scene
    packed = pack_scene(merged)
    assert packed.num_objects == 2 * sum(
        len(n.meshes) for n in info.nodes)


def test_obj_to_gltf_roundtrip(tmp_path):
    """tools/obj_to_gltf (reference tools/obj_to_gltf.cpp): OBJ with
    materials converts to glTF our parser can reload."""
    obj = tmp_path / "tri.obj"
    mtl = tmp_path / "tri.mtl"
    mtl.write_text(
        "newmtl red\nKd 0.8 0.1 0.1\nNs 10\n"
        "newmtl blue\nKd 0.1 0.1 0.9\nd 0.5\n")
    obj.write_text(
        "mtllib tri.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "vn 0 0 1\n"
        "usemtl red\nf 1/1/1 2/2/1 3/3/1\n"
        "usemtl blue\nf 2/2/1 4/1/1 3/3/1\n")
    import sys as _sys
    _sys.path.insert(0, "tools")
    import importlib
    mod = importlib.import_module("obj_to_gltf")
    out = tmp_path / "tri.gltf"
    assert mod.main([str(obj), str(out)]) == 0
    from granite_tpu.scene.gltf import GLTFParser
    s = GLTFParser(str(out)).get_scene()
    assert len(s.meshes) == 2
    assert len(s.materials) == 2
    assert abs(s.materials[0].base_color_factor[0] - 0.8) < 1e-5
    assert len(s.meshes[0].positions) == 3


def test_gltf_spec_gloss_extension(tmp_path):
    """KHR_materials_pbrSpecularGlossiness maps onto metallic-roughness
    like the reference (gltf.cpp:945-983)."""
    import json

    from granite_tpu.scene.gltf import GLTFParser

    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "scene": 0,
        "nodes": [{"name": "n"}],
        "materials": [{
            "name": "sg",
            "extensions": {"KHR_materials_pbrSpecularGlossiness": {
                "diffuseFactor": [0.5, 0.25, 0.125, 1.0],
                "glossinessFactor": 0.8,
                "specularFactor": [0.1, 0.6, 0.2],
            }},
        }],
    }
    path = str(tmp_path / "sg.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    parsed = GLTFParser(path).get_scene()
    m = parsed.materials[0]
    assert np.allclose(m.base_color_factor, [0.5, 0.25, 0.125, 1.0])
    assert abs(m.roughness_factor - 0.2) < 1e-6      # 1 - gloss
    assert abs(m.metallic_factor - 0.6) < 1e-6       # max(spec)
