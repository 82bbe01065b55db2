"""Animation + skinning tests (animation_system + SkinnedMesh analogues)."""

import numpy as np
import jax.numpy as jnp

from granite_tpu.math.muglm import quat_from_axis_angle
from granite_tpu.scene.animation import AnimationSystem, _sample_channel
from granite_tpu.scene.scene import Scene
from granite_tpu.scene.scene_formats import AnimationData


def make_channel(path, times, values, interp="LINEAR", node=0):
    return dict(node=node, path=path, interp=interp,
                times=np.asarray(times, np.float32),
                values=np.asarray(values, np.float32))


def test_linear_translation_sampling():
    ch = make_channel("translation", [0, 1, 2],
                      [[0, 0, 0], [1, 0, 0], [1, 2, 0]])
    assert np.allclose(_sample_channel(ch, 0.5), [0.5, 0, 0])
    assert np.allclose(_sample_channel(ch, 1.5), [1, 1, 0])
    # Clamped outside the range.
    assert np.allclose(_sample_channel(ch, -1), [0, 0, 0])
    assert np.allclose(_sample_channel(ch, 5), [1, 2, 0])


def test_step_and_cubic():
    ch = make_channel("scale", [0, 1], [[1, 1, 1], [2, 2, 2]],
                      interp="STEP")
    assert np.allclose(_sample_channel(ch, 0.99), [1, 1, 1])
    # Cubic with zero tangents behaves like smoothstep: passes endpoints.
    vals = np.zeros((2, 3, 3), np.float32)
    vals[0, 1] = [0, 0, 0]
    vals[1, 1] = [1, 1, 1]
    ch = make_channel("translation", [0, 1], vals, interp="CUBICSPLINE")
    assert np.allclose(_sample_channel(ch, 0.0), [0, 0, 0])
    assert np.allclose(_sample_channel(ch, 1.0), [1, 1, 1])
    mid = _sample_channel(ch, 0.5)
    assert np.allclose(mid, 0.5, atol=1e-6)  # hermite midpoint, 0 tangents


def test_rotation_slerp_and_system():
    s = Scene()
    n = s.create_node()
    q0 = quat_from_axis_angle([0, 1, 0], 0.0)
    q1 = quat_from_axis_angle([0, 1, 0], np.pi / 2)
    anim = AnimationData(name="spin", channels=[
        make_channel("rotation", [0, 2], [q0, q1], node=n)])
    sys = AnimationSystem(s)
    sys.start_animation(anim, looping=True)
    sys.animate(1.0)
    s.update_transform_tree()
    expect = quat_from_axis_angle([0, 1, 0], np.pi / 4)
    got = s.rotation[n]
    if np.dot(got, expect) < 0:
        got = -got
    assert np.allclose(got, expect, atol=1e-5)
    # Looping: t = duration + 1 -> same as t = 1.
    sys.animate(3.0)
    assert np.allclose(np.abs(s.rotation[n]), np.abs(expect), atol=1e-5)


def test_skinned_vertex_transform():
    # Two-bone vertical strip: bone 1 rotates 90 deg about Z at its head
    # (y=1); a vertex at y=2 fully bound to bone 1 swings to (-1, 1).
    from granite_tpu.renderer.scene_renderer import pack_scene, \
        world_positions
    from granite_tpu.scene.scene_formats import (
        MeshData, NodeData, SceneInfo, SkinData, MaterialData,
    )
    info = SceneInfo()
    info.materials = [MaterialData()]
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                    [0, 2, 0], [1, 2, 0], [0.5, 2.5, 0]], np.float32)
    idx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    joints = np.zeros((6, 4), np.int32)
    joints[3:, 0] = 1                      # top tri on bone 1
    weights = np.zeros((6, 4), np.float32)
    weights[:, 0] = 1.0
    md = MeshData(positions=pos, indices=idx, joints=joints,
                  weights=weights, material=0).finalize()
    info.meshes = [md]
    skin_root = NodeData(name="root_bone")
    bone1 = NodeData(name="bone1",
                     translation=np.array([0, 1, 0], np.float32))
    meshnode = NodeData(name="mesh", meshes=[0], skin=0)
    skin_root.children = [1]
    info.nodes = [skin_root, bone1, meshnode]
    info.roots = [0, 2]
    ib = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    ib[1, 1, 3] = -1.0                     # inverse bind of bone1 at y=1
    info.skins = [SkinData(joints=np.array([0, 1], np.int32),
                           inverse_bind=ib)]
    packed = pack_scene(info)
    assert packed.v_joints is not None
    assert packed.num_static_verts == 0    # all verts skinned

    from granite_tpu.scene.scene import Scene
    s = Scene()
    for i, nd in enumerate(info.nodes):
        parent = 0 if i == 1 else -1
        s.create_node(parent=parent, translation=nd.translation,
                      rotation=nd.rotation, scale=nd.scale)
    # Rotate bone1 90 degrees about Z.
    s.rotation[1] = quat_from_axis_angle([0, 0, 1], np.pi / 2)
    s.update_transform_tree()
    palette = jnp.asarray(np.matmul(s.world[info.skins[0].joints],
                                    info.skins[0].inverse_bind))
    world = jnp.asarray(s.world)
    wp = np.asarray(world_positions(packed, world, palette))
    # Vertex bound to bone 0 unchanged.
    assert np.allclose(wp[0], [0, 0, 0], atol=1e-5)
    # Vertex at (0,2,0) bound to bone1: rotates about (0,1,0) -> (-1,1,0).
    k = np.where((np.asarray(packed.positions) == [0, 2, 0]).all(1))[0][0]
    assert np.allclose(wp[k], [-1, 1, 0], atol=1e-5)
