"""Morph target tests (glTF primitive.targets; scene_formats.hpp
weights channel)."""

import numpy as np
import jax.numpy as jnp

from granite_tpu.renderer.scene_renderer import (
    pack_scene, transform_vertices, world_positions,
)
from granite_tpu.scene.mesh_util import plane_mesh
from granite_tpu.scene.scene_formats import (
    AnimationData, MaterialData, NodeData, SceneInfo,
)


def _morph_scene():
    info = SceneInfo()
    info.materials = [MaterialData()]
    plain = plane_mesh(material=0)
    morphing = plane_mesh(material=0)
    v = len(morphing.positions)
    up = np.zeros((v, 3), np.float32)
    up[:, 1] = 1.0                         # target 0: +1 in y
    side = np.zeros((v, 3), np.float32)
    side[:, 0] = 2.0                       # target 1: +2 in x
    morphing.morph_position_deltas = [up, side]
    morphing.default_morph_weights = np.array([0.5, 0.0], np.float32)
    info.meshes = [plain, morphing]
    info.nodes = [NodeData(name="plain", meshes=[0]),
                  NodeData(name="morpher", meshes=[1])]
    info.roots = [0, 1]
    return info, v


def test_pack_and_apply_morphs():
    info, v = _morph_scene()
    packed = pack_scene(info, texture_size=32)
    assert packed.morph_deltas is not None
    assert packed.morph_deltas.shape == (v, 2, 3)
    assert packed.morph_v0 == v            # plain block first
    assert np.allclose(packed.morph_default_weights, [[0.5, 0.0]])

    world = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)))
    nm = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)))
    vp = jnp.eye(4)
    weights = jnp.asarray(np.array([[1.0, 0.25]], np.float32))
    clip, wpos, wnrm, wtan = transform_vertices(
        packed, world, nm, vp, morph_weights=weights)
    wpos = np.asarray(wpos)
    base = np.asarray(packed.positions)
    # plain block untouched
    assert np.allclose(wpos[:v], base[:v], atol=1e-6)
    # morph block displaced by 1*up + 0.25*side
    expect = base[v:] + np.array([0.5, 1.0, 0.0], np.float32)
    assert np.allclose(wpos[v:], expect, atol=1e-5)

    wp2 = np.asarray(world_positions(packed, world,
                                     morph_weights=weights))
    assert np.allclose(wp2, wpos, atol=1e-6)


def test_animation_weights_channel():
    from granite_tpu.scene.animation import AnimationSystem

    class FakeScene:
        def __init__(self):
            self.translation = np.zeros((2, 3), np.float32)
            self.rotation = np.tile(np.array([1, 0, 0, 0], np.float32),
                                    (2, 1))
            self.scale = np.ones((2, 3), np.float32)
            self.node_morph_weights = {}

    sc = FakeScene()
    an = AnimationSystem(sc)
    ad = AnimationData(name="w")
    ad.channels.append(dict(
        node=1, path="weights", interp="LINEAR",
        times=np.array([0.0, 1.0], np.float32),
        values=np.array([[0.0, 0.0], [1.0, 0.5]], np.float32)))
    an.start_animation(ad)
    an.animate(0.5)
    w = sc.node_morph_weights[1]
    assert np.allclose(w, [0.5, 0.25], atol=1e-6)
