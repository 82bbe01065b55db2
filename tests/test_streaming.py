"""Texture streaming end-to-end (assets/streaming.py; reference
filesystem/asset_manager.hpp:93-135 + resource_manager.hpp:78)."""

import time

import numpy as np
import jax.numpy as jnp

from granite_tpu.renderer.scene_renderer import pack_scene
from granite_tpu.scene.mesh_util import plane_mesh
from granite_tpu.scene.scene_formats import (
    MaterialData, NodeData, SceneInfo,
)


def _textured_scene():
    info = SceneInfo()
    img = np.zeros((32, 32, 4), np.uint8)
    img[..., 0] = 255                     # pure red texture
    img[..., 3] = 255
    info.images = [img]
    info.image_srgb = [False]
    info.image_paths = [None]
    info.materials = [MaterialData(name="m0", base_color_image=0)]
    info.meshes = [plane_mesh(material=0)]
    info.nodes = [NodeData(name="floor", meshes=[0])]
    info.roots = [0]
    return info


def _bundle_texel(bundles, b):
    """Level-0 texel (0,0) base-color RGB of bundle b."""
    v = np.asarray(bundles[b, 0, 0, :3], np.float32)
    return v


def test_streaming_fallback_then_resident():
    info = _textured_scene()
    packed = pack_scene(info, texture_size=32, texture_streaming=True)
    st = packed.streamer
    assert st is not None
    # Frame 0: fallback white base color.
    assert np.allclose(_bundle_texel(packed.bundles, 0), 1.0, atol=1e-3)
    # Iterate until the decode task lands and the bundle latches red.
    bundles = packed.bundles
    for _ in range(100):
        bundles = st.latch()
        if not np.allclose(_bundle_texel(bundles, 0), 1.0, atol=1e-3):
            break
        time.sleep(0.02)
    texel = _bundle_texel(bundles, 0)
    assert texel[0] > 0.9 and texel[1] < 0.1, texel   # red resident
    assert st.manager.current_cost > 0


def test_streaming_budget_keeps_fallback():
    info = _textured_scene()
    packed = pack_scene(info, texture_size=32, texture_streaming=True,
                        texture_budget=1)     # 1 byte: nothing fits
    st = packed.streamer
    bundles = packed.bundles
    for _ in range(20):
        bundles = st.latch()
        time.sleep(0.01)
    # Budget excludes the texture -> still the white fallback.
    assert np.allclose(_bundle_texel(bundles, 0), 1.0, atol=1e-3)
