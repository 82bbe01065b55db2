"""Volumetric decal tests (renderer/lights/decal_volume.cpp +
assets/shaders/lights/volumetric_decal.h behavior)."""

import json
import tempfile
import types

import jax.numpy as jnp
import numpy as np
import pytest

from granite_tpu.ops.decals import (
    apply_decals, apply_decals_reference, build_decal_strips,
    builtin_decal_image, decal_world_aabbs, pack_decals,
)


def _translate_scale(t, s):
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[2, 2] = s
    m[:3, 3] = t
    return m


def _flat_quarter_images():
    """Four constant-color decal textures with distinct alphas."""
    imgs = []
    for i, (rgb, a) in enumerate([((1, 0, 0), 0.5), ((0, 1, 0), 0.25),
                                  ((0, 0, 1), 1.0), ((1, 1, 0), 0.75)]):
        img = np.zeros((8, 8, 4), np.float32)
        img[..., :3] = rgb
        img[..., 3] = a
        imgs.append(img)
    return imgs


def test_layered_matches_reference_loop():
    """The K-layer single-gather path equals the sequential per-decal
    loop wherever overlap depth <= K."""
    rng = np.random.RandomState(7)
    strips = jnp.asarray(build_decal_strips(_flat_quarter_images()))
    transforms = [
        _translate_scale((0, 0, 0), (2, 2, 2)),
        _translate_scale((0.5, 0, 0), (2, 2, 2)),   # overlaps decal 0
        _translate_scale((5, 5, 5), (1, 1, 1)),     # disjoint
    ]
    decals = pack_decals(transforms, [0, 1, 2], capacity=8)
    pos = jnp.asarray(rng.uniform(-2, 6, (16, 16, 3)).astype(np.float32))
    base = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    alpha = jnp.asarray(rng.rand(16, 16).astype(np.float32))
    got_c, got_a = apply_decals(base, alpha, pos, decals, strips, layers=2)
    ref_c, ref_a = apply_decals_reference(base, alpha, pos, decals, strips)
    assert np.allclose(np.asarray(got_c), np.asarray(ref_c), atol=1e-5)
    assert np.allclose(np.asarray(got_a), np.asarray(ref_a), atol=1e-5)


def test_ordered_blend_and_range():
    """In-range pixels mix in decal-index order; out-of-range pixels are
    untouched (volumetric_decal.h:58-65)."""
    strips = jnp.asarray(build_decal_strips(_flat_quarter_images()))
    # Decals 0 (red a=0.5) and 2 (blue a=1.0) both cover the origin.
    decals = pack_decals([_translate_scale((0, 0, 0), (1, 1, 1)),
                          _translate_scale((0, 0, 0), (1, 1, 1))],
                         [0, 2], capacity=4)
    base = jnp.zeros((2, 1, 3), jnp.float32)
    alpha = jnp.ones((2, 1), jnp.float32)
    pos = jnp.asarray([[[0.0, 0.0, 0.0]], [[3.0, 0.0, 0.0]]], jnp.float32)
    color, a = apply_decals(base, alpha, pos, decals, strips, layers=2)
    c = np.asarray(color)
    # mix(mix(base, red, .5), blue, 1.0) = blue
    assert np.allclose(c[0, 0], [0, 0, 1], atol=1e-5)
    assert np.allclose(c[1, 0], [0, 0, 0], atol=1e-6)   # out of range
    assert abs(float(np.asarray(a)[0, 0]) - 1.0) < 1e-5


def test_dead_slots_never_hit():
    strips = jnp.asarray(build_decal_strips(_flat_quarter_images()))
    decals = pack_decals([], [], capacity=4)
    base = jnp.full((4, 4, 3), 0.3, jnp.float32)
    alpha = jnp.full((4, 4), 0.9, jnp.float32)
    pos = jnp.zeros((4, 4, 3), jnp.float32)
    color, a = apply_decals(base, alpha, pos, decals, strips)
    assert np.allclose(np.asarray(color), 0.3)
    assert np.allclose(np.asarray(a), 0.9)


def test_decal_world_aabbs_and_scene_gather():
    from granite_tpu.math.frustum import Frustum
    from granite_tpu.math.muglm import look_at_matrix, perspective
    from granite_tpu.scene.scene import Scene

    mn, mx = decal_world_aabbs([_translate_scale((1, 2, 3), (2, 4, 6))])
    assert np.allclose(mn[0], [0, 0, 0])
    assert np.allclose(mx[0], [2, 4, 6])

    s = Scene()
    front = s.create_node(translation=(0, 0, -5))
    behind = s.create_node(translation=(0, 0, 50))
    s.create_volumetric_decal(front, 0)
    s.create_volumetric_decal(behind, 1)
    s.update_transform_tree()
    vp = perspective(np.pi / 3, 1.0, 0.1, 100.0) @ look_at_matrix(
        np.zeros(3), np.array([0.0, 0.0, -1.0]),
        np.array([0.0, 1.0, 0.0]))
    vis = s.gather_visible_volumetric_decals(Frustum(vp))
    assert list(vis) == [0]


@pytest.mark.slow
def test_viewer_decal_knob_changes_pixels():
    """volumetricDecals knob: a decal box over the procedural scene's
    floor darkens covered pixels."""
    from granite_tpu.app.scene_viewer import SceneViewerApplication

    def render(with_decal: bool):
        cfg = {"renderer": "forward", "hdrBloom": False,
               "shadowMapResolution": 32, "clusteredLightsShadows": False,
               "volumetricDecals": True}
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            json.dump(cfg, f)
            path = f.name
        app = SceneViewerApplication(types.SimpleNamespace(
            scene=None, config=path, camera_index=-1, bench_scene=False))
        if with_decal:
            node = app.scene.create_node(translation=(0, 0, 0),
                                         scale=(6, 6, 6))
            app.scene.create_volumetric_decal(node, 0)
            app.scene.update_transform_tree()
        app.swapchain_updated(96, 54)
        out = app.render_frame(1 / 60, 0.0)
        return np.asarray(out).astype(np.float32)

    plain = render(False)
    decaled = render(True)
    assert plain.shape == decaled.shape
    diff = np.abs(plain[..., :3] - decaled[..., :3]).max(-1)
    changed = int((diff > 8).sum())
    assert changed > 20 and float(diff.max()) > 25, \
        f"decal had no visible effect ({changed} px, max {diff.max()})"
