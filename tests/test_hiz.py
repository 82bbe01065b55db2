"""HiZ pyramid + occlusion culling tests (hiz.cpp test analogue)."""

import numpy as np
import pytest
import jax.numpy as jnp

from granite_tpu.math import perspective, look_at_matrix
from granite_tpu.ops.hiz import build_hiz, occlusion_test, project_aabbs


def test_hiz_pyramid_min():
    depth = jnp.zeros((8, 16)).at[2, 3].set(0.9).at[5, 10].set(0.4)
    hiz = build_hiz(depth)
    assert hiz[0].shape == (8, 16)
    assert hiz[1].shape == (4, 8)
    # Min reduction: coarse texel containing the 0.9 but also 0 stays 0.
    assert float(hiz[1][1, 1]) == 0.0
    # A fully-near region propagates its min.
    d2 = jnp.full((8, 8), 0.7)
    h2 = build_hiz(d2)
    assert abs(float(h2[-1].min()) - 0.7) < 1e-6


def test_occlusion_behind_wall():
    # A near wall fills the left half of the depth buffer at z=0.8;
    # an object behind it (z 0.3) in the same region must be culled,
    # the same object over the empty right half stays visible.
    depth = jnp.zeros((64, 128)).at[:, :64].set(0.8)
    hiz = build_hiz(depth)
    rect_min = jnp.array([[8.0, 8.0], [80.0, 8.0]])
    rect_max = jnp.array([[40.0, 40.0], [112.0, 40.0]])
    max_z = jnp.array([0.3, 0.3])
    vis = np.asarray(occlusion_test(hiz, rect_min, rect_max, max_z,
                                    128, 64))
    assert not vis[0]      # fully behind the wall
    assert vis[1]          # over background (min depth 0) -> visible
    # A nearer object in front of the wall stays visible.
    vis2 = np.asarray(occlusion_test(hiz, rect_min[:1], rect_max[:1],
                                     jnp.array([0.95]), 128, 64))
    assert vis2[0]


def test_project_aabbs():
    vp = jnp.asarray(perspective(np.pi / 2, 1.0, 0.1, 100.0) @
                     look_at_matrix([0, 0, 0], [0, 0, -1], [0, 1, 0]))
    mins = jnp.array([[-1.0, -1.0, -5.0], [-1.0, -1.0, 3.0]])
    maxs = jnp.array([[1.0, 1.0, -4.0], [1.0, 1.0, 5.0]])
    rmin, rmax, maxz, behind = project_aabbs(mins, maxs, vp, 128, 128)
    assert not bool(behind[0]) and bool(behind[1])
    # Front box projects to a centered rect.
    assert 0 < float(rmin[0, 0]) < 64 < float(rmax[0, 0]) < 128
    assert 0.0 < float(maxz[0]) < 1.0


@pytest.mark.slow
def test_viewer_occlusion_knob(tmp_path):
    import json
    import types
    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps({"shadowMapResolution": 32,
                               "hdrBloom": False,
                               "occlusionCulling": True}))
    from granite_tpu.app.scene_viewer import SceneViewerApplication
    args = types.SimpleNamespace(scene=None, config=str(cfg),
                                 camera_index=-1, bench_scene=False)
    app = SceneViewerApplication(args)
    app.swapchain_updated(64, 64)
    a = np.asarray(app.render_frame(0.016, 0.0))   # frame 0: empty history
    b = np.asarray(app.render_frame(0.016, 0.016))  # frame 1: culled w/ HiZ
    # Static camera: the HiZ cull must not change the image.
    assert np.array_equal(a, b)


@pytest.mark.slow
def test_two_phase_occlusion_matches_uncullled_render():
    """Two-phase culling is conservative: the rendered image equals the
    uncull render (scene_renderer.hpp:132 First/Second phases), and the
    carried visibility set stabilizes after frame 0."""
    import json
    import tempfile
    import types

    import numpy as np

    def render(extra):
        cfg = {"renderer": "forward", "hdrBloom": False,
               "shadowMapResolution": 32,
               "clusteredLightsShadows": False}
        cfg.update(extra)
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            json.dump(cfg, f)
            path = f.name
        from granite_tpu.app.scene_viewer import SceneViewerApplication
        app = SceneViewerApplication(types.SimpleNamespace(
            scene=None, config=path, camera_index=-1, bench_scene=False))
        app.swapchain_updated(96, 64)
        out = None
        for i in range(2):
            out = app.render_frame(1 / 60, i / 60.0)
        return np.asarray(out)

    base = render({})
    culled = render({"occlusionCulling": True})
    assert base.shape == culled.shape
    # Frame 1 re-renders the (now known) visible set; conservative
    # culling must not change the image.
    assert (base.astype(int) - culled.astype(int)).__abs__().max() <= 1
