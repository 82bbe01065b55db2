"""Breadcrumb/validation-mode tests (breadcrumbs.hpp + fault_sandbox.cpp
analogues): pass trail on faults, NaN detection, per-pass timing."""

import jax.numpy as jnp
import numpy as np
import pytest

from granite_tpu.graph import AttachmentInfo, RenderGraph, SizeClass
from granite_tpu.graph.debug import execute_debug


def small():
    return AttachmentInfo(size_class=SizeClass.ABSOLUTE, size_x=4,
                          size_y=4, channels=1)


def build(fail_in=None, nan_in=None):
    g = RenderGraph()
    g.set_backbuffer_dimensions(4, 4)

    def make(i):
        def ex(ctx):
            x = (ctx.input(f"r{i - 1}") + 1.0) if i else \
                jnp.ones((4, 4))
            if fail_in == i:
                raise RuntimeError("simulated device fault")
            if nan_in == i:
                x = x / 0.0 * 0.0    # NaN
            return {f"r{i}": x}
        return ex
    for i in range(4):
        p = g.add_pass(f"p{i}").add_color_output(f"r{i}", small())
        if i:
            p.add_texture_input(f"r{i - 1}")
        p.set_execute(make(i))
    g.set_backbuffer_source("r3")
    g.bake()
    return g


def test_breadcrumbs_success_trail():
    g = build()
    out, hist, crumbs = execute_debug(g, {}, g.initial_history())
    assert crumbs.completed == ["p0", "p1", "p2", "p3"]
    assert crumbs.failed is None
    assert np.allclose(np.asarray(out), 4.0)
    assert all(n in crumbs.pass_times_ms for n in crumbs.completed)
    assert "p2" in crumbs.report()


def test_breadcrumbs_fault_attribution():
    g = build(fail_in=2)
    with pytest.raises(RuntimeError, match="simulated device fault"):
        execute_debug(g, {}, g.initial_history())


def test_breadcrumbs_nan_detection():
    g = build(nan_in=1)
    out, hist, crumbs = execute_debug(g, {}, g.initial_history())
    # NaN originates in p1 and propagates through later passes; the FIRST
    # flagged pass is the origin — exactly what the trail is for.
    assert crumbs.nan_passes[0] == "p1"
    assert "[NaN/Inf!]" in crumbs.report()


@pytest.mark.slow
def test_viewer_hot_reload(tmp_path):
    import json
    import os
    import time
    import types
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({"shadowMapResolution": 32,
                               "hdrBloom": False}))
    from granite_tpu.app.scene_viewer import SceneViewerApplication
    args = types.SimpleNamespace(scene=None, config=str(cfg),
                                 camera_index=-1, bench_scene=False)
    app = SceneViewerApplication(args)
    app.swapchain_updated(64, 64)
    assert not app.config.hdr_bloom
    order_before = app.graph.pass_order
    assert "bloom-threshold" not in order_before
    time.sleep(0.01)
    cfg.write_text(json.dumps({"shadowMapResolution": 32,
                               "hdrBloom": True}))
    os.utime(str(cfg))
    app.post_frame()        # polls notifications -> re-bake
    assert app.config.hdr_bloom
    assert "bloom-threshold" in app.graph.pass_order


def test_kernel_hot_reload(tmp_path, monkeypatch):
    """GRANITE_WATCH_KERNELS: touching an op module re-bakes the graph
    (the ShaderManager inotify->recompile flow, SURVEY §3.5)."""
    import json
    import os
    import time
    import types

    import granite_tpu.ops.hdr as hdr_mod

    monkeypatch.setenv("GRANITE_WATCH_KERNELS", "1")
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({"shadowMapResolution": 32,
                               "clusteredLightsShadows": False}))
    from granite_tpu.app.scene_viewer import SceneViewerApplication
    app = SceneViewerApplication(types.SimpleNamespace(
        scene=None, config=str(cfg), camera_index=-1, bench_scene=False))
    app.swapchain_updated(64, 64)
    baked_before = app.graph
    # Touch a watched module (content unchanged; reload is a no-op but
    # must trigger the re-bake path).
    time.sleep(0.01)
    os.utime(hdr_mod.__file__)
    app.post_frame()
    assert app.graph._jitted is not None     # re-baked successfully
