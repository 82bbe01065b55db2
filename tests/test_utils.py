"""Foundation utility tests (analogues of reference unit tests:
lru_cache_test.cpp, thread_group_test.cpp, etc. per SURVEY.md §4.3)."""

import json
import os

from granite_tpu.utils import (
    fnv1a, Hasher, FrameTimer, TimelineTraceFile, scoped_timeline_event,
    get_environment_bool, get_environment_int,
)


def test_fnv1a_known_vectors():
    # FNV-1a 64-bit reference vectors.
    assert fnv1a(b"") == 0xCBF29CE484222325
    assert fnv1a(b"a") == 0xAF63DC4C8601EC8C
    assert fnv1a("foobar") == 0x85944171F73967E8


def test_hasher_streaming():
    h1 = Hasher().string("pass").u32(7).f32(1.5).get()
    h2 = Hasher().string("pass").u32(7).f32(1.5).get()
    h3 = Hasher().string("pass").u32(8).f32(1.5).get()
    assert h1 == h2 and h1 != h3


def test_frame_timer_fixed_step():
    t = FrameTimer()
    assert t.frame(fixed_step=0.01) == 0.01
    assert t.frame(fixed_step=0.01) == 0.01
    assert abs(t.get_elapsed() - 0.02) < 1e-9


def test_timeline_trace(tmp_path):
    path = str(tmp_path / "trace.json")
    tf = TimelineTraceFile(path)
    TimelineTraceFile.set_instance(tf)
    with scoped_timeline_event("frame"):
        with scoped_timeline_event("pass"):
            pass
    tf.complete_event("device:gbuffer", 100.0, 50.0, tid=99)
    tf.flush()
    TimelineTraceFile.set_instance(None)
    data = json.load(open(path))
    names = [e.get("name") for e in data["traceEvents"]]
    assert "frame" in names and "pass" in names and "device:gbuffer" in names
    phases = [e["ph"] for e in data["traceEvents"]]
    assert phases.count("B") == 2 and phases.count("E") == 2


def test_environment_helpers():
    os.environ["GRANITE_TEST_INT"] = "42"
    os.environ["GRANITE_TEST_BOOL"] = "1"
    assert get_environment_int("GRANITE_TEST_INT") == 42
    assert get_environment_bool("GRANITE_TEST_BOOL")
    assert get_environment_int("GRANITE_TEST_MISSING", 7) == 7


def test_ttf_font_renders():
    """ui/font.py (renderer/font.hpp stb_truetype analogue): TTF glyphs
    blend into the overlay canvas; falls back to bitmap if absent."""
    import numpy as np
    from granite_tpu.ui.flat_renderer import FlatRenderer
    from granite_tpu.ui.font import Font
    f = Font(size=14)
    fr = FlatRenderer(128, 32)
    fr.begin()
    fr.render_text("Granite", 2, 2, (1, 1, 0, 1), font=f)
    canvas = fr.flush()
    assert np.asarray(canvas)[..., 3].max() > 0.5   # something drawn
    if f.available:
        # TTF coverage should be denser than a blank canvas and have
        # antialiased (fractional) alpha somewhere.
        a = np.asarray(canvas)[..., 3]
        assert ((a > 0.05) & (a < 0.95)).any()


def test_fastmath_accuracy():
    import numpy as np
    from granite_tpu.ops.fastmath import (
        equirect_uv, fast_acos, fast_atan2, pow07,
    )
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, 20001).astype(np.float32)
    assert np.abs(fast_acos(x, np) - np.arccos(x)).max() < 1e-4
    a = rng.uniform(-2, 2, 20001).astype(np.float32)
    b = rng.uniform(-2, 2, 20001).astype(np.float32)
    d = np.abs(fast_atan2(a, b, np) - np.arctan2(a, b))
    d = np.minimum(d, 2 * np.pi - d)
    assert d.max() < 2e-4
    t = rng.uniform(0, 1, 20001).astype(np.float32)
    assert np.abs(pow07(t, np) - t ** 0.7).max() < 2.5e-3
    # uv convention matches the exact mapping
    v3 = rng.normal(size=(5000, 3)).astype(np.float32)
    u, v = equirect_uv(v3[:, 0], v3[:, 1], v3[:, 2], np)
    n = np.linalg.norm(v3, axis=1)
    theta = np.arccos(np.clip(v3[:, 1] / n, -1, 1))
    phi = np.arctan2(v3[:, 2], v3[:, 0])
    ue = np.where(phi < 0, phi + 2 * np.pi, phi) / (2 * np.pi)
    du = np.abs(u - ue)
    du = np.minimum(du, 1 - du)
    assert du.max() < 1e-4 and np.abs(v - theta / np.pi).max() < 1e-4
