"""Video-textured surface demo (app/video_player.py; reference
tests/video_player.cpp): VideoSource frames drive a rendered quad."""

import os

import numpy as np
import pytest


def _write_png_seq(d, n=3, size=32):
    import imageio.v2 as iio
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        img = np.zeros((size, size, 4), np.uint8)
        img[..., i % 3] = 230          # frame 0 red, 1 green, 2 blue
        img[..., 3] = 255
        iio.imwrite(os.path.join(d, f"f{i:04d}.png"), img)


def test_video_player_quad_follows_stream(tmp_path):
    """Each rendered frame is dominated by the current video frame's
    color; the stream advances and holds the last frame at EOS."""
    import types
    from granite_tpu.app.video_player import VideoPlayerApplication

    seq = str(tmp_path / "vid")
    _write_png_seq(seq, n=3)
    app = VideoPlayerApplication(types.SimpleNamespace(
        video=seq, video_size=32))
    app.swapchain_updated(96, 54)
    expect_channel = [0, 1, 2, 2]      # EOS holds blue
    for i in range(4):
        out = np.asarray(app.render_frame(1 / 30, i / 30))
        rgb = out[..., :3].astype(np.float32)
        # quad pixels: bright in exactly one channel
        bright = rgb.max(-1) > 100
        assert bright.mean() > 0.15, bright.mean()   # quad covers screen
        dom = rgb[bright].argmax(-1)
        assert (dom == expect_channel[i]).mean() > 0.95, (i, dom[:8])
    assert app._frames_decoded == 3
    app.teardown()


def test_video_source_png_fallback_eos(tmp_path):
    from granite_tpu.app.video_source import VideoSource
    seq = str(tmp_path / "vid2")
    _write_png_seq(seq, n=2, size=16)
    src = VideoSource(seq, 16, 16)
    assert src.read_frame() is not None
    assert src.read_frame() is not None
    assert src.read_frame() is None
    src.close()
