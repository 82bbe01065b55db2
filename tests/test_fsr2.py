"""FSR2-style temporal upscaler tests (renderer/post/temporal.hpp:91 +
aa.cpp "taaFSR2" contract)."""

import json
import tempfile
import types

import jax.numpy as jnp
import numpy as np
import pytest

from granite_tpu.ops.fsr2 import (
    fsr2_jitter_phases, fsr2_upscale, halton, rcas_sharpen,
)
from granite_tpu.ops.taa import hdr_to_taa


def test_halton_sequence():
    # Standard Halton(2) prefix: 1/2, 1/4, 3/4, 1/8 ...
    assert abs(halton(1, 2) - 0.5) < 1e-9
    assert abs(halton(2, 2) - 0.25) < 1e-9
    assert abs(halton(3, 2) - 0.75) < 1e-9
    assert abs(halton(1, 3) - 1 / 3) < 1e-9


def test_jitter_phase_count_scales():
    assert len(fsr2_jitter_phases(1920, 1920)) == 8
    assert len(fsr2_jitter_phases(960, 1920)) == 32     # 8 * 2^2
    p = fsr2_jitter_phases(960, 1920)
    assert (np.abs(p) <= 0.5).all()


def test_rcas_no_ring_and_sharpens():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    out = rcas_sharpen(img, 0.9)
    assert out.shape == img.shape
    # Flat regions unchanged; result never exceeds local minmax (no ring)
    flat = rcas_sharpen(jnp.full((8, 8, 3), 0.4, jnp.float32), 0.9)
    assert np.allclose(np.asarray(flat), 0.4, atol=1e-6)
    # An edge gets steeper (difference across the edge grows).
    edge = np.zeros((8, 8, 3), np.float32)
    edge[:, 4:] = 0.8
    edge[:, 3] = 0.3
    sh = np.asarray(rcas_sharpen(jnp.asarray(edge), 0.9))
    assert sh[4, 3, 0] <= edge[4, 3, 0] + 1e-6   # dark side darker/equal


@pytest.mark.slow
def test_upscale_shapes_and_stability():
    """Constant input converges to the constant at display res."""
    h, w, H, W = 9, 16, 18, 32
    color = jnp.full((h, w, 3), 0.25, jnp.float32)
    depth = jnp.full((h, w), 0.5, jnp.float32)
    mv = jnp.zeros((h, w, 2), jnp.float32)
    hist_c = hdr_to_taa(jnp.full((H, W, 3), 0.25, jnp.float32))
    hist = jnp.concatenate([hist_c, jnp.ones((H, W, 1), jnp.float32)], -1)
    out, new_hist = fsr2_upscale(color, depth, mv, hist,
                                 jnp.zeros(2), H, W)
    assert out.shape == (H, W, 3)
    assert new_hist.shape == (H, W, 4)
    assert np.allclose(np.asarray(out), 0.25, atol=2e-2)


@pytest.mark.slow
def test_subpixel_detail_recovery():
    """Accumulating a full jitter cycle recovers display-res detail a
    single bilinear upsample cannot: a display-res checkerboard whose
    frequency exceeds render res."""
    H, W = 16, 16
    h, w = 8, 8
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gt = ((xx + yy) % 2).astype(np.float32) * 0.5 + 0.1
    gt3 = np.repeat(gt[..., None], 3, -1)

    def render_lr(j_uv):
        # LR camera with jitter j (uv units): image point of scene uv0
        # lands at uv0 + j, so LR texel at uv point-samples the scene
        # pixel containing uv - j.
        u = (np.arange(w) + 0.5) / w
        v = (np.arange(h) + 0.5) / h
        uu, vv = np.meshgrid(u, v)
        sx = np.clip(np.floor((uu - j_uv[0]) * W).astype(int), 0, W - 1)
        sy = np.clip(np.floor((vv - j_uv[1]) * H).astype(int), 0, H - 1)
        return jnp.asarray(gt3[sy, sx])

    phases = fsr2_jitter_phases(w, W)
    depth = jnp.full((h, w), 0.5, jnp.float32)
    mv = jnp.zeros((h, w, 2), jnp.float32)
    hist = jnp.zeros((H, W, 4), jnp.float32)
    out = None
    for cycle in range(3):
        for p in phases:
            j_uv = jnp.asarray([p[0] / w, p[1] / h])
            out, hist = fsr2_upscale(render_lr(np.asarray(j_uv)), depth,
                                     mv, hist, j_uv, H, W, sharpness=0.0)
    # Interior only: border pixels fall back to the clamped current
    # sample when reprojection taps the edge gutter.
    err = np.abs(np.asarray(out)[2:-2, 2:-2] - gt3[2:-2, 2:-2]).mean()
    # Single bilinear upsample of an unjittered LR frame: the checker
    # aliases to a constant ~0.35 -> error ~0.25.  Temporal accumulation
    # must beat it by a wide margin.
    assert err < 0.08, f"detail not recovered (mean err {err})"


@pytest.mark.slow
def test_viewer_taafsr2_knob():
    """postAA taaFSR2 renders at resolutionScale and outputs display
    res."""
    from granite_tpu.app.scene_viewer import SceneViewerApplication

    cfg = {"renderer": "forward", "hdrBloom": False,
           "shadowMapResolution": 32, "clusteredLightsShadows": False,
           "postAA": "taaFSR2", "resolutionScale": 0.5}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name
    app = SceneViewerApplication(types.SimpleNamespace(
        scene=None, config=path, camera_index=-1, bench_scene=False))
    app.swapchain_updated(128, 72)
    assert app._rw == 64 and app._rh == 36      # render res scaled
    out = None
    for i in range(3):
        out = app.render_frame(1 / 60, i / 60)
    out = np.asarray(out)
    assert out.shape == (72, 128, 4)            # display res output
    assert (out[..., :3] > 0).any()


def test_rcas_flat_white_no_nan():
    """A neighborhood exactly flat at 1.0 made hit_max 0/0 -> NaN
    (round-2 advisor); the clamped denominator keeps it finite and the
    flat region unchanged."""
    from granite_tpu.ops.fsr2 import rcas_sharpen
    img = jnp.ones((16, 16, 3), jnp.float32)
    out = np.asarray(rcas_sharpen(img, 0.5))
    assert np.isfinite(out).all()
    assert np.allclose(out, 1.0)
