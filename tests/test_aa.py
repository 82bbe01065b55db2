"""AA tests (aa_bench analogue): TAA color space round-trip, jitter
sequence, resolve convergence; FXAA edge smoothing."""

import numpy as np
import pytest
import jax.numpy as jnp

from granite_tpu.ops.taa import (
    JITTER_TAA_8PHASE, TemporalJitter, hdr_to_taa, taa_to_hdr, taa_resolve,
)
from granite_tpu.ops.fxaa import fxaa


def test_taa_color_space_roundtrip():
    rng = np.random.RandomState(0)
    hdr = jnp.asarray(rng.uniform(0, 4, (8, 8, 3)).astype(np.float32))
    back = taa_to_hdr(hdr_to_taa(hdr))
    assert np.allclose(np.asarray(back), np.asarray(hdr), rtol=1e-3,
                       atol=1e-4)


def test_jitter_sequence():
    j = TemporalJitter(JITTER_TAA_8PHASE, 128, 128)
    vp = np.eye(4, dtype=np.float32)
    ms = [j.step(vp) for _ in range(9)]
    # 8-phase: frame 0 and frame 8 share the jitter offset.
    assert np.allclose(ms[0], ms[8])
    assert not np.allclose(ms[0], ms[1])
    # Jitter magnitude is subpixel: |clip offset| <= 2*pixel.
    assert abs(ms[0][0, 3]) <= 2.0 * 2.0 / 128


def test_taa_resolve_static_convergence():
    # Static scene + identity reprojection: the resolve must converge
    # toward the (constant) current frame and stay stable.
    H = W = 16
    cur = jnp.asarray(np.full((H, W, 3), 0.25, np.float32))
    depth = jnp.full((H, W), 0.5)
    remap = np.array([[0.5, 0, 0, 0.5], [0, 0.5, 0, 0.5],
                      [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    reproj = jnp.asarray(remap)
    hist = jnp.zeros((H, W, 3))
    for _ in range(8):
        out, hist = taa_resolve(cur, hist, depth, reproj, W, H)
    assert np.allclose(np.asarray(out), 0.25, atol=2e-3)


def test_taa_clamps_ghosting():
    # History wildly different from the neighborhood must be clamped:
    # output stays near current, not near stale history.
    H = W = 8
    cur = jnp.full((H, W, 3), 0.5)
    bogus_hist = hdr_to_taa(jnp.full((H, W, 3), 40.0))
    depth = jnp.full((H, W), 0.5)
    remap = jnp.asarray(np.array([[0.5, 0, 0, 0.5], [0, 0.5, 0, 0.5],
                                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32))
    out, _ = taa_resolve(cur, bogus_hist, depth, remap, W, H)
    assert np.allclose(np.asarray(out), 0.5, atol=0.05)


def test_fxaa_smooths_staircase():
    # A hard diagonal staircase edge: FXAA must reduce the luma jumps
    # along the edge without touching flat regions.
    H = W = 32
    img = np.zeros((H, W, 3), np.float32)
    for y in range(H):
        img[y, : y] = 1.0       # diagonal step edge
    out = np.asarray(fxaa(jnp.asarray(img), W, H))
    # Flat interior pixels unchanged.
    assert np.allclose(out[28, 2], img[28, 2])
    assert np.allclose(out[2, 28], img[2, 28])
    # Edge pixels got intermediate values somewhere along the staircase.
    edge_vals = np.array([out[y, y, 0] for y in range(4, H - 4)])
    assert ((edge_vals > 0.05) & (edge_vals < 0.95)).any()
    assert not np.isnan(out).any()


def test_smaa_smooths_staircase():
    from granite_tpu.ops.smaa import smaa, edge_detection
    H = W = 32
    img = np.zeros((H, W, 3), np.float32)
    for y in range(H):
        img[y, : y] = 1.0
    e_left, e_top = edge_detection(jnp.asarray(img))
    assert np.asarray(e_left).any() and np.asarray(e_top).any()
    out = np.asarray(smaa(jnp.asarray(img)))
    assert np.allclose(out[28, 2], img[28, 2])      # flat area untouched
    edge_vals = np.array([out[y, y, 0] for y in range(4, H - 4)])
    assert ((edge_vals > 0.02) & (edge_vals < 0.98)).any()
    assert not np.isnan(out).any()


def test_motion_vectors_translating_point():
    """A surface point that moved +0.2 NDC in x between frames must get
    mv.x = +0.1 uv (reconstruct_mv.frag semantics: uv_cur - uv_prev)."""
    from granite_tpu.renderer.scene_renderer import motion_vectors
    W, H = 16, 8
    # Identity "view-proj": world == clip.  Current frame: the surface
    # point is wherever the pixel is; previous frame it was 0.2 NDC to
    # the LEFT (object moved right).
    remap = np.array([[0.5, 0, 0, 0.5], [0, 0.5, 0, 0.5],
                      [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    prev_vp_uv = jnp.asarray(remap)       # world xy == ndc
    u = (np.arange(W) + 0.5) / W
    v = (np.arange(H) + 0.5) / H
    uu, vv = np.meshgrid(u, v)
    cur_ndc = np.stack([2 * uu - 1, 2 * vv - 1, np.full_like(uu, 0.5)],
                       axis=-1)
    prev_pos = cur_ndc.copy()
    prev_pos[..., 0] -= 0.2               # was left of current position
    covered = jnp.ones((H, W), bool)
    depth = jnp.full((H, W), 0.5, jnp.float32)
    cam_reproj = jnp.asarray(remap)       # static camera fallback
    mv = motion_vectors(jnp.asarray(prev_pos.astype(np.float32)),
                        covered, depth, prev_vp_uv, cam_reproj, W, H)
    mv = np.asarray(mv)
    assert np.allclose(mv[..., 0], 0.1, atol=1e-5)
    assert np.allclose(mv[..., 1], 0.0, atol=1e-5)
    # Background pixels use the camera fallback (static camera -> 0).
    mv2 = motion_vectors(jnp.asarray(prev_pos.astype(np.float32)),
                         jnp.zeros((H, W), bool), depth, prev_vp_uv,
                         cam_reproj, W, H)
    assert np.allclose(np.asarray(mv2), 0.0, atol=1e-5)


def test_taa_resolve_uses_object_mv():
    """With per-object MV, a moving flat-colored region must pull its
    history from the OLD location (no ghosting of the background)."""
    H, W = 16, 32
    rng = np.random.RandomState(0)
    # Frame colors: a bright 8-wide band that moved 4 px right.
    def band(x0):
        img = np.zeros((H, W, 3), np.float32)
        img[:, x0:x0 + 8] = [2.0, 1.0, 0.5]
        return img
    prev_hdr = band(8)
    cur_hdr = band(12)
    from granite_tpu.ops.taa import hdr_to_taa, taa_resolve
    prev_taa = np.asarray(hdr_to_taa(jnp.asarray(prev_hdr)))
    depth = jnp.full((H, W), 0.5, jnp.float32)
    reproj = jnp.asarray(np.array([[0.5, 0, 0, 0.5], [0, 0.5, 0, 0.5],
                                   [0, 0, 1, 0], [0, 0, 0, 1]],
                                  np.float32))
    mv = np.zeros((H, W, 2), np.float32)
    mv[:, 12:20, 0] = 4.0 / W             # band pixels moved right
    out_mv, _ = taa_resolve(jnp.asarray(cur_hdr), jnp.asarray(prev_taa),
                            depth, reproj, W, H,
                            mv=jnp.asarray(mv))
    out_static, _ = taa_resolve(jnp.asarray(cur_hdr),
                                jnp.asarray(prev_taa), depth, reproj,
                                W, H)
    out_mv = np.asarray(out_mv)
    # Inside the band (away from edges): MV path fetches band history ->
    # output stays at the band color; static path fetches background
    # history -> pulled toward black before the clamp re-centers it.
    center = out_mv[8, 15]
    assert center[0] > 1.5, center


@pytest.mark.slow
def test_smaa_diagonal_staircase():
    """A 45-degree staircase must get diagonal blending (output values
    strictly between the two colors along the diagonal)."""
    from granite_tpu.ops.smaa import smaa
    H = W = 24
    img = np.zeros((H, W, 3), np.float32)
    for y in range(H):
        img[y, : min(y + 4, W)] = 1.0      # white below-left of a 45 line
    out = np.asarray(smaa(jnp.asarray(img)))
    # Pixels adjacent to the diagonal are blended.
    blended = ((out > 0.05) & (out < 0.95)).any(axis=-1)
    diag_band = np.zeros((H, W), bool)
    for y in range(2, H - 2):
        x = y + 3
        if 1 < x < W - 1:
            diag_band[y, x - 1:x + 2] = True
    assert blended[diag_band].mean() > 0.4, blended[diag_band].mean()


def test_smaa_preserves_sharp_corner():
    """A crisp 90-degree corner of a large rectangle blends less than an
    edge midpoint (corner rounding keeps shapes sharp)."""
    from granite_tpu.ops.smaa import blending_weights, edge_detection
    H = W = 32
    img = np.zeros((H, W, 3), np.float32)
    img[8:24, 8:24] = 1.0
    e_l, e_t = edge_detection(jnp.asarray(img))
    a_h, a_v, a_h_above, a_v_left = blending_weights(e_l, e_t)
    a_h = np.asarray(a_h)
    # The top edge of a solid rectangle is a "U" shape (both crossings
    # on the same side): zero blending INTO the rectangle row.
    assert np.allclose(a_h[8, 9:23], 0.0, atol=1e-6)
    a_h = np.asarray(a_h_above)
    # The background row above rounds only slightly at the two corners:
    # corner rounding caps the end blend at 25% of the unsuppressed
    # L-shape weight (~0.47 -> ~0.12), and the straight middle stays 0.
    row = a_h[8, 8:24]
    assert row[0] <= 0.13 and row[-1] <= 0.13, row
    assert np.allclose(row[7:9], 0.0, atol=1e-6), row
