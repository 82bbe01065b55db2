"""SMAA — subpixel morphological anti-aliasing (reference: renderer/post/
smaa.cpp + assets/shaders/post/smaa/* + tools/build_smaa_luts).

Three-pass structure preserved: (1) luma edge detection with local
contrast adaptation, (2) blending-weight calculation via edge-length
searches, (3) neighborhood blending.  This implementation covers the
ORTHOGONAL pattern family analytically (the reference bakes the full
pattern space incl. diagonals/corners into AreaTex/SearchTex LUTs; the
diagonal and sharp-corner handling are a noted subset gap).  SMAA T2X
composes this with the 2-phase temporal jitter (ops/taa.py).

All passes are vectorized jnp over the full image (searches are fixed
MAX_SEARCH-step shift chains — branch-free, VPU-shaped).
"""

from __future__ import annotations

import jax.numpy as jnp

EDGE_THRESHOLD = 0.1
LOCAL_CONTRAST_FACTOR = 2.0
MAX_SEARCH = 8


def _luma(rgb):
    return (rgb * jnp.array([0.2126, 0.7152, 0.0722])).sum(-1)


def _shift(img, dy: int, dx: int):
    h, w = img.shape[:2]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad = ((py1, py0), (px1, px0)) + ((0, 0),) * (img.ndim - 2)
    return jnp.pad(img, pad, mode="edge")[py0:py0 + h, px0:px0 + w]


def edge_detection(rgb):
    """SMAA luma edge detection with local contrast adaptation.
    Returns (edges_left (H,W), edges_top (H,W)) booleans: an edge on the
    pixel's LEFT/TOP border (SMAA's convention)."""
    L = _luma(rgb)
    l_left = _shift(L[..., None], 0, -1)[..., 0]
    l_top = _shift(L[..., None], -1, 0)[..., 0]
    d_left = jnp.abs(L - l_left)
    d_top = jnp.abs(L - l_top)
    e_left = d_left >= EDGE_THRESHOLD
    e_top = d_top >= EDGE_THRESHOLD
    # local contrast adaptation: discard edges much weaker than the
    # strongest neighbor delta.
    l_right = _shift(L[..., None], 0, 1)[..., 0]
    l_bottom = _shift(L[..., None], 1, 0)[..., 0]
    l_leftleft = _shift(L[..., None], 0, -2)[..., 0]
    l_toptop = _shift(L[..., None], -2, 0)[..., 0]
    max_l = jnp.maximum(jnp.abs(L - l_right), jnp.abs(l_left - l_leftleft))
    max_t = jnp.maximum(jnp.abs(L - l_bottom), jnp.abs(l_top - l_toptop))
    cmax = jnp.maximum(max_l, max_t)
    e_left = e_left & (d_left >= cmax / LOCAL_CONTRAST_FACTOR)
    e_top = e_top & (d_top >= cmax / LOCAL_CONTRAST_FACTOR)
    return e_left, e_top


def _run_length(edge, step_dy: int, step_dx: int):
    """Length of the edge run continuing from each pixel in one direction,
    capped at MAX_SEARCH.  Branch-free: unrolled shifts."""
    dist = jnp.zeros(edge.shape, jnp.float32)
    running = jnp.ones(edge.shape, bool)
    for i in range(1, MAX_SEARCH + 1):
        e = _shift(edge[..., None], step_dy * i, step_dx * i)[..., 0]
        running = running & e
        dist = dist + running.astype(jnp.float32)
    return dist


def _gather_x(img, xi):
    """img[y, xi[y, x]] with clamped xi (per-pixel dynamic column)."""
    xi = jnp.clip(xi, 0, img.shape[1] - 1).astype(jnp.int32)
    return jnp.take_along_axis(img, xi, axis=1)


def _gather_y(img, yi):
    yi = jnp.clip(yi, 0, img.shape[0] - 1).astype(jnp.int32)
    return jnp.take_along_axis(img, yi, axis=0)


def _area(d1, d2, c1, c2):
    """Analytic coverage area for orthogonal patterns: the implied edge
    line re-vectorizes from the crossing at one end to the other; the
    blended fraction at THIS pixel is the average offset of that line
    over the pixel (the AreaTex formula for L/Z shapes)."""
    total = d1 + d2 + 1.0
    # crossing on one side lifts that endpoint by 0.5 px.
    h1 = jnp.where(c1, 0.5, 0.0)
    h2 = jnp.where(c2, 0.5, 0.0)
    # height of the line at this pixel's span [d1, d1+1] (linear interp
    # between endpoints at -0.5 and total - 0.5).
    t0 = (d1) / total
    t1 = (d1 + 1.0) / total
    y0 = h1 + (h2 - h1) * t0
    y1 = h1 + (h2 - h1) * t1
    area = 0.5 * (y0 + y1)
    # Z-shapes (both crossings) blend toward the nearer side only.
    both = c1 & c2
    area = jnp.where(both, jnp.where(d1 <= d2, area, 0.0), area)
    return area


def blending_weights(e_left, e_top):
    """Pass 2: per-pixel blend weights.

    For a horizontal run (top edges), crossing edges are LEFT edges at the
    run's end columns, on this row or the row above (SMAA probes both at
    the +-0.25 offsets; we OR them).  Symmetric for vertical runs.
    """
    h, w = e_left.shape
    xx = jnp.broadcast_to(jnp.arange(w)[None, :], (h, w))
    yy = jnp.broadcast_to(jnp.arange(h)[:, None], (h, w))

    e_left_up = _shift(e_left[..., None], -1, 0)[..., 0]
    d_l = _run_length(e_top, 0, -1)
    d_r = _run_length(e_top, 0, 1)
    c_l = (_gather_x(e_left, xx - d_l.astype(jnp.int32))
           | _gather_x(e_left_up, xx - d_l.astype(jnp.int32)))
    c_r = (_gather_x(e_left, xx + d_r.astype(jnp.int32) + 1)
           | _gather_x(e_left_up, xx + d_r.astype(jnp.int32) + 1))
    a_h = jnp.where(e_top, _area(d_l, d_r, c_l, c_r), 0.0)

    e_top_left = _shift(e_top[..., None], 0, -1)[..., 0]
    d_u = _run_length(e_left, -1, 0)
    d_d = _run_length(e_left, 1, 0)
    c_u = (_gather_y(e_top, yy - d_u.astype(jnp.int32))
           | _gather_y(e_top_left, yy - d_u.astype(jnp.int32)))
    c_d = (_gather_y(e_top, yy + d_d.astype(jnp.int32) + 1)
           | _gather_y(e_top_left, yy + d_d.astype(jnp.int32) + 1))
    a_v = jnp.where(e_left, _area(d_u, d_d, c_u, c_d), 0.0)
    return a_h, a_v


def neighborhood_blend(rgb, a_h, a_v):
    """Pass 3: blend with the neighbor across the edge by the weights.
    a_h blends with the pixel ABOVE (top edge), a_v with the LEFT."""
    top = _shift(rgb, -1, 0)
    left = _shift(rgb, 0, -1)
    out = rgb
    out = out + a_h[..., None] * (top - out)
    out = out + a_v[..., None] * (left - out)
    # Also receive contributions from below/right neighbors' edges.
    a_h_below = _shift(a_h[..., None], 1, 0)[..., 0]
    a_v_right = _shift(a_v[..., None], 0, 1)[..., 0]
    below = _shift(rgb, 1, 0)
    right = _shift(rgb, 0, 1)
    out = out + 0.5 * a_h_below[..., None] * (below - out)
    out = out + 0.5 * a_v_right[..., None] * (right - out)
    return out


def smaa(rgb):
    """Full SMAA 1x chain on tonemapped LDR (H, W, 3)."""
    e_left, e_top = edge_detection(rgb)
    a_h, a_v = blending_weights(e_left, e_top)
    return jnp.clip(neighborhood_blend(rgb, a_h, a_v), 0.0, 1.0)