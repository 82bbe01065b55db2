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

Pattern coverage: ORTHOGONAL L/Z shapes analytically (AreaTex formula
inlined); DIAGONAL 45-degree staircases (step corners from co-located
left+top edges, diag runs measured along both diagonals, diag areas
replacing the orthogonal weights where the pattern wins — the
SMAACalculateDiagWeights early-out); SHARP CORNERS (blending scaled by
the corner-rounding factor when the crossing edge is two pixels deep,
SMAA_CORNER_ROUNDING = 25).
"""

from __future__ import annotations

import jax.numpy as jnp

EDGE_THRESHOLD = 0.1
LOCAL_CONTRAST_FACTOR = 2.0
MAX_SEARCH = 8
MAX_SEARCH_DIAG = 4
CORNER_ROUNDING = 0.25          # SMAA_CORNER_ROUNDING 25 (smaa.h)


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


def _area_signed(d1, d2, h1, h2):
    """Signed analytic AreaTex: the implied edge line runs from height
    h1 (at the left/up end) to h2; positive height = the line sags into
    THIS pixel (far-side color covers part of it), negative = it bulges
    into the NEIGHBOR (this color covers part of that one).  Returns
    (area_this, area_other): blend fractions for this pixel and for the
    across-the-edge neighbor — the two weights the reference fetches
    from AreaTex with the +/- offsets."""
    total = d1 + d2 + 1.0
    t0 = d1 / total
    t1 = (d1 + 1.0) / total
    y0 = h1 + (h2 - h1) * t0
    y1 = h1 + (h2 - h1) * t1
    # Trapezoid mean of the positive / negative parts over [y0, y1].
    def _mean_pos(a, b):
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        hi_pos = jnp.maximum(hi, 0.0)
        lo_pos = jnp.maximum(lo, 0.0)
        # integral of max(y,0) over a linear segment / length
        denom = jnp.where(jnp.abs(hi - lo) < 1e-6, 1.0, hi - lo)
        frac = jnp.clip(hi_pos / jnp.maximum(denom, 1e-6), 0.0, 1.0)
        return jnp.where(
            jnp.abs(hi - lo) < 1e-6, jnp.maximum(0.5 * (a + b), 0.0),
            0.5 * (hi_pos + lo_pos) * jnp.where(lo >= 0, 1.0, frac))
    area_this = _mean_pos(y0, y1)
    area_other = _mean_pos(-y0, -y1)
    # Equal crossing heights mean the silhouette is genuinely straight
    # along the run (U/bump shapes): no revectorization, no blending
    # (AreaTex zeroes those pattern cells).
    straight = jnp.abs(h1 - h2) < 1e-6
    area_this = jnp.where(straight, 0.0, area_this)
    area_other = jnp.where(straight, 0.0, area_other)
    return area_this, area_other


def _diag_run(stair, dy: int, dx: int):
    """Diagonal run length of staircase corners, capped MAX_SEARCH_DIAG."""
    dist = jnp.zeros(stair.shape, jnp.float32)
    running = jnp.ones(stair.shape, bool)
    for i in range(1, MAX_SEARCH_DIAG + 1):
        e = _shift(stair[..., None], dy * i, dx * i)[..., 0]
        running = running & e
        dist = dist + running.astype(jnp.float32)
    return dist


def diagonal_weights(e_left, e_top):
    """45-degree staircase handling (SMAACalculateDiagWeights).

    A '\\' step corner has a top AND a left edge on the same pixel; a
    '/' step corner pairs a top edge with the right neighbor's left
    edge.  Where a diagonal run of >= 2 steps exists, the true edge is
    the 45-degree line: boundary pixels blend ~0.25 toward each crossed
    neighbor (ends taper to 0.125).  Returns (a_h_diag, a_v_diag,
    is_diag)."""
    e_left_r = _shift(e_left[..., None], 0, 1)[..., 0]
    stair1 = e_left & e_top                 # '\\' steps
    stair2 = e_top & e_left_r               # '/' steps
    n1 = _diag_run(stair1, 1, 1) + _diag_run(stair1, -1, -1)
    n2 = _diag_run(stair2, 1, -1) + _diag_run(stair2, -1, 1)
    d1 = stair1 & (n1 >= 1)
    d2 = stair2 & (n2 >= 1)
    is_diag = d1 | d2
    n = jnp.where(d1, n1, n2)
    # Interior steps blend 0.25; the two end steps 0.125.
    taper = jnp.where(n >= 2, 0.25, 0.125)
    a = jnp.where(is_diag, taper, 0.0)
    return a, a, is_diag


def _corner_factor(edge_cross, edge_cross_deep):
    """Sharp-corner rounding: a crossing edge that continues one more
    pixel deep marks a corner; scale blending there to CORNER_ROUNDING
    (the reference's AreaTex corner variants)."""
    sharp = edge_cross & edge_cross_deep
    return jnp.where(sharp, CORNER_ROUNDING, 1.0)


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
    e_left_down = _shift(e_left[..., None], 1, 0)[..., 0]
    e_left_upup = _shift(e_left[..., None], -2, 0)[..., 0]
    d_l = _run_length(e_top, 0, -1)
    d_r = _run_length(e_top, 0, 1)
    xl = xx - d_l.astype(jnp.int32)
    xr = xx + d_r.astype(jnp.int32) + 1
    cl_here = _gather_x(e_left, xl)
    cl_up = _gather_x(e_left_up, xl)
    cl_down = _gather_x(e_left_down, xl)
    cl_upup = _gather_x(e_left_upup, xl)
    cr_here = _gather_x(e_left, xr)
    cr_up = _gather_x(e_left_up, xr)
    cr_down = _gather_x(e_left_down, xr)
    cr_upup = _gather_x(e_left_upup, xr)
    # Signed crossings: a left-edge on the row ABOVE pulls the implied
    # line up (+, far color sags into this pixel); on THIS row pulls it
    # down (-).  A rectangle's top edge (both ends below) yields zero
    # blend here and rounds the pixels above instead — matching the
    # reference's U/L/Z AreaTex families.
    h_l = jnp.where(cl_up, 0.5, 0.0) - jnp.where(cl_here, 0.5, 0.0)
    h_r = jnp.where(cr_up, 0.5, 0.0) - jnp.where(cr_here, 0.5, 0.0)
    a_h, a_h_above = _area_signed(d_l, d_r, h_l, h_r)
    # A crossing continuing a second pixel away from the edge marks a
    # true 90-degree corner -> keep it sharp (corner rounding).
    corner = _corner_factor(cl_here | cl_up,
                            (cl_here & cl_down) | (cl_up & cl_upup)) \
        * _corner_factor(cr_here | cr_up,
                         (cr_here & cr_down) | (cr_up & cr_upup))
    a_h = jnp.where(e_top, a_h * corner, 0.0)
    a_h_above = jnp.where(e_top, a_h_above * corner, 0.0)

    e_top_left = _shift(e_top[..., None], 0, -1)[..., 0]
    e_top_right = _shift(e_top[..., None], 0, 1)[..., 0]
    e_top_leftleft = _shift(e_top[..., None], 0, -2)[..., 0]
    d_u = _run_length(e_left, -1, 0)
    d_d = _run_length(e_left, 1, 0)
    yu = yy - d_u.astype(jnp.int32)
    yd = yy + d_d.astype(jnp.int32) + 1
    cu_here = _gather_y(e_top, yu)
    cu_left = _gather_y(e_top_left, yu)
    cu_right = _gather_y(e_top_right, yu)
    cu_ll = _gather_y(e_top_leftleft, yu)
    cd_here = _gather_y(e_top, yd)
    cd_left = _gather_y(e_top_left, yd)
    cd_right = _gather_y(e_top_right, yd)
    cd_ll = _gather_y(e_top_leftleft, yd)
    h_u = jnp.where(cu_left, 0.5, 0.0) - jnp.where(cu_here, 0.5, 0.0)
    h_d = jnp.where(cd_left, 0.5, 0.0) - jnp.where(cd_here, 0.5, 0.0)
    a_v, a_v_left = _area_signed(d_u, d_d, h_u, h_d)
    cornerv = _corner_factor(cu_here | cu_left,
                             (cu_here & cu_right) | (cu_left & cu_ll)) \
        * _corner_factor(cd_here | cd_left,
                         (cd_here & cd_right) | (cd_left & cd_ll))
    a_v = jnp.where(e_left, a_v * cornerv, 0.0)
    a_v_left = jnp.where(e_left, a_v_left * cornerv, 0.0)

    # Diagonal patterns override the orthogonal weights where detected.
    ah_d, av_d, is_diag = diagonal_weights(e_left, e_top)
    a_h = jnp.where(is_diag, ah_d, a_h)
    a_v = jnp.where(is_diag, av_d, a_v)
    a_h_above = jnp.where(is_diag, ah_d, a_h_above)
    a_v_left = jnp.where(is_diag, av_d, a_v_left)
    return a_h, a_v, a_h_above, a_v_left


def neighborhood_blend(rgb, a_h, a_v, a_h_above, a_v_left):
    """Pass 3: blend across edges by the two-sided weights.  a_h mixes
    the ABOVE color into this pixel; a_h_above (stored at the edge
    pixel) mixes THIS color into the pixel above — delivered here from
    the pixel below's edge.  Symmetric for vertical edges."""
    top = _shift(rgb, -1, 0)
    left = _shift(rgb, 0, -1)
    out = rgb
    out = out + a_h[..., None] * (top - out)
    out = out + a_v[..., None] * (left - out)
    # Contributions pushed up/left by the edges at the pixel below/right.
    a_from_below = _shift(a_h_above[..., None], 1, 0)[..., 0]
    a_from_right = _shift(a_v_left[..., None], 0, 1)[..., 0]
    below = _shift(rgb, 1, 0)
    right = _shift(rgb, 0, 1)
    out = out + a_from_below[..., None] * (below - out)
    out = out + a_from_right[..., None] * (right - out)
    return out


def smaa(rgb):
    """Full SMAA 1x chain on tonemapped LDR (H, W, 3)."""
    e_left, e_top = edge_detection(rgb)
    a_h, a_v, a_h_above, a_v_left = blending_weights(e_left, e_top)
    return jnp.clip(
        neighborhood_blend(rgb, a_h, a_v, a_h_above, a_v_left), 0.0, 1.0)