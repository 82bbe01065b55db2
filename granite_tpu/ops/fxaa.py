"""FXAA (reference: renderer/post/fxaa.cpp + assets/shaders/post/fxaa.frag,
which uses the standard FXAA 3.11 quality preset).

Implemented as the FXAA 3.11 "PC quality" algorithm (12-step edge search
with the standard step schedule), fully vectorized: every pixel runs the
same fixed tap sequence (masked where the edge test fails), which is the
branch-free form the VPU wants anyway.

Operates on tonemapped LDR RGB in [0,1]; luma = dot(rgb, (0.299, 0.587,
0.114)) like the reference's pre-pass.
"""

from __future__ import annotations

import jax.numpy as jnp

EDGE_THRESHOLD = 1.0 / 8.0
EDGE_THRESHOLD_MIN = 1.0 / 24.0
SUBPIX_QUALITY = 0.75
_STEPS = [1.0, 1.5, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 4.0, 8.0]


def _luma(rgb):
    return (rgb * jnp.array([0.299, 0.587, 0.114])).sum(-1)


def _shift(img, dy: int, dx: int):
    h, w = img.shape[:2]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad = ((py1, py0), (px1, px0)) + ((0, 0),) * (img.ndim - 2)
    return jnp.pad(img, pad, mode="edge")[py0:py0 + h, px0:px0 + w]


def fxaa(rgb, width: int, height: int):
    """(H, W, 3) LDR -> antialiased (H, W, 3)."""
    from .hdr import _sample_bilinear_uv

    L = _luma(rgb)
    lN = _shift(L[..., None], -1, 0)[..., 0]
    lS = _shift(L[..., None], 1, 0)[..., 0]
    lW = _shift(L[..., None], 0, -1)[..., 0]
    lE = _shift(L[..., None], 0, 1)[..., 0]
    l_min = jnp.minimum(L, jnp.minimum(jnp.minimum(lN, lS),
                                       jnp.minimum(lW, lE)))
    l_max = jnp.maximum(L, jnp.maximum(jnp.maximum(lN, lS),
                                       jnp.maximum(lW, lE)))
    rng = l_max - l_min
    active = rng >= jnp.maximum(EDGE_THRESHOLD_MIN, l_max * EDGE_THRESHOLD)

    lNW = _shift(L[..., None], -1, -1)[..., 0]
    lNE = _shift(L[..., None], -1, 1)[..., 0]
    lSW = _shift(L[..., None], 1, -1)[..., 0]
    lSE = _shift(L[..., None], 1, 1)[..., 0]

    # Horizontal/vertical edge estimation (FXAA 3.11).
    edge_h = (jnp.abs(-2 * lW + lNW + lSW) + 2 * jnp.abs(-2 * L + lN + lS)
              + jnp.abs(-2 * lE + lNE + lSE))
    edge_v = (jnp.abs(-2 * lN + lNW + lNE) + 2 * jnp.abs(-2 * L + lW + lE)
              + jnp.abs(-2 * lS + lSW + lSE))
    is_horiz = edge_h >= edge_v     # edge runs horizontally -> step in y

    l1 = jnp.where(is_horiz, lN, lW)
    l2 = jnp.where(is_horiz, lS, lE)
    grad1 = l1 - L
    grad2 = l2 - L
    steepest1 = jnp.abs(grad1) >= jnp.abs(grad2)
    grad_scaled = 0.25 * jnp.maximum(jnp.abs(grad1), jnp.abs(grad2))

    inv_w = 1.0 / width
    inv_h = 1.0 / height
    step_len = jnp.where(is_horiz, inv_h, inv_w)
    step_len = jnp.where(steepest1, -step_len, step_len)
    l_local_avg = jnp.where(steepest1, 0.5 * (l1 + L), 0.5 * (l2 + L))

    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) * inv_w
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) * inv_h
    uu, vv = jnp.meshgrid(u, v)
    # Move half a pixel toward the edge.
    cu = jnp.where(is_horiz, uu, uu + 0.5 * step_len)
    cv = jnp.where(is_horiz, vv + 0.5 * step_len, vv)

    # Edge-aligned direction.
    du = jnp.where(is_horiz, inv_w, 0.0)
    dv = jnp.where(is_horiz, 0.0, inv_h)

    def edge_search(sign):
        dist = jnp.zeros_like(L)
        done = jnp.zeros_like(L, dtype=bool)
        end_luma = jnp.zeros_like(L)
        acc = jnp.zeros_like(L)
        for s in _STEPS:
            acc = acc + jnp.where(done, 0.0, s)
            pu = cu + sign * du * acc
            pv = cv + sign * dv * acc
            lum = _luma(_sample_bilinear_uv(rgb, pu, pv))
            delta = lum - l_local_avg
            reached = jnp.abs(delta) >= grad_scaled
            end_luma = jnp.where(done, end_luma, delta)
            dist = jnp.where(done, dist, acc)
            done = done | reached
        return dist, end_luma

    dist_p, luma_p = edge_search(+1.0)
    dist_n, luma_n = edge_search(-1.0)

    closer_p = dist_p < dist_n
    dist_final = jnp.minimum(dist_p, dist_n)
    edge_len = dist_p + dist_n
    pixel_offset = -dist_final / jnp.maximum(edge_len, 1e-6) + 0.5

    l_center_below = L < l_local_avg
    end_delta = jnp.where(closer_p, luma_p, luma_n)
    good_span = (end_delta < 0) != l_center_below
    pixel_offset = jnp.where(good_span, pixel_offset, 0.0)

    # Subpixel aliasing.
    l_avg = (1.0 / 12.0) * (2 * (lN + lS + lW + lE)
                            + lNW + lNE + lSW + lSE)
    sub = jnp.clip(jnp.abs(l_avg - L) / jnp.maximum(rng, 1e-6), 0.0, 1.0)
    sub = (-2.0 * sub + 3.0) * sub * sub
    sub = sub * sub * SUBPIX_QUALITY
    offset = jnp.maximum(pixel_offset, sub) * jnp.abs(step_len) \
        * jnp.sign(step_len)

    fu = jnp.where(is_horiz, uu, uu + offset)
    fv = jnp.where(is_horiz, vv + offset, vv)
    out = _sample_bilinear_uv(rgb, fu, fv)
    return jnp.where(active[..., None], out, rgb)
