"""FSR2-style temporal upscaling (postAA "taaFSR2").

Reference: renderer/post/temporal.hpp:91 setup_fsr2_pass +
renderer/post/aa.cpp:184 (PostAAType::TAA_FSR2, config string "taaFSR2")
— the reference links AMD's FidelityFX FSR2 library; this is a
TPU-native upscaler with the same contract: jittered low-res color +
depth + motion vectors in, display-res anti-aliased image out, with
temporal accumulation recovering sub-pixel detail across the jitter
sequence and an RCAS-style contrast-adaptive sharpen at the end.

TPU design (gather economics, ops/texture.py): everything a display
pixel needs from the render-res frame — current color (TAA space),
rounded 3x3 neighborhood min/max, dilated motion vector — is packed
into one wide per-texel payload, quad-packed with VPU shifts, and
fetched with ONE single-index gather; history reprojection is a second
gather.  Two gathers per display pixel total, the same budget as the
1x TAA resolve.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .taa import _clamp_box_aabb, _shift, hdr_to_taa, taa_to_hdr
from .texture import quad_pack2d


def halton(index: int, base: int) -> float:
    f, r = 1.0, 0.0
    while index > 0:
        f /= base
        r += f * (index % base)
        index //= base
    return r


def fsr2_jitter_phases(render_w: int, display_w: int) -> np.ndarray:
    """Halton(2,3) jitter sequence; phase count follows FSR2's
    8 * (display/render)^2 rule so the sample grid covers every display
    pixel position over a full cycle."""
    scale = display_w / max(render_w, 1)
    n = max(int(np.ceil(8.0 * scale * scale)), 2)
    return np.array([[halton(i + 1, 2) - 0.5, halton(i + 1, 3) - 0.5]
                     for i in range(n)], np.float32)


def rcas_sharpen(img, sharpness: float = 0.87):
    """Robust contrast-adaptive sharpening (the RCAS stage FSR2 runs
    after accumulation; ffx-fsr sharpen.frag lineage).  5-tap cross,
    negative lobe scaled by local contrast headroom, result clamped to
    the local min/max so it cannot ring."""
    n = _shift(img, -1, 0)
    s = _shift(img, 1, 0)
    w_ = _shift(img, 0, -1)
    e = _shift(img, 0, 1)
    mn = jnp.minimum(jnp.minimum(jnp.minimum(n, s), jnp.minimum(w_, e)),
                     img)
    mx = jnp.maximum(jnp.maximum(jnp.maximum(n, s), jnp.maximum(w_, e)),
                     img)
    # Contrast-adaptive lobe: how much negative weight the neighborhood
    # can absorb before clipping (per-channel min, RCAS style).
    hit_min = mn / jnp.maximum(4.0 * mx, 1e-6)
    # Denominator clamped AWAY from zero: a 5-tap neighborhood exactly
    # flat at 1.0 made this 0/0 -> NaN, which rode jnp.maximum/clip
    # into the output pixel (round-2 advisor).
    hit_max = (1.0 - mx) / jnp.minimum(
        4.0 * jnp.minimum(mn, 1.0) - 4.0, -1e-6)
    lobe_limit = jnp.maximum(-hit_min, hit_max).max(-1, keepdims=True)
    lobe = jnp.clip(lobe_limit, -0.1875, 0.0) * sharpness
    out = (img + lobe * (n + s + w_ + e)) / (1.0 + 4.0 * lobe)
    return jnp.clip(out, mn, mx)


def fsr2_upscale(color_lr, depth_lr, mv_lr, history_hr, jitter_uv,
                 out_h: int, out_w: int, sharpness: float = 0.5):
    """One FSR2-style upscale step.

    color_lr: (h, w, 3) linear HDR rendered with the jittered camera;
    depth_lr: (h, w) reverse-Z; mv_lr: (h, w, 2) uv motion vectors
    (uv_cur - uv_prev); history_hr: (out_h, out_w, 4) TAA-space history
    color + ACCUMULATION WEIGHT (FSR2 carries the same: display pixels
    average jittered samples by alignment weight, so the rare exactly-
    aligned sample dominates the many misaligned ones — a fixed lerp
    can never recover sub-render-res detail because misaligned frames
    outvote aligned ones ~N:1 over a jitter cycle);
    jitter_uv: (2,) this frame's jitter in UV units (+x right, +y down —
    the same clip-space translation TemporalJitter applied).
    Returns (out_hdr (out_h, out_w, 3), new_history (out_h, out_w, 4)).
    """
    cur = hdr_to_taa(color_lr)

    # Motion dilation toward the nearest depth (silhouette tracking).
    best_d = depth_lr
    best_mv = mv_lr
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nd = _shift(depth_lr[..., None], dy, dx)[..., 0]
        nmv = _shift(mv_lr, dy, dx)
        closer = nd > best_d
        best_mv = jnp.where(closer[..., None], nmv, best_mv)
        best_d = jnp.maximum(best_d, nd)

    # Rounded-corner neighborhood bounds at render res.
    lo_x = cur
    hi_x = cur
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nb = _shift(cur, dy, dx)
        lo_x = jnp.minimum(lo_x, nb)
        hi_x = jnp.maximum(hi_x, nb)
    lo_d = lo_x
    hi_d = hi_x
    for dy, dx in ((-1, -1), (1, 1), (-1, 1), (1, -1)):
        nb = _shift(cur, dy, dx)
        lo_d = jnp.minimum(lo_d, nb)
        hi_d = jnp.maximum(hi_d, nb)
    lo = 0.5 * (lo_x + lo_d)
    hi = 0.5 * (hi_x + hi_d)

    # ONE-gather payload fetch at display res.
    payload = jnp.concatenate([cur, lo, hi, best_mv], axis=-1)  # (h,w,11)
    packed = quad_pack2d(payload)                               # (h,w,44)
    h, w = color_lr.shape[:2]
    u = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    v = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    uu, vv = jnp.meshgrid(u, v)
    # The jittered camera shifts every image point by +jitter_uv (clip
    # translation 2*o/size -> uv offset o/size), so the scene at display
    # uv lives at uv + jitter_uv in the render-res frame.
    us = uu + jitter_uv[0]
    vs = vv + jitter_uv[1]
    x = us * w - 0.5
    y = vs * h - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    fx = jnp.clip(x - x0.astype(x.dtype), 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0.astype(y.dtype), 0.0, 1.0)[..., None]
    quad = packed[y0, x0].reshape(y0.shape + (4, 11))
    samp = ((quad[..., 0, :] * (1 - fx) + quad[..., 1, :] * fx) * (1 - fy)
            + (quad[..., 2, :] * (1 - fx) + quad[..., 3, :] * fx) * fy)
    cur_hr = samp[..., 0:3]
    lo_hr = samp[..., 3:6]
    hi_hr = samp[..., 6:9]
    mv_hr = samp[..., 9:11]

    # Sample-alignment confidence: display pixels landing ON a jittered
    # render sample trust the new data; pixels between samples lean on
    # history (this is what recovers resolution across the phase cycle).
    d2 = (jnp.minimum(fx, 1 - fx) ** 2
          + jnp.minimum(fy, 1 - fy) ** 2)[..., 0]
    conf = jnp.exp(-32.0 * d2)

    # History reprojection (second gather) + AABB rectification.
    from .hdr import _sample_bilinear_uv
    old_u = uu - mv_hr[..., 0]
    old_v = vv - mv_hr[..., 1]
    hist4 = _sample_bilinear_uv(history_hr, old_u, old_v)
    history = jnp.clip(hist4[..., :3], jnp.array([0.0, -1.0, -1.0]),
                       jnp.array([1.0]))
    hist_w = jnp.maximum(hist4[..., 3], 0.0)
    mv_len = jnp.sqrt((mv_hr * mv_hr).sum(-1) + 1e-20)
    mv_fast = jnp.minimum(mv_len * 50.0, 1.0)
    # Detail lock (FSR2's luma stability locks): display pixels NOT
    # covered by this frame's jittered samples keep their accumulated
    # sub-render-res detail instead of being squashed to the aliased
    # neighborhood; motion releases the lock (anti-ghosting wins).
    rect = _clamp_box_aabb(history, lo_hr, hi_hr)
    keep = ((1.0 - conf) * (1.0 - mv_fast))[..., None]
    history = rect + (history - rect) * keep
    on_screen = ((old_u >= 0) & (old_u <= 1) & (old_v >= 0) & (old_v <= 1))
    history = jnp.where(on_screen[..., None], history, cur_hr)
    hist_w = jnp.where(on_screen, hist_w, 0.0)

    # Alignment-weighted accumulation: this frame's sample weight is
    # sharply peaked around exact alignment so the rare aligned sample
    # dominates the running average (a fixed lerp can never recover
    # sub-render-res detail — misaligned frames outvote aligned ones
    # ~N:1 over a jitter cycle); motion and clamping shorten memory.
    w_cur = jnp.exp(-128.0 * d2) + 1e-3
    decay = 0.97 * (1.0 - 0.6 * mv_fast)
    w_prev = hist_w * decay
    alpha = (w_cur / (w_prev + w_cur))[..., None]
    acc = history + (cur_hr - history) * alpha
    new_w = jnp.minimum(w_prev + w_cur, 16.0)
    out = taa_to_hdr(acc)
    return (rcas_sharpen(out, sharpness),
            jnp.concatenate([acc, new_w[..., None]], axis=-1))
