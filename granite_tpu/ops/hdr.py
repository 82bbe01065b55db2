"""HDR post-processing chain (reference: renderer/post/hdr.cpp:308
setup_hdr_postprocess + assets/shaders/post/{bloom_threshold,
bloom_downsample,bloom_upsample,luminance,tonemap}).

Pipeline (all constants match the reference exactly):
  threshold (1/2 res): lum = max(r,g,b)+1e-4; emits
      rgb = max(color/lum * (lum - 8*avg_lum), 0), a = log2(lum)
  luminance: mean of the threshold pass's log2-luminance plane, clamped to
      [-3, 2], temporally smoothed new = lerp(old, avg, 1-0.5^dt)
      (hdr.cpp:56-63).  The average is ONE jnp.mean — the reference's
      whole workgroup-reduction compute shader (luminance.comp) collapses
      into a single XLA reduce, and runs as an independent dispatch
      (the async-compute analogue).
  bloom pyramid: 9-tap downsamples at offsets +-1.75 texels (weights
      0.25/0.125/0.0625), first level with temporal FEEDBACK
      lerp = 1-0.001^dt; 2 upsamples at +-0.875 texels.
  tonemap: Uncharted2 filmic with white point 11.2, exposure
      avg_inv_linear_luminance * dynamic_exposure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LUM_MIN_LOG = -3.0
LUM_MAX_LOG = 2.0


def _sample_bilinear_uv(img, u, v):
    """Bilinear sample of (H, W, C) at normalized UV (clamp-to-edge).

    Quad-packs the image with VPU shifts (ops/texture.quad_pack2d) and
    fetches the whole footprint in ONE single-index gather; clamped
    start + clipped frac reproduces clamp-to-edge exactly (outside
    coords give frac 0 or 1, collapsing onto the border texel).
    """
    from .texture import quad_pack2d
    h, w = img.shape[:2]
    C = img.shape[2]
    packed = quad_pack2d(img)                       # (H, W, 4C)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    fx = jnp.clip(x - x0.astype(x.dtype), 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0.astype(y.dtype), 0.0, 1.0)[..., None]
    quad = packed[y0, x0].reshape(y0.shape + (4, C))
    return ((quad[..., 0, :] * (1 - fx) + quad[..., 1, :] * fx)
            * (1 - fy)
            + (quad[..., 2, :] * (1 - fx) + quad[..., 3, :] * fx) * fy)


def _upsample_axis_int(img, f: int, axis: int):
    """Exact integer-factor bilinear upsample along one axis WITHOUT
    gathers: per output phase r, x_tex = i + (r+0.5)/f - 0.5 blends two
    fixed-shift copies — pure VPU shifts + interleave (TPU gathers cost
    ~3ns/row; fixed-phase filters must never gather)."""
    img = jnp.moveaxis(img, axis, 0)
    n = img.shape[0]
    phases = []
    for r in range(f):
        phi = (r + 0.5) / f - 0.5
        k = -1 if phi < 0 else 0
        t = phi - k
        a = jnp.concatenate([img[:1]] * max(-k, 0) + [img[:n - max(-k, 0)]]) \
            if k < 0 else img
        b_shift = k + 1
        b = jnp.concatenate([img[b_shift:], img[-1:]]) if b_shift == 1 \
            else img
        phases.append(a * (1 - t) + b * t)
    out = jnp.stack(phases, axis=1).reshape((n * f,) + img.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def _downsample2_axis(img, kernel, axis: int):
    """Stride-2 separable filter along one axis via shifts (edge clamp).
    kernel taps cover input texels [2o-2 .. 2o+3] for output o."""
    img = jnp.moveaxis(img, axis, 0)
    n = img.shape[0]
    pad = jnp.concatenate([img[:1], img[:1], img, img[-1:], img[-1:]])
    acc = 0.0
    for j, w in enumerate(kernel):       # tap j at padded index 2o + j
        acc = acc + w * pad[j:j + n:2]
    return jnp.moveaxis(acc, 0, axis)


def _upsample2_axis(img, axis: int):
    """The bloom 2x upsample (+-0.875 taps, weights .25/.5/.25) as two
    fixed 4-tap phase kernels + interleave (derived analytically from the
    bilinear taps; bit-matches the gather form to fp rounding)."""
    k_even = (0.03125, 0.34375, 0.46875, 0.15625)   # texels o-2..o+1
    k_odd = (0.15625, 0.46875, 0.34375, 0.03125)    # texels o-1..o+2
    img = jnp.moveaxis(img, axis, 0)
    n = img.shape[0]
    pad = jnp.concatenate([img[:1], img[:1], img, img[-1:], img[-1:]])
    even = sum(w * pad[j:j + n] for j, w in enumerate(k_even))
    odd = sum(w * pad[j + 1:j + 1 + n] for j, w in enumerate(k_odd))
    out = jnp.stack([even, odd], axis=1).reshape((2 * n,) + img.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def resize_bilinear(img, out_h: int, out_w: int):
    h, w = img.shape[:2]
    if out_h == h and out_w == w:
        return img
    # Gather-free fast paths for exact integer ratios (all the ratios the
    # HDR chain uses): 2:1 box reduction and f:1 phase-interleaved
    # upsampling.
    if h == 2 * out_h and w == 2 * out_w:
        return img.reshape(out_h, 2, out_w, 2, -1).mean(axis=(1, 3)) \
            .reshape(out_h, out_w, img.shape[-1])
    if out_h % h == 0 and out_w % w == 0 and out_h // h == out_w // w:
        return _upsample_axis_int(
            _upsample_axis_int(img, out_h // h, 0), out_w // w, 1)
    u = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    v = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    uu, vv = jnp.meshgrid(u, v)
    return _sample_bilinear_uv(img, uu, vv)


def bloom_threshold(hdr, avg_linear_lum, out_h: int, out_w: int,
                    dynamic_exposure: bool = True):
    """bloom_threshold.frag at half resolution.  Returns (h, w, 4):
    rgb = thresholded color, a = log2 luminance (feeds the luminance
    reduction — same packing trick as the reference)."""
    half = resize_bilinear(hdr, out_h, out_w)
    lum = jnp.max(half, axis=-1) + 1e-4
    loglum = jnp.log2(lum)
    color = half / lum[..., None]
    thresh = lum - (8.0 * avg_linear_lum if dynamic_exposure else 8.0)
    rgb = jnp.maximum(color * thresh[..., None], 0.0)
    return jnp.concatenate([rgb, loglum[..., None]], axis=-1)


def average_log_luminance(threshold_out, old_log_lum, frame_time):
    """luminance.comp: mean of the loglum plane, clamped, smoothed."""
    avg = jnp.clip(threshold_out[..., 3].mean(), LUM_MIN_LOG, LUM_MAX_LOG)
    lerp = 1.0 - jnp.power(0.5, frame_time)
    new_log = old_log_lum + (avg - old_log_lum) * lerp
    return new_log            # linear = exp2(new_log)


_DOWN_TAPS = [(0.25, 0.0, 0.0),
              (0.0625, -1.75, 1.75), (0.125, 0.0, 1.75),
              (0.0625, 1.75, 1.75), (0.125, -1.75, 0.0),
              (0.125, 1.75, 0.0), (0.0625, -1.75, -1.75),
              (0.125, 0.0, -1.75), (0.0625, 1.75, -1.75)]

_UP_TAPS = [(0.25, 0.0, 0.0),
            (0.0625, -0.875, 0.875), (0.125, 0.0, 0.875),
            (0.0625, 0.875, 0.875), (0.125, -0.875, 0.0),
            (0.125, 0.875, 0.0), (0.0625, -0.875, -0.875),
            (0.125, 0.0, -0.875), (0.0625, 0.875, -0.875)]


def _taps(img, out_h: int, out_w: int, taps):
    in_h, in_w = img.shape[:2]
    u = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    v = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    uu, vv = jnp.meshgrid(u, v)
    acc = 0.0
    for wgt, dx, dy in taps:
        acc = acc + wgt * _sample_bilinear_uv(
            img, uu + dx / in_w, vv + dy / in_h)
    return acc


# The 9 bilinear taps at +-1.75 texels with separable weights
# [.25, .5, .25] reduce, at an exact 2:1 ratio, to this separable 6-tap
# stride-2 kernel over input texels [2o-2 .. 2o+3] (derived analytically;
# identical math, zero gathers).
_DOWN2_KERNEL = (0.0625, 0.1875, 0.25, 0.25, 0.1875, 0.0625)


def bloom_downsample(img, out_h: int, out_w: int, history=None,
                     frame_time=None):
    """bloom_downsample.frag (9 taps, +-1.75 texels); FEEDBACK variant
    lerps with last frame's output (hdr.cpp:182 lerp = 1-0.001^dt)."""
    in_h, in_w = img.shape[:2]
    if in_h == 2 * out_h and in_w == 2 * out_w:
        out = _downsample2_axis(
            _downsample2_axis(img, _DOWN2_KERNEL, 0), _DOWN2_KERNEL, 1)
    else:
        out = _taps(img, out_h, out_w, _DOWN_TAPS)
    if history is not None:
        lerp = 1.0 - jnp.power(0.001, frame_time)
        out = history + (out - history) * lerp
    return out


def bloom_upsample(img, out_h: int, out_w: int):
    in_h, in_w = img.shape[:2]
    if out_h == 2 * in_h and out_w == 2 * in_w:
        return _upsample2_axis(_upsample2_axis(img, 0), 1)
    return _taps(img, out_h, out_w, _UP_TAPS)


# Uncharted2 filmic constants (tonemap.frag:24-31).
_A, _B, _C, _D, _E, _F, _W = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30, 11.2


def _uncharted2(x):
    return ((x * (_A * x + _C * _B) + _D * _E)
            / (x * (_A * x + _B) + _D * _F)) - _E / _F


def tonemap_filmic(color):
    white_scale = 1.0 / _uncharted2(_W)
    return _uncharted2(color) * white_scale


def tonemap(hdr, bloom, avg_log_lum=None, dynamic_exposure_scale=1.0):
    """tonemap.frag: hdr + bloom (bilinearly upsampled), exposure scale,
    filmic curve."""
    h, w = hdr.shape[:2]
    if bloom is not None:
        if bloom.shape[:2] != (h, w):
            bloom = resize_bilinear(bloom, h, w)
        hdr = hdr + bloom[..., :3]
    if avg_log_lum is not None:
        exposure = jnp.exp2(-avg_log_lum) * dynamic_exposure_scale
    else:
        exposure = dynamic_exposure_scale
    return tonemap_filmic(hdr * exposure)


def sharpen(img, amount: float = 0.25):
    """Post-upscale sharpen (the reference's upscaling sharpen path,
    scene_viewer_application.cpp:1264): unsharp mask over the 4-neighbor
    laplacian, shift-based (zero gathers)."""
    lap = 4.0 * img
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        lap = lap - _shift_edge(img, dy, dx)
    return jnp.clip(img + amount * lap, 0.0, 1.0)


def _shift_edge(img, dy: int, dx: int):
    h, w = img.shape[:2]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad = ((py1, py0), (px1, px0)) + ((0, 0),) * (img.ndim - 2)
    return jnp.pad(img, pad, mode="edge")[py0:py0 + h, px0:px0 + w]
