"""Screen-space ambient occlusion (reference: renderer/post/ssao.cpp —
FFX-CACAO integration; the `ssao` config knob,
scene_viewer_application.cpp:190).

TPU-native design ("CACAO-lite"): gathers cost ~22ms per 2M indices on
the v5e, so the usual per-pixel rotated sample disk is replaced by
FIXED-OFFSET taps — pure VPU shifts, zero gathers — evaluated at HALF
resolution like CACAO's downsampled prepare passes, then blurred and
bilinearly upsampled.  Quality trades per-pixel noise for slight
banding, which the blur + TAA absorb.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _shift(img, dy: int, dx: int):
    h, w = img.shape[:2]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad = ((py1, py0), (px1, px0)) + ((0, 0),) * (img.ndim - 2)
    out = jnp.pad(img, pad, mode="edge")
    return out[py0:py0 + h, px0:px0 + w]


# 16-tap spiral (two rings of 8), in half-res pixel units.
_TAPS = []
for ring, radius in ((0, 2), (1, 5)):
    for k in range(8):
        a = 2.0 * np.pi * (k + 0.5 * ring) / 8.0
        _TAPS.append((int(round(radius * np.sin(a))),
                      int(round(radius * np.cos(a)))))


def linearize_reverse_z(depth, z_near: float):
    """Reverse-Z infinite-far NDC depth -> positive view-space Z.

    muglm reverse-Z: z_ndc = z_near / view_z  =>  view_z = z_near/z_ndc.
    Background (z_ndc = 0) maps to a huge depth."""
    return z_near / jnp.maximum(depth, 1e-8)


def ssao(depth, z_near: float, radius_world: float = 0.5,
         intensity: float = 1.0, proj_scale: float = 1.0):
    """(H, W) reverse-Z depth -> (H/2, W/2) AO factor in [0, 1].

    proj_scale: pixels per world unit at view_z = 1 (half-res), i.e.
    0.5 * height * proj[1][1] / 2.  Horizon-style estimator: each tap
    occludes by how far the neighbor rises above the center plane,
    range-checked so distant silhouettes do not darken.
    """
    # Half-res depth: nearest sample (every other texel).
    d = depth[::2, ::2]
    vz = linearize_reverse_z(d, z_near)

    occl = 0.0
    total = 0.0
    for dy, dx in _TAPS:
        nvz = _shift(vz[..., None], dy, dx)[..., 0]
        # Height of the neighbor above the center, normalized by the
        # world-space radius at this depth.
        dist_px = float(np.hypot(dx, dy))
        # world-space lateral distance of the tap at the center's depth
        lateral = dist_px * vz / jnp.maximum(proj_scale, 1e-6)
        dz = vz - nvz                      # >0: neighbor is closer
        tan_h = dz / jnp.maximum(lateral, 1e-6)
        a = jnp.clip(tan_h, 0.0, 1.0)
        # Range check (CACAO falloff): taps whose depth gap exceeds the
        # AO radius contribute nothing.
        rc = jnp.clip(1.0 - jnp.abs(dz) / radius_world, 0.0, 1.0)
        w = 1.0 / (1.0 + 0.25 * dist_px)
        occl = occl + w * a * rc
        total = total + w
    ao = 1.0 - intensity * occl / total
    ao = jnp.clip(ao, 0.0, 1.0)
    # Edge-aware-ish 3x3 blur (plain spatial: the bilateral term matters
    # little at half-res radii this small).
    acc = ao
    cnt = 1.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc = acc + _shift(ao[..., None], dy, dx)[..., 0]
            cnt += 1.0
    return acc / cnt


def upsample_ao(ao_half, height: int, width: int):
    """Bilinear half->full upsample (no gathers: fixed-phase resize)."""
    from .hdr import resize_bilinear
    return resize_bilinear(ao_half[..., None], height, width)[..., 0]
