"""sRGB transfer functions.

Bit-careful parity with the Vulkan reference's automatic sRGB conversion
(VK_FORMAT_*_SRGB attachments) matters for the RMSE gate: we use the exact
IEC 61966-2-1 piecewise curve, not the gamma-2.2 approximation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    lo = x * 12.92
    hi = 1.055 * jnp.power(jnp.maximum(x, 1e-7), 1.0 / 2.4) - 0.055
    return jnp.where(x <= 0.0031308, lo, hi)


def srgb_to_linear(x):
    x = jnp.clip(x, 0.0, 1.0)
    lo = x / 12.92
    hi = jnp.power((x + 0.055) / 1.055, 2.4)
    return jnp.where(x <= 0.04045, lo, hi)


def srgb_u8_to_linear_np(arr: np.ndarray) -> np.ndarray:
    """uint8 sRGB (H,W,4) -> float32 linear, alpha kept linear.

    Done on host with a 256-entry LUT — texture upload path
    (decode at asset-instantiate time, vulkan/texture/texture_files.cpp).
    """
    u = np.arange(256, dtype=np.float32) / 255.0
    lut = np.where(u <= 0.04045, u / 12.92,
                   ((u + 0.055) / 1.055) ** 2.4).astype(np.float32)
    out = lut[arr]
    out[..., 3] = arr[..., 3].astype(np.float32) / 255.0
    return out


def encode_rgba8(linear_rgb, alpha=None):
    """Linear float RGB (H,W,3) -> sRGB-encoded uint8 RGBA (H,W,4).

    The final swapchain-blit analogue (WSI backbuffer is *_SRGB)."""
    srgb = linear_to_srgb(linear_rgb)
    u8 = jnp.round(srgb * 255.0).astype(jnp.uint8)
    if alpha is None:
        a = jnp.full(u8.shape[:-1] + (1,), 255, dtype=jnp.uint8)
    else:
        a = jnp.round(jnp.clip(alpha, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        a = a[..., None] if a.ndim == u8.ndim - 1 else a
    return jnp.concatenate([u8, a], axis=-1)
