"""Texture sampling kernels — the stock-sampler set of the reference
(vulkan/sampler.hpp:33 StockSampler: {Nearest,Linear}{Clamp,Wrap,Shadow...})
implemented as vectorized gather+filter ops.

Textures live as mip stacks: a (L, H, W, C) array where level l occupies the
top-left (H>>l, W>>l) region (the rest is padding).  This keeps shapes static
for XLA; trilinear sampling is two bilinear fetches + lerp.  The "bindless"
path of the reference (BindlessDescriptorPool, descriptor_set.hpp:90) maps to
a texture *atlas*: many images packed into one mip stack with per-material
UV scale/offset — see assets/atlas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WRAP_REPEAT = 0
WRAP_CLAMP = 1

FILTER_NEAREST = 0
FILTER_LINEAR = 1


def num_mip_levels(h: int, w: int) -> int:
    n = 1
    while h > 1 or w > 1:
        h, w = max(h // 2, 1), max(w // 2, 1)
        n += 1
    return n


def build_mips(img: jax.Array, levels: int | None = None) -> jax.Array:
    """Box-filter mip chain -> (L, H, W, C) stack (level l in top-left).

    Matches the reference's mip generation blit chain (2x2 average).
    Sizes are floored to powers of halving; non-pow2 inputs drop the odd
    row/col like Vulkan's blit-based mipgen commonly does.
    """
    h, w = img.shape[0], img.shape[1]
    L = levels or num_mip_levels(h, w)
    mips = [img]
    cur = img
    for _ in range(L - 1):
        ch, cw = cur.shape[0], cur.shape[1]
        nh, nw = max(ch // 2, 1), max(cw // 2, 1)
        c = cur[:nh * 2, :nw * 2] if ch > 1 and cw > 1 else cur
        if ch > 1 and cw > 1:
            c = c.reshape(nh, 2, nw, 2, -1).mean(axis=(1, 3))
        elif ch > 1:
            c = c[:nh * 2].reshape(nh, 2, cw, -1).mean(axis=1)
        elif cw > 1:
            c = c[:, :nw * 2].reshape(ch, nw, 2, -1).mean(axis=2)
        cur = c
        mips.append(cur)
    out = jnp.zeros((L, h, w, img.shape[-1]), img.dtype)
    for l, m in enumerate(mips):
        out = out.at[l, :m.shape[0], :m.shape[1]].set(m)
    return out


def _wrap_coord(c, size, wrap: int):
    if wrap == WRAP_REPEAT:
        return jnp.mod(c, size)
    return jnp.clip(c, 0, size - 1)


def sample_level(mips: jax.Array, u, v, level, wrap: int = WRAP_REPEAT,
                 filt: int = FILTER_LINEAR):
    """Sample one mip level bilinearly.  u,v in [0,1] texture space.

    mips: (L, H, W, C); level: int array broadcastable to u.
    Vulkan texel-center convention: texel i covers [i/S, (i+1)/S), sample
    point u maps to texel coordinate u*S - 0.5.
    """
    L, H, W, C = mips.shape
    level = jnp.clip(level, 0, L - 1)
    lh = jnp.maximum(H >> level, 1)
    lw = jnp.maximum(W >> level, 1)
    x = u * lw - 0.5
    y = v * lh - 0.5
    if filt == FILTER_NEAREST:
        xi = _wrap_coord(jnp.round(x).astype(jnp.int32), lw, wrap)
        yi = _wrap_coord(jnp.round(y).astype(jnp.int32), lh, wrap)
        return mips[level, yi, xi]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0w = _wrap_coord(x0i, lw, wrap)
    x1w = _wrap_coord(x0i + 1, lw, wrap)
    y0w = _wrap_coord(y0i, lh, wrap)
    y1w = _wrap_coord(y0i + 1, lh, wrap)
    t00 = mips[level, y0w, x0w]
    t10 = mips[level, y0w, x1w]
    t01 = mips[level, y1w, x0w]
    t11 = mips[level, y1w, x1w]
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def sample_trilinear(mips: jax.Array, u, v, lod, wrap: int = WRAP_REPEAT):
    """Trilinear: bilinear at floor(lod) and floor(lod)+1, lerped."""
    L = mips.shape[0]
    lod = jnp.clip(lod, 0.0, L - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - l0.astype(lod.dtype))[..., None]
    a = sample_level(mips, u, v, l0, wrap)
    b = sample_level(mips, u, v, jnp.minimum(l0 + 1, L - 1), wrap)
    return a * (1 - frac) + b * frac


# ---------------------------------------------------------------------------
# Mip-strip layout: all levels of a square pow2 texture packed vertically in
# a (2S, S) image — level l occupies rows [2S - (2S >> l), 2S - (2S >> l+1))
# and columns [0, S >> l).  Exactly 2x base memory (vs L x for naive stacks).
# Texture arrays are (N, 2S, S, 4) — the bindless-analogue storage.
# ---------------------------------------------------------------------------

def strip_row_offset(size: int, level):
    return 2 * size - (jnp.int32(2 * size) >> level)


def build_mip_strip(img: jax.Array) -> jax.Array:
    """(S, S, C) -> (2S, S, C) strip with box-filtered mips."""
    s = img.shape[0]
    assert img.shape[1] == s and (s & (s - 1)) == 0, "square pow2 required"
    L = num_mip_levels(s, s)
    mips = build_mips(img, L)          # (L, S, S, C), level l in top-left
    out = jnp.zeros((2 * s, s, img.shape[-1]), img.dtype)
    off = 0
    for l in range(L):
        lh = max(s >> l, 1)
        out = out.at[off:off + lh, :max(s >> l, 1)].set(
            mips[l, :lh, :max(s >> l, 1)])
        off += lh
    return out


def sample_array_level(strips: jax.Array, tex_id, u, v, level,
                       wrap: int = WRAP_REPEAT):
    """Bilinear sample from a (N, 2S, S, C) strip array at integer `level`.

    tex_id/u/v/level broadcast together (per-pixel).  Returns (..., C).
    """
    S = strips.shape[2]
    L = num_mip_levels(S, S)
    level = jnp.clip(level, 0, L - 1)
    ls = jnp.maximum(S >> level, 1)
    row0 = 2 * S - (2 * S >> level)
    x = u * ls - 0.5
    y = v * ls - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0w = _wrap_coord(x0i, ls, wrap)
    x1w = _wrap_coord(x0i + 1, ls, wrap)
    y0w = _wrap_coord(y0i, ls, wrap) + row0
    y1w = _wrap_coord(y0i + 1, ls, wrap) + row0
    t00 = strips[tex_id, y0w, x0w]
    t10 = strips[tex_id, y0w, x1w]
    t01 = strips[tex_id, y1w, x0w]
    t11 = strips[tex_id, y1w, x1w]
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return (top * (1 - fy) + bot * fy).astype(jnp.float32)


def sample_array_trilinear(strips: jax.Array, tex_id, u, v, lod,
                           wrap: int = WRAP_REPEAT):
    """Trilinear sample from a strip texture array (per-pixel tex_id/lod)."""
    S = strips.shape[2]
    L = num_mip_levels(S, S)
    lod = jnp.clip(lod, 0.0, L - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - l0.astype(lod.dtype))[..., None]
    a = sample_array_level(strips, tex_id, u, v, l0, wrap)
    b = sample_array_level(strips, tex_id, u, v, jnp.minimum(l0 + 1, L - 1),
                           wrap)
    return a * (1 - frac) + b * frac


def lod_from_derivs(dudx, dvdx, dudy, dvdy, width: int, height: int,
                    bias: float = 0.0):
    """Mip LOD from UV screen derivatives (the HW ddx/ddy rule):
    lod = log2(max(|dUV/dx|, |dUV/dy|)) in texel units of level 0."""
    sx = jnp.sqrt((dudx * width) ** 2 + (dvdx * height) ** 2)
    sy = jnp.sqrt((dudy * width) ** 2 + (dvdy * height) ** 2)
    rho = jnp.maximum(jnp.maximum(sx, sy), 1e-12)
    return jnp.log2(rho) + bias
