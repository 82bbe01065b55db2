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
from jax import lax

WRAP_REPEAT = 0
WRAP_CLAMP = 1

FILTER_NEAREST = 0
FILTER_LINEAR = 1


# ---------------------------------------------------------------------------
# TPU gather economics (measured on v5e, 2M indices):
#   * one single-index gather (arr[i] / arr[b,y,x]) costs ~22ms random /
#     ~6ms coherent, INDEPENDENT of the payload width per index;
#   * N separate gathers cost N times that;
#   * lax.gather with slice_sizes>1 ("patch gather") is ~200x SLOWER —
#     never use it in a hot path.
# Therefore every filtering footprint is fetched as ONE single-index
# gather of a pre-packed wide payload: the 2x2 bilinear taps are stored
# as extra channels ("quad packing", memory x4), built either offline
# (textures) or with cheap VPU shifts per frame (shadow maps, history).
# ---------------------------------------------------------------------------


def quad_pack2d(img: jax.Array) -> jax.Array:
    """(H, W, C) -> (H, W, 4C) with channels [t00 | t10 | t01 | t11]
    where t10 is the +x neighbor and t01 the +y neighbor, edge-clamped.

    One gather of the packed image at (y0, x0) returns the full bilinear
    footprint.  Pure shifts — no gathers — so packing a per-frame image
    costs only VPU bandwidth.
    """
    p = jnp.pad(img, ((0, 1), (0, 1)) + ((0, 0),) * (img.ndim - 2),
                mode="edge")
    return jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=-1)


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


# ---------------------------------------------------------------------------
# Gutter-strip layout + quad packing — the single-gather sampling path.
#
# Mip strip with a +1 gutter row/column per level so a bilinear footprint
# is ALWAYS a contiguous 2x2 patch (wrap/clamp behavior is baked into the
# gutter texels at build time).  The strip is then QUAD-PACKED: texel
# (y, x) stores [self | +x | +y | +x+y] as 4C channels, so ONE
# single-index gather returns the whole bilinear footprint (see gather
# economics above).  Memory is 4x the plain strip = 8x the base image.
#
# Level l of a base-size-S strip: ls = S>>l texels, rows
# [off, off+ls) with off = 2S - (2S>>l) + l, cols [0, ls); gutter row at
# off+ls, gutter col at ls.  Strip HS = 2S + L - 1, WS = S + 1; the
# packed array is (HS-1, (WS-1) * 4C) = (HS-1, S*4C).
# ---------------------------------------------------------------------------

def gutter_strip_height(size: int) -> int:
    return 2 * size + num_mip_levels(size, size) - 1


def gutter_row_offset(size: int, level):
    return 2 * size - (jnp.int32(2 * size) >> level) + level


def build_gutter_strip_np(img, wrap: int = WRAP_REPEAT,
                          dtype="float32"):
    """(S, S, C) float -> (HS, S+1, C) gutter strip (numpy, load-time)."""
    import numpy as np
    s, s2, C = img.shape
    assert s == s2 and (s & (s - 1)) == 0, "square pow2 required"
    L = num_mip_levels(s, s)
    HS, WS = gutter_strip_height(s), s + 1
    out = np.zeros((HS, WS, C), np.float32)
    cur = np.asarray(img, np.float32)
    off = 0
    for l in range(L):
        ls = max(s >> l, 1)
        ext = np.zeros((ls + 1, ls + 1, C), np.float32)
        ext[:ls, :ls] = cur
        if wrap == WRAP_REPEAT:
            ext[:ls, ls] = cur[:, 0]
            ext[ls, :ls] = cur[0, :]
            ext[ls, ls] = cur[0, 0]
        else:
            ext[:ls, ls] = cur[:, -1]
            ext[ls, :ls] = cur[-1, :]
            ext[ls, ls] = cur[-1, -1]
        out[off:off + ls + 1, :ls + 1] = ext
        off += ls + 1
        if ls > 1:
            cur = cur[:ls // 2 * 2, :ls // 2 * 2] \
                .reshape(ls // 2, 2, ls // 2, 2, C).mean(axis=(1, 3))
    return out.astype(dtype)


def build_packed_strip_np(img, wrap: int = WRAP_REPEAT, dtype="float16"):
    """(S, S, C) float -> (HS-1, S, 4C) quad-packed gutter strip.

    One single-index gather of texel (y, x) fetches the whole 2x2
    bilinear footprint: channels are [t00 | t10 | t01 | t11].  The
    gutter makes the +1 taps correct at every level border for the
    given wrap mode.
    """
    import numpy as np
    strip = build_gutter_strip_np(img, wrap, dtype="float32")
    packed = np.concatenate(
        [strip[:-1, :-1], strip[:-1, 1:], strip[1:, :-1], strip[1:, 1:]],
        axis=-1)                                   # (HS-1, S, 4C)
    return packed.astype(dtype)


def _box_mip_levels_np(img):
    import numpy as np
    s = img.shape[0]
    L = num_mip_levels(s, s)
    cur = np.asarray(img, np.float32)
    levels = [cur]
    for l in range(1, L):
        ls = cur.shape[0]
        if ls > 1:
            n2 = ls // 2
            cur = cur[:n2 * 2, :n2 * 2].reshape(
                n2, 2, n2, 2, -1).mean(axis=(1, 3))
        levels.append(cur)
    return levels


def _gutter_from_levels_np(levels, wrap: int):
    import numpy as np
    s = levels[0].shape[0]
    C = levels[0].shape[-1]
    L = num_mip_levels(s, s)
    HS, WS = gutter_strip_height(s), s + 1
    out = np.zeros((HS, WS, C), np.float32)
    off = 0
    for l in range(L):
        ls = max(s >> l, 1)
        cur = np.asarray(levels[l], np.float32)
        ext = np.zeros((ls + 1, ls + 1, C), np.float32)
        ext[:ls, :ls] = cur
        if wrap == WRAP_REPEAT:
            ext[:ls, ls] = cur[:, 0]
            ext[ls, :ls] = cur[0, :]
            ext[ls, ls] = cur[0, 0]
        else:
            ext[:ls, ls] = cur[:, -1]
            ext[ls, :ls] = cur[-1, :]
            ext[ls, ls] = cur[-1, -1]
        out[off:off + ls + 1, :ls + 1] = ext
        off += ls + 1
    return out


def _upsample2_centers_np(img, wrap: int):
    """Bilinear 2x upsample evaluated at the FINE texel centers
    (phase +-0.25) — the baked coarse tap of the LOD strip."""
    import numpy as np
    n = img.shape[0]
    out_n = n * 2
    pos = (np.arange(out_n) + 0.5) / 2.0 - 0.5
    i0 = np.floor(pos).astype(int)
    f = pos - i0
    if wrap == WRAP_REPEAT:
        a0 = i0 % n
        a1 = (i0 + 1) % n
    else:
        a0 = np.clip(i0, 0, n - 1)
        a1 = np.clip(i0 + 1, 0, n - 1)
    fy = f[:, None, None]
    rows = img[a0] * (1 - fy) + img[a1] * fy
    fx = f[None, :, None]
    return rows[:, a0] * (1 - fx) + rows[:, a1] * fx


def build_packed_lod_strip_np(img, wrap: int = WRAP_REPEAT,
                              dtype="float16"):
    """(S, S, C) -> (HS-1, S, 5C) LOD strip: per texel
    [t00 t10 t01 t11 | parent] where `parent` is the NEXT level
    bilinearly pre-filtered at this texel's center.

    ONE single-index gather then yields approximate trilinear:
    lerp(bilinear(level), parent, lod_frac) — the coarse tap is frozen
    to the fine texel grid (<=0.5 coarse-texel offset, invisible in the
    2x-blurrier level) in exchange for HALVING the gather count, the
    dominant cost at 1080p (measured ~16 ms/gather floor, ops header).
    """
    import numpy as np
    levels = _box_mip_levels_np(img)
    parents = [(_upsample2_centers_np(levels[l + 1], wrap)
                if l + 1 < len(levels) else levels[l])
               for l in range(len(levels))]
    gf = _gutter_from_levels_np(levels, wrap)
    gp = _gutter_from_levels_np(parents, wrap)
    packed = np.concatenate(
        [gf[:-1, :-1], gf[:-1, 1:], gf[1:, :-1], gf[1:, 1:],
         gp[:-1, :-1]], axis=-1)
    return packed.astype(dtype)


def sample_packed_lod(packed: jax.Array, tex_id, u, v, lod,
                      channels: int, wrap: int = WRAP_REPEAT):
    """Approximate trilinear from a (N, HS-1, S, 5C) LOD strip — ONE
    gather (see build_packed_lod_strip_np)."""
    S = packed.shape[2]
    L = num_mip_levels(S, S)
    lod = jnp.clip(lod, 0.0, L - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - l0.astype(lod.dtype))[..., None]
    yy, xx, fx, fy = _gutter_level_coords(S, u, v, l0, wrap)
    row = packed[tex_id, yy, xx].astype(jnp.float32)     # (..., 5C)
    quad = row[..., :4 * channels].reshape(
        row.shape[:-1] + (4, channels))
    fx = fx[..., None]
    fy = fy[..., None]
    top = quad[..., 0, :] * (1 - fx) + quad[..., 1, :] * fx
    bot = quad[..., 2, :] * (1 - fx) + quad[..., 3, :] * fx
    fine = top * (1 - fy) + bot * fy
    parent = row[..., 4 * channels:]
    return fine * (1 - frac) + parent * frac


def build_packed_strip_from_levels_np(levels, wrap: int = WRAP_REPEAT,
                                      dtype="float16"):
    """Quad-packed gutter strip from EXPLICIT per-level images
    (each (S>>l, S>>l, C)) instead of box-filtered mips — used by the
    offline IBL convolver whose levels are GGX-prefiltered
    (tools/convert_equirect_to_environment.cpp analogue)."""
    import numpy as np
    s = levels[0].shape[0]
    C = levels[0].shape[-1]
    L = num_mip_levels(s, s)
    HS, WS = gutter_strip_height(s), s + 1
    out = np.zeros((HS, WS, C), np.float32)
    off = 0
    cur = np.asarray(levels[0], np.float32)
    for l in range(L):
        ls = max(s >> l, 1)
        if l < len(levels):
            cur = np.asarray(levels[l], np.float32)
            assert cur.shape[0] == ls, (l, cur.shape, ls)
        elif ls > 1 or cur.shape[0] > 1:
            n2 = max(cur.shape[0] // 2, 1)
            if cur.shape[0] > 1:
                cur = cur[:n2 * 2, :n2 * 2].reshape(
                    n2, 2, n2, 2, C).mean(axis=(1, 3))
        ext = np.zeros((ls + 1, ls + 1, C), np.float32)
        ext[:ls, :ls] = cur
        if wrap == WRAP_REPEAT:
            ext[:ls, ls] = cur[:, 0]
            ext[ls, :ls] = cur[0, :]
            ext[ls, ls] = cur[0, 0]
        else:
            ext[:ls, ls] = cur[:, -1]
            ext[ls, :ls] = cur[-1, :]
            ext[ls, ls] = cur[-1, -1]
        out[off:off + ls + 1, :ls + 1] = ext
        off += ls + 1
    packed = np.concatenate(
        [out[:-1, :-1], out[:-1, 1:], out[1:, :-1], out[1:, 1:]],
        axis=-1)
    return packed.astype(dtype)


def _gutter_level_coords(S: int, u, v, level, wrap: int):
    """Start texel + bilinear fracs for one level of a gutter strip."""
    L = num_mip_levels(S, S)
    level = jnp.clip(level, 0, L - 1)
    ls = jnp.maximum(S >> level, 1)
    row0 = gutter_row_offset(S, level)
    x = u * ls - 0.5
    y = v * ls - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    if wrap == WRAP_REPEAT:
        x0 = jnp.mod(x0f.astype(jnp.int32), ls)
        y0 = jnp.mod(y0f.astype(jnp.int32), ls)
        fx = x - x0f
        fy = y - y0f
    else:
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, jnp.maximum(ls - 2, 0))
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, jnp.maximum(ls - 2, 0))
        fx = jnp.clip(x - x0.astype(x.dtype), 0.0, 1.0)
        fy = jnp.clip(y - y0.astype(y.dtype), 0.0, 1.0)
    return row0 + y0, x0, fx, fy


def sample_packed_level(packed: jax.Array, tex_id, u, v, level,
                        channels: int, wrap: int = WRAP_REPEAT):
    """Bilinear from a (N, HS-1, S, 4C) quad-packed strip — ONE gather.

    Returns (..., C) float32.
    """
    S = packed.shape[2]
    yy, xx, fx, fy = _gutter_level_coords(S, u, v, level, wrap)
    # Tolerate extra trailing channels (e.g. the 5C LOD strips carry a
    # parent tap after the quad block).
    quad = packed[tex_id, yy, xx].astype(jnp.float32)
    quad = quad[..., :4 * channels].reshape(
        quad.shape[:-1] + (4, channels))
    fx = fx[..., None]
    fy = fy[..., None]
    top = quad[..., 0, :] * (1 - fx) + quad[..., 1, :] * fx
    bot = quad[..., 2, :] * (1 - fx) + quad[..., 3, :] * fx
    return top * (1 - fy) + bot * fy


def sample_packed_trilinear(packed: jax.Array, tex_id, u, v, lod,
                            channels: int, wrap: int = WRAP_REPEAT):
    """Trilinear from a quad-packed strip array — TWO gathers total."""
    S = packed.shape[2]
    L = num_mip_levels(S, S)
    lod = jnp.clip(lod, 0.0, L - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - l0.astype(lod.dtype))[..., None]
    a = sample_packed_level(packed, tex_id, u, v, l0, channels, wrap)
    b = sample_packed_level(packed, tex_id, u, v,
                            jnp.minimum(l0 + 1, L - 1), channels, wrap)
    return a * (1 - frac) + b * frac


def lod_from_derivs(dudx, dvdx, dudy, dvdy, width: int, height: int,
                    bias: float = 0.0):
    """Mip LOD from UV screen derivatives (the HW ddx/ddy rule):
    lod = log2(max(|dUV/dx|, |dUV/dy|)) in texel units of level 0."""
    sx = jnp.sqrt((dudx * width) ** 2 + (dvdx * height) ** 2)
    sy = jnp.sqrt((dudy * width) ** 2 + (dvdy * height) ** 2)
    rho = jnp.maximum(jnp.maximum(sx, sy), 1e-12)
    return jnp.log2(rho) + bias


def build_packed_lod_strip_from_levels_np(levels, wrap: int = WRAP_REPEAT,
                                          dtype="float32"):
    """Explicit per-level images -> (HS-1, S, 5C) quad+parent LOD strip.

    Like build_packed_lod_strip_np but over a caller-provided (e.g.
    GGX-prefiltered) chain: one single-index gather then yields the
    approximate trilinear of sample_packed_lod.  Levels beyond the
    provided list are box-filtered continuations."""
    import numpy as np
    s = levels[0].shape[0]
    C = levels[0].shape[-1]
    L = num_mip_levels(s, s)
    full = [np.asarray(lv, np.float32) for lv in levels]
    cur = full[-1]
    while len(full) < L:
        n2 = max(cur.shape[0] // 2, 1)
        if cur.shape[0] > 1:
            cur = cur[:n2 * 2, :n2 * 2].reshape(
                n2, 2, n2, 2, C).mean(axis=(1, 3))
        full.append(cur)
    parents = [(_upsample2_centers_np(full[l + 1], wrap)
                if l + 1 < L else full[l]) for l in range(L)]
    gf = _gutter_from_levels_np(full, wrap)
    gp = _gutter_from_levels_np(parents, wrap)
    packed = np.concatenate(
        [gf[:-1, :-1], gf[:-1, 1:], gf[1:, :-1], gf[1:, 1:],
         gp[:-1, :-1]], axis=-1)
    return packed.astype(dtype)
