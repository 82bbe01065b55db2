"""Tile-rect texture sampler — per-pixel texture fetch at MXU speed.

The XLA gather floor on the v5e is ~4 ns/index even for VMEM-resident
tables (measured round 2; 2M-pixel fetch = 8 ms minimum, 16-31 ms for
real mip strips), which caps the whole frame at gather-count x ~20 ms.
This module replaces the per-pixel HBM gather of the material system
(ops/texture.sample_packed_lod) with the engine's one-hot-matmul VMEM
fetch (the trick proven in ops/raster_fused.py):

  1. an XLA *prepass* (`plan_rects`) computes, per 32x128 screen tile,
     up to K=2 (bundle, mip level, texel-rect origin) descriptors
     covering the tile's texture footprint — the TPU analogue of a
     texture-space tile cache;
  2. a Pallas kernel DMAs each tile's rect(s) from a *lane-tiled* mip
     strip in HBM into VMEM (plus one always-resident coarse block for
     overflow pixels), and fetches every pixel's quad+parent packed
     texel row with chunk-skipped one-hot matmuls — filtering runs on
     the MXU instead of 2M serialized DMA descriptors;
  3. trilinear reconstruction (bilinear quad + pre-filtered parent tap,
     exactly ops/texture.sample_packed_lod semantics) happens in-kernel
     on VMEM-resident data.

Reference analogue: the texel-fetch half of Vulkan's sampler hardware
(vulkan/sampler.hpp:33 stock samplers) driving static_mesh.frag's
material fetches; the rect planning plays the role of the texture
unit's tile cache.

Quality contract: pixels whose floor(lod) equals the slot level get
bit-identical trilinear results (modulo bf16 texel storage); a tile
whose footprint cannot fit the rect window at floor(min_lod) is sampled
one or more levels coarser (slight extra blur); pixels beyond the K
per-tile bundles fall back to an always-resident 32^2 coarse block.
Known divergence: the rect level is floor(min_lod) over the whole tile
and the parent tap reaches one level up only, so pixels whose lod
exceeds level+1 (steep lod gradients inside one 32x128 tile) are
sampled SHARPER than requested and can alias — the opposite of the
extra-blur case.  In practice the raster's per-quad lod is smooth
within a tile; scenes with violent lod gradients should prefer the
classic gather path (materialTileSampler=false).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .texture import WRAP_REPEAT, num_mip_levels

# Pixel tile (matches ops/raster_fused TILE_H/TILE_W).
PX_H = 32
PX_W = 128
BAND_H = 8                     # chunk-skip granularity: 8-row pixel bands
N_BANDS = PX_H // BAND_H

# Rect window: 48 texel rows; every level's FULL x extent lives in the
# lane dim (XW = max(S, 128) <= 512 lanes), so only the v axis needs a
# windowed origin — and it sits in a non-tiled dim, so no alignment.
R_ROWS = 48
LANE = 128
MAX_S = 512                    # larger textures use the classic path
FIT_Y = R_ROWS - 2             # usable v span in texels

COARSE_S = 32                  # coarse fallback block resolution
K_SLOTS = 2                    # full-res rects per tile

# Per-slot scalar record layout (i32):
#   [bundle, level, s_l, row0, y0, pad, pad, pad]
SLOT_WORDS = 8
# Per (band, slot{0,1,coarse}) chunk ranges: [ry_lo, ry_hi, xt_lo, xt_hi]
BAND_WORDS = 4
INFO_WORDS = K_SLOTS * SLOT_WORDS + N_BANDS * 3 * BAND_WORDS


@dataclass
class TiledStrips:
    """Lane-tiled quad+parent mip strips for the tile-rect sampler.

    strip:  (B, YR, C, XW) bf16 — level l occupies rows
            [yr_off[l], yr_off[l] + S_l + R_ROWS) (wrap rows appended so
            rect DMAs never split); texel (y, x) of level l lives at
            row yr_off[l] + y, lane x (each level's full width is
            lane-resident: XW = max(S, 128) <= 512).
    coarse: (B, COARSE_S, C, 128) bf16 — level log2(S/COARSE_S) content.
    C = 5 * GP where GP = channels padded to a multiple of 8 (Mosaic
    sublane alignment); groups [t00 | t10 | t01 | t11 | parent] per
    texel (ops/texture.build_packed_lod_strip_np packing).
    """
    strip: jax.Array
    coarse: jax.Array
    yr_off: tuple
    size: int                  # S (level-0 resolution, square pow2)
    channels: int              # payload channels before quad packing
    levels: int
    coarse_level: int
    wrap: int = WRAP_REPEAT


def _quad_parent_levels_np(img, wrap: int, levels=None):
    """Per-level (S_l, S_l, 5C) quad+parent content (numpy).

    levels: optional explicit level chain (e.g. a GGX-prefiltered
    reflection chain) instead of box mips."""
    from .texture import _box_mip_levels_np, _upsample2_centers_np
    if levels is None:
        levels = _box_mip_levels_np(img)
    out = []
    for l, cur in enumerate(levels):
        if l + 1 < len(levels):
            parent = _upsample2_centers_np(levels[l + 1], wrap)
        else:
            parent = cur
        if wrap == WRAP_REPEAT:
            xp = np.roll(cur, -1, axis=1)
            yp = np.roll(cur, -1, axis=0)
            xyp = np.roll(np.roll(cur, -1, axis=0), -1, axis=1)
        else:
            xp = np.concatenate([cur[:, 1:], cur[:, -1:]], axis=1)
            yp = np.concatenate([cur[1:], cur[-1:]], axis=0)
            xyp = np.concatenate([yp[:, 1:], yp[:, -1:]], axis=1)
        out.append(np.concatenate([cur, xp, yp, xyp, parent], axis=-1))
    return out


def strip_geometry(size: int):
    """(yr_off tuple, YR, XW) for a given level-0 size."""
    L = num_mip_levels(size, size)
    yr_off = []
    off = 0
    for l in range(L):
        yr_off.append(off)
        off += max(size >> l, 1) + R_ROWS
    XW = max(size, LANE)
    return tuple(yr_off), off, XW


def build_tiled_strips_np(images, wrap: int = WRAP_REPEAT,
                          levels_list=None):
    """images: list of B (S, S, C) float arrays -> TiledStrips (numpy
    payloads; wrap applies to both axes, like the material bundles).

    levels_list: optional per-image explicit mip chains (prefiltered
    environment reflections) replacing the box mips."""
    B = len(images)
    S = images[0].shape[0]
    C = images[0].shape[-1]
    assert S & (S - 1) == 0, "square pow2 required"
    assert S <= MAX_S, "textures > 512^2 use the classic gather path"
    L = num_mip_levels(S, S)
    yr_off, YR, XW = strip_geometry(S)
    GP = -(-C // 8) * 8          # tap-group stride (sublane alignment)
    C5 = 5 * GP
    try:
        bf16 = np.dtype("bfloat16")
    except TypeError:
        import ml_dtypes
        bf16 = np.dtype(ml_dtypes.bfloat16)
    strip = np.zeros((B, YR, C5, XW), np.float32)
    cl = max(0, L - num_mip_levels(COARSE_S, COARSE_S))
    s_c = min(COARSE_S, S)
    coarse = np.zeros((B, s_c, C5, LANE), np.float32)
    for b, img in enumerate(images):
        assert img.shape == (S, S, C)
        qp = _quad_parent_levels_np(
            img, wrap,
            levels=None if levels_list is None else levels_list[b])
        for l, lv in enumerate(qp):
            sl = lv.shape[0]
            # wrap rows appended so a 48-row DMA never needs to split
            rows = np.concatenate(
                [lv, lv[np.arange(R_ROWS) % sl]], axis=0)
            cm = rows.transpose(0, 2, 1)            # (rows, 5C, x)
            dst = strip[b, yr_off[l]:yr_off[l] + sl + R_ROWS, :, :sl]
            for g in range(5):
                dst[:, g * GP:g * GP + C] = cm[:, g * C:(g + 1) * C]
        cv = qp[cl].transpose(0, 2, 1)
        for g in range(5):
            coarse[b, :, g * GP:g * GP + C, :s_c] = \
                cv[:, g * C:(g + 1) * C]
    return TiledStrips(
        strip=jnp.asarray(strip.astype(bf16)),
        coarse=jnp.asarray(coarse.astype(bf16)),
        yr_off=yr_off, size=S, channels=C, levels=L, coarse_level=cl)


# ---------------------------------------------------------------------------
# Shared pixel->rect coordinate math (used by BOTH the XLA prepass and
# the Pallas kernel — they must agree bit-exactly).
# ---------------------------------------------------------------------------

def _texel_coords(u, v, s_l, y0, x0=0, wrap=WRAP_REPEAT):
    """Rect-local texel coords for pixels.  s_l/y0/x0 broadcastable i32.

    Returns (ry, rx, fx, fy): ry relative (circular for repeat) to the
    rect row origin y0; rx relative to the lane window origin x0 (0 for
    repeat, where the full level width is lane-resident); bilinear
    fracs match ops/texture._gutter_level_coords for each wrap mode.
    """
    s_f = s_l.astype(jnp.float32) if hasattr(s_l, "astype") \
        else jnp.float32(s_l)
    xf = u * s_f - 0.5
    yf = v * s_f - 0.5
    if wrap == WRAP_REPEAT:
        xi = jnp.floor(xf).astype(jnp.int32)
        yi = jnp.floor(yf).astype(jnp.int32)
        fx = xf - jnp.floor(xf)
        fy = yf - jnp.floor(yf)
        mask = s_l - 1
        rx = xi & mask
        yiw = yi & mask
        ry = yiw - y0
        ry = jnp.where(ry < 0, ry + s_l, ry)
    else:
        hi = jnp.maximum(s_l - 2, 0)
        xi = jnp.clip(jnp.floor(xf).astype(jnp.int32), 0, hi)
        yi = jnp.clip(jnp.floor(yf).astype(jnp.int32), 0, hi)
        fx = jnp.clip(xf - xi.astype(jnp.float32), 0.0, 1.0)
        fy = jnp.clip(yf - yi.astype(jnp.float32), 0.0, 1.0)
        rx = xi - x0
        ry = yi - y0
    return ry, rx, fx, fy


# ---------------------------------------------------------------------------
# XLA prepass: per-tile rect planning.
# ---------------------------------------------------------------------------

def _tile_view(x, ty, tx):
    return x.reshape(ty, PX_H, tx, PX_W).transpose(0, 2, 1, 3) \
        .reshape(ty * tx, PX_H, PX_W)


def _circular_bbox(m, mask):
    """Circular (origin, width) of fractional coords m (in [0,1)) over
    axes (1,2), masked.  Handles the wrap seam via the half-shift trick."""
    big = 4.0
    lo1 = jnp.where(mask, m, big).min(axis=(1, 2))
    hi1 = jnp.where(mask, m, -big).max(axis=(1, 2))
    w1 = hi1 - lo1
    m2 = m + 0.5
    m2 = m2 - jnp.floor(m2)
    lo2 = jnp.where(mask, m2, big).min(axis=(1, 2))
    hi2 = jnp.where(mask, m2, -big).max(axis=(1, 2))
    w2 = hi2 - lo2
    o = jnp.where(w1 <= w2, lo1, lo2 - 0.5)
    return o, jnp.minimum(w1, w2)


def plan_rects(u, v, lod, bundle, strips: TiledStrips,
               wrap: int = WRAP_REPEAT, mode: str = "quad_parent",
               xw_rect: int | None = None, fit_rows: int = FIT_Y):
    """Compute the per-tile scalar table for `sample_tiled`.

    u, v, lod: (H, W) f32; bundle: (H, W) i32 (-1 where uncovered).
    Returns (info (ntiles, INFO_WORDS) i32, (ph, pw, ty, tx)).
    """
    H, W = u.shape
    ty = -(-H // PX_H)
    tx = -(-W // PX_W)
    ph, pw = ty * PX_H, tx * PX_W
    if (ph, pw) != (H, W):
        pad = ((0, ph - H), (0, pw - W))
        u = jnp.pad(u, pad)
        v = jnp.pad(v, pad)
        lod = jnp.pad(lod, pad)
        bundle = jnp.pad(bundle, pad, constant_values=-1)
    nt = ty * tx
    ut = _tile_view(u, ty, tx)
    vt = _tile_view(v, ty, tx)
    lt = _tile_view(lod, ty, tx)
    bt = _tile_view(bundle, ty, tx)

    B = strips.coarse.shape[0]
    S = strips.size
    L = strips.levels
    yr_off = jnp.asarray(strips.yr_off, jnp.int32)

    counts = jnp.stack([(bt == b).sum(axis=(1, 2)) for b in range(B)],
                       axis=1)                                # (nt, B)
    slot0 = jnp.argmax(counts, axis=1).astype(jnp.int32)
    c0 = jnp.take_along_axis(counts, slot0[:, None], 1)[:, 0]
    counts1 = counts.at[jnp.arange(nt), slot0].set(-1)
    slot1 = jnp.argmax(counts1, axis=1).astype(jnp.int32)
    c1 = jnp.take_along_axis(counts1, slot1[:, None], 1)[:, 0]
    slot_bundles = [jnp.where(c0 > 0, slot0, -1),
                    jnp.where(c1 > 0, slot1, -1)]

    XW = strips.strip.shape[-1]
    xw_rect = min(XW, MAX_S) if xw_rect is None else min(xw_rect, XW)
    n_xt = xw_rect // LANE
    slot_words = []
    slot_geom = []            # (s_l arrays or None, y0, x0a, mask)
    for k in range(K_SLOTS):
        bk = slot_bundles[k]
        # bk == -1 means "no k-th bundle in this tile" — WITHOUT the
        # bk >= 0 guard the mask matches the UNCOVERED pixels (bt ==
        # -1), the slot gets live band spans, and the kernel scans its
        # never-DMA'd rect scratch with zero one-hot weights.  0 x NaN
        # = NaN: stale NaN-patterned VMEM bits poison the whole band
        # accumulator (the round-2 hardware NaN-tile incident — tiles
        # with sky pixels and a single material bundle).
        mask = (bt == bk[:, None, None]) & (bk >= 0)[:, None, None]
        minlod = jnp.where(mask, lt, jnp.inf).min(axis=(1, 2))
        minlod = jnp.where(jnp.isfinite(minlod), minlod, 0.0)
        if wrap == WRAP_REPEAT:
            mv = vt - jnp.floor(vt)
            v0, dv = _circular_bbox(mv, mask)
            u0 = du = None
        else:
            big = 4.0
            mu = jnp.clip(ut, 0.0, 1.0)
            mv = jnp.clip(vt, 0.0, 1.0)
            u0 = jnp.where(mask, mu, big).min(axis=(1, 2))
            du = jnp.where(mask, mu, -big).max(axis=(1, 2)) - u0
            v0 = jnp.where(mask, mv, big).min(axis=(1, 2))
            dv = jnp.where(mask, mv, -big).max(axis=(1, 2)) - v0
        # v is windowed to R_ROWS rows; x only when XW > xw_rect.
        # fit_rows < FIT_Y trades resolution for chunk count: the
        # kernel's cost is ~linear in rect rows scanned, so pre-
        # filterable content (VSM moments) caps lower.
        lfit = jnp.ceil(jnp.log2(
            jnp.maximum(dv * S / min(fit_rows, FIT_Y), 2.0 ** -30)))
        if XW > xw_rect:
            fit_x = xw_rect - LANE - 2
            lfx = jnp.ceil(jnp.log2(
                jnp.maximum(du * S / fit_x, 2.0 ** -30)))
            lfit = jnp.maximum(lfit, lfx)
        level = jnp.clip(jnp.maximum(jnp.floor(minlod), lfit),
                         0, L - 1).astype(jnp.int32)
        s_l = (S >> level).astype(jnp.int32)
        if wrap == WRAP_REPEAT:
            y0 = (jnp.floor(v0 * s_l - 0.5).astype(jnp.int32) - 1) \
                & (s_l - 1)
            x0a = jnp.zeros_like(y0)
        else:
            y0 = jnp.clip(
                jnp.floor(v0 * s_l - 0.5).astype(jnp.int32) - 1,
                0, jnp.maximum(s_l - R_ROWS, 0))
            xi0 = jnp.clip(
                jnp.floor(u0 * s_l - 0.5).astype(jnp.int32) - 1,
                0, jnp.maximum(s_l - 2, 0))
            x0a = jnp.clip(xi0 & ~(LANE - 1), 0,
                           jnp.maximum(s_l - xw_rect, 0))
        row0 = yr_off[level] + y0
        zero = jnp.zeros_like(bk)
        # word 5 stores the lane-TILE index (x0a / 128): the kernel
        # rebuilds x0a as xt0*128 so Mosaic can prove DMA alignment.
        slot_words += [bk, level, s_l, row0, y0, x0a >> 7, zero, zero]
        slot_geom.append((s_l, y0, x0a, mask))

    # coarse fallback slot
    s_c = min(COARSE_S, S)
    cmask = (bt >= 0) & ~(bt == slot_bundles[0][:, None, None]) \
        & ~(bt == slot_bundles[1][:, None, None])
    slot_geom.append((None, 0, 0, cmask))

    taps = mode == "bilinear_taps"
    band_words = [None] * (N_BANDS * 3)
    for si, (s_l, y0, x0a, mask) in enumerate(slot_geom):
        if si < K_SLOTS:
            s_lb = s_l[:, None, None]
            y0b = y0[:, None, None]
            x0b = x0a[:, None, None]
            max_row = R_ROWS - 1
            max_xt = n_xt - 1
        else:
            s_lb = jnp.full((nt, 1, 1), s_c, jnp.int32)
            y0b = 0
            x0b = 0
            max_row = B * s_c - 1
            max_xt = 0
        ry, rx, _, _ = _texel_coords(ut, vt, s_lb, y0b, x0b, wrap)
        if si == K_SLOTS:
            ry = bt * s_c + ry          # coarse rows stacked per bundle
        xtl = rx >> 7
        xth = xtl
        if taps:
            # second bilinear tap (+1 in x) may cross a lane-tile: the
            # HI chunk bound must include it, but the LO bound must stay
            # on the first tap's tile (reducing lo over the max dropped
            # the (1-fx) tap when every masked pixel straddled a
            # 128-lane boundary — ADVICE r2).
            rx2 = (rx + 1) & (s_lb - 1) if wrap == WRAP_REPEAT \
                else rx + 1
            xth = jnp.maximum(xtl, rx2 >> 7)
        rb = ry.reshape(nt, N_BANDS, BAND_H, PX_W)
        xb = xtl.reshape(nt, N_BANDS, BAND_H, PX_W)
        xbh = xth.reshape(nt, N_BANDS, BAND_H, PX_W)
        mb = mask.reshape(nt, N_BANDS, BAND_H, PX_W)
        big = jnp.int32(1 << 30)
        ry_lo = jnp.where(mb, rb, big).min(axis=(2, 3))
        ry_hi = jnp.where(mb, rb, -1).max(axis=(2, 3))
        xt_lo = jnp.where(mb, xb, big).min(axis=(2, 3))
        xt_hi = jnp.where(mb, xbh, -1).max(axis=(2, 3))
        empty = ry_hi < 0
        if taps:
            ry_hi = ry_hi + 1            # +1-in-y tap rides row ry+1
        ry_lo = jnp.where(empty, 0, jnp.clip(ry_lo, 0, max_row))
        ry_hi = jnp.where(empty, -1, jnp.clip(ry_hi, 0, max_row))
        xt_lo = jnp.where(empty, 0, jnp.clip(xt_lo, 0, max_xt))
        xt_hi = jnp.where(empty, 0, jnp.clip(xt_hi, 0, max_xt))
        for band in range(N_BANDS):
            band_words[band * 3 + si] = [ry_lo[:, band], ry_hi[:, band],
                                         xt_lo[:, band], xt_hi[:, band]]

    words = slot_words + [w for group in band_words for w in group]
    info = jnp.stack([w.astype(jnp.int32) for w in words], axis=1)
    return info, (ph, pw, ty, tx)


# ---------------------------------------------------------------------------
# The Pallas kernel.
# ---------------------------------------------------------------------------

def _sample_kernel(info_ref, uvl_ref, bundle_ref, strip_hbm, coarse_hbm,
                   out_ref, rect0, rect1, coarse_s, acc_ref, sems,
                   *, channels: int, b_total: int, s_c: int,
                   coarse_level: int, tiles_x: int, n_xt: int,
                   wrap: int, mode: str, xw_rect: int, xw_full: int):
    GP = -(-channels // 8) * 8
    taps = mode == "bilinear_taps"
    C5 = GP if taps else 5 * GP
    ohdt = jnp.float32 if taps else jnp.bfloat16
    grid_step = pl.program_id(0)
    # info_ref is an 8-tile (8, INFO_WORDS) SMEM window — streamed per
    # grid step, NOT scalar-prefetched: the full (ntiles, 64) table is
    # 127.6 KiB at the 510-tile 1080p grid, which collides with the SMEM
    # capacity and corrupted neighbouring scalar state on hardware (the
    # late-round-2 NaN-tile / worker-crash incident; CLAUDE.md).  The
    # window is 8 rows because Mosaic requires sublane-divisible blocks.
    tile = grid_step % 8

    # ---- coarse fallback block: DMA once, persists across grid steps ----
    @pl.when(grid_step == 0)
    def _():
        for b in range(b_total):
            cp = pltpu.make_async_copy(
                coarse_hbm.at[b], coarse_s.at[pl.ds(b * s_c, s_c)],
                sems.at[0])
            cp.start()
            cp.wait()

    # ---- per-slot rect DMAs (one strided copy each) ---------------------
    rects = [rect0, rect1]
    for k in range(K_SLOTS):
        base = k * SLOT_WORDS
        bundle = info_ref[tile, base + 0]
        row0 = info_ref[tile, base + 3]
        xt0 = info_ref[tile, base + 5]

        @pl.when(bundle >= 0)
        def _(k=k, bundle=bundle, row0=row0, xt0=xt0):
            if xw_rect == xw_full:
                src = strip_hbm.at[bundle, pl.ds(row0, R_ROWS), :, :]
            else:
                src = strip_hbm.at[bundle, pl.ds(row0, R_ROWS), :,
                                   pl.ds(xt0 * LANE, xw_rect)]
            cp = pltpu.make_async_copy(src, rects[k], sems.at[1])
            cp.start()
            cp.wait()

    # ---- per-pixel coordinates per slot ---------------------------------
    u = uvl_ref[0]
    v = uvl_ref[1]
    lod = uvl_ref[2]
    bnd = bundle_ref[:]

    slot_pix = []   # (mask, ry, rxlane, xt, fx, fy, lf, rx2lane, xt2)
    claimed = None
    for k in range(K_SLOTS):
        base = k * SLOT_WORDS
        bundle = info_ref[tile, base + 0]
        level = info_ref[tile, base + 1]
        s_l = info_ref[tile, base + 2]
        y0 = info_ref[tile, base + 4]
        x0a = info_ref[tile, base + 5] * LANE
        ry, rx, fx, fy = _texel_coords(u, v, s_l, y0, x0a, wrap)
        m = ((bnd == bundle) & (bundle >= 0)).astype(jnp.int32)
        lf = jnp.clip(lod - level.astype(jnp.float32), 0.0, 1.0)
        rx2 = ((rx + 1) & (s_l - 1)) if wrap == WRAP_REPEAT else rx + 1
        slot_pix.append((m, ry, rx & 127, rx >> 7, fx, fy, lf,
                         rx2 & 127, rx2 >> 7))
        claimed = m if claimed is None else claimed | m

    # coarse fallback
    ryc, rxc, fxc, fyc = _texel_coords(u, v, jnp.int32(s_c), jnp.int32(0),
                                       0, wrap)
    ryc = jnp.maximum(bnd, 0) * s_c + ryc
    mc = ((bnd >= 0) & (claimed == 0)).astype(jnp.int32)
    lfc = jnp.clip(lod - float(coarse_level), 0.0, 1.0)
    rx2c = ((rxc + 1) & (s_c - 1)) if wrap == WRAP_REPEAT else rxc + 1
    slot_pix.append((mc, ryc, rxc & 127, rxc >> 7, fxc, fyc, lfc,
                     rx2c & 127, rx2c >> 7))

    # combined bilinear/trilinear weights (each pixel matches one slot)
    def sel3(a0, a1, a2):
        m0 = slot_pix[0][0].astype(jnp.float32)
        m1 = slot_pix[1][0].astype(jnp.float32)
        m2 = slot_pix[2][0].astype(jnp.float32)
        return a0 * m0 + a1 * m1 + a2 * m2

    fx_all = sel3(slot_pix[0][4], slot_pix[1][4], slot_pix[2][4])
    fy_all = sel3(slot_pix[0][5], slot_pix[1][5], slot_pix[2][5])
    lf_all = sel3(slot_pix[0][6], slot_pix[1][6], slot_pix[2][6])

    tables = [rect0, rect1, coarse_s]

    # ---- per-band chunk-skipped one-hot fetch ---------------------------
    P = BAND_H * PX_W
    for band in range(N_BANDS):
        r0, r1 = band * BAND_H, (band + 1) * BAND_H
        acc_ref[:] = jnp.zeros((C5, P), jnp.float32)
        fxb = fx_all[r0:r1, :].reshape(1, P)
        fyb = fy_all[r0:r1, :].reshape(1, P)
        lfb = lf_all[r0:r1, :].reshape(1, P)
        for si in range(3):
            boff = K_SLOTS * SLOT_WORDS + (band * 3 + si) * BAND_WORDS
            ry_lo = info_ref[tile, boff + 0]
            ry_hi = info_ref[tile, boff + 1]
            xt_lo = info_ref[tile, boff + 2]
            xt_hi = info_ref[tile, boff + 3]
            m, ry, rxl, xtl = slot_pix[si][:4]
            rx2l, xt2l = slot_pix[si][7:9]
            m_b = m[r0:r1, :].reshape(1, P)
            ry_b = ry[r0:r1, :].reshape(1, P)
            rx_b = rxl[r0:r1, :].reshape(1, P)
            xt_b = xtl[r0:r1, :].reshape(1, P)
            rx2_b = rx2l[r0:r1, :].reshape(1, P)
            xt2_b = xt2l[r0:r1, :].reshape(1, P)
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, P), 0)
            table = tables[si]
            nx = 1 if si == 2 else n_xt

            def body(ryr, carry, si=si, table=table, nx=nx,
                     m_b=m_b, ry_b=ry_b, rx_b=rx_b, xt_b=xt_b,
                     rx2_b=rx2_b, xt2_b=xt2_b, lane_iota=lane_iota,
                     xt_lo=xt_lo, xt_hi=xt_hi):
                row_sel = (ry_b == ryr) & (m_b > 0)
                if taps:
                    prev_sel = (ry_b == ryr - 1) & (m_b > 0)
                for xt in range(nx):
                    @pl.when((xt >= xt_lo) & (xt <= xt_hi))
                    def _(xt=xt):
                        if taps:
                            # bilinear weights ride the one-hot: row ryr
                            # serves tap row ry (weight 1-fy) and tap
                            # row ry+1 of the band above it (weight fy)
                            wy = (jnp.where(row_sel, 1.0 - fyb, 0.0)
                                  + jnp.where(prev_sel, fyb, 0.0))
                            w0 = jnp.where((lane_iota == rx_b)
                                           & (xt_b == xt),
                                           1.0 - fxb, 0.0)
                            w1 = jnp.where((lane_iota == rx2_b)
                                           & (xt2_b == xt), fxb, 0.0)
                            oh = ((w0 + w1) * wy).astype(ohdt)
                        else:
                            sel = row_sel & (xt_b == xt)
                            oh = jnp.where(
                                (lane_iota == rx_b) & sel,
                                jnp.float32(1.0), jnp.float32(0.0)
                            ).astype(ohdt)
                        if si == 2:
                            lhs = table[ryr]               # (C5, 128)
                        else:
                            lhs = table[ryr][:, xt * LANE:(xt + 1) * LANE]
                        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                            lhs, oh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                return carry

            jax.lax.fori_loop(ry_lo, ry_hi + 1, body, 0)

        # ---- reconstruction --------------------------------------------
        acc = acc_ref[:]
        if taps:
            # the matmul already applied the bilinear weights
            res = acc
        else:
            t00 = acc[0 * GP:1 * GP]
            t10 = acc[1 * GP:2 * GP]
            t01 = acc[2 * GP:3 * GP]
            t11 = acc[3 * GP:4 * GP]
            par = acc[4 * GP:5 * GP]
            top = t00 * (1.0 - fxb) + t10 * fxb
            bot = t01 * (1.0 - fxb) + t11 * fxb
            fine = top * (1.0 - fyb) + bot * fyb
            res = fine * (1.0 - lfb) + par * lfb
        out_ref[:, r0:r1, :] = res.reshape(GP, BAND_H, PX_W)


def sample_tiled(strips: TiledStrips, u, v, lod, bundle_id,
                 interpret: bool | None = None, fit_rows: int = FIT_Y):
    """Sample tiled strips at per-pixel (u, v, lod, bundle).

    u, v, lod: (H, W) f32; bundle_id: (H, W) i32, -1 where uncovered.
    Returns (H, W, channels) f32.  Quad+parent strips (C = 5*GP, bf16)
    yield approximate trilinear matching ops/texture.sample_packed_lod
    wherever the tile rect level equals floor(lod); raw strips (C = GP,
    f32, from build_tiled_strip_raw) yield exact bilinear at the rect
    level — the VSM-moment path, where f32 precision matters.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    H, W = u.shape
    ch = strips.channels
    GP = -(-ch // 8) * 8
    mode = "bilinear_taps" if strips.strip.shape[2] == GP \
        else "quad_parent"
    if mode == "bilinear_taps":
        assert strips.wrap != WRAP_REPEAT, \
            "raw-tap strips require clamp wrap (coarse rows would wrap)"
    XW = strips.strip.shape[-1]
    xw_rect = min(XW, MAX_S)
    if mode == "bilinear_taps":
        # The +1-in-y tap rides rect row ry+1: with the full FIT_Y span
        # and worst-case alignment it landed on row 48 (outside the
        # 48-row DMA window) and the fy-weighted tap was silently
        # dropped for bottom-row texels (ADVICE r2) — keep one row of
        # planning margin.
        fit_rows = min(fit_rows, FIT_Y - 1)
    info, (ph, pw, ty, tx) = plan_rects(u, v, lod, bundle_id, strips,
                                        wrap=strips.wrap, mode=mode,
                                        xw_rect=xw_rect,
                                        fit_rows=fit_rows)
    if (ph, pw) != (H, W):
        pad = ((0, ph - H), (0, pw - W))
        u = jnp.pad(u, pad)
        v = jnp.pad(v, pad)
        lod = jnp.pad(lod, pad)
        bundle_id = jnp.pad(bundle_id, pad, constant_values=-1)
    uvl = jnp.stack([u, v, lod]).astype(jnp.float32)
    C5 = GP if mode == "bilinear_taps" else 5 * GP
    tdt = strips.strip.dtype
    B = strips.coarse.shape[0]
    s_c = min(COARSE_S, strips.size)
    ntiles = ty * tx
    kernel = functools.partial(
        _sample_kernel, channels=ch, b_total=B, s_c=s_c,
        coarse_level=strips.coarse_level, tiles_x=tx,
        n_xt=xw_rect // LANE, wrap=strips.wrap, mode=mode,
        xw_rect=xw_rect, xw_full=XW)
    # The per-tile scalar table streams as a (1, INFO_WORDS) SMEM block
    # per grid step.  Scalar-prefetching the whole table put
    # ntiles*64 i32 words resident in SMEM — 127.6 KiB at the 510-tile
    # 1080p grid — which overflowed SMEM capacity on the v5e and
    # produced NaN tiles / TPU worker crashes (round-2 incident).
    # pad the info table to a multiple of 8 rows: the SMEM window block
    # must be sublane-divisible (Mosaic rule); padding rows are never
    # read (the grid stops at ntiles).
    nt_pad = -(-ntiles // 8) * 8
    if nt_pad != ntiles:
        info = jnp.concatenate(
            [info, jnp.zeros((nt_pad - ntiles, INFO_WORDS), jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((8, INFO_WORDS), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, PX_H, PX_W),
                         lambda i: (0, i // (pw // PX_W),
                                    i % (pw // PX_W))),
            pl.BlockSpec((PX_H, PX_W),
                         lambda i: (i // (pw // PX_W),
                                    i % (pw // PX_W))),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (GP, PX_H, PX_W),
            lambda i: (0, i // (pw // PX_W), i % (pw // PX_W))),
        scratch_shapes=[
            pltpu.VMEM((R_ROWS, C5, xw_rect), tdt),
            pltpu.VMEM((R_ROWS, C5, xw_rect), tdt),
            pltpu.VMEM((B * s_c, C5, LANE), tdt),
            pltpu.VMEM((C5, BAND_H * PX_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GP, ph, pw), jnp.float32),
        interpret=interpret,
    )(info, uvl, bundle_id.astype(jnp.int32), strips.strip, strips.coarse)
    # Containment: a single bad texel (kernel bug / DMA fault) would
    # otherwise NaN-poison the global auto-exposure and black the whole
    # frame; clamp to finite values so faults stay local and visible.
    out = jnp.nan_to_num(out, nan=0.0, posinf=1.0, neginf=0.0)
    return jnp.moveaxis(out, 0, -1)[:H, :W, :ch]


# ---------------------------------------------------------------------------
# On-device raw strip builder (per-frame data: VSM moments, env maps).
# ---------------------------------------------------------------------------

def build_tiled_strip_raw(img, wrap: int = 1):
    """(S, S, C) f32 device array -> raw TiledStrips (single bundle).

    Pure jnp (static shapes) so it can run inside the jitted frame: the
    VSM moment map becomes a filterable mip strip every frame.  Raw
    channels (C = GP, f32): `sample_tiled` applies bilinear weights via
    the one-hot matmul itself (mode bilinear_taps), exact in f32 — the
    precision VSM's variance term needs.  wrap=1 (clamp) only.
    """
    assert wrap != WRAP_REPEAT, "raw strips support clamp wrap only"
    S = img.shape[0]
    C = img.shape[-1]
    GP = -(-C // 8) * 8
    L = num_mip_levels(S, S)
    yr_off, YR, XW = strip_geometry(S)
    s_c = min(COARSE_S, S)
    cl = max(0, L - num_mip_levels(s_c, s_c))

    levels = [img.astype(jnp.float32)]
    cur = levels[0]
    for l in range(1, L):
        sl = cur.shape[0]
        if sl > 1:
            cur = cur.reshape(sl // 2, 2, sl // 2, 2, C).mean(axis=(1, 3))
        levels.append(cur)

    blocks = []
    for l, lv in enumerate(levels):
        sl = lv.shape[0]
        t = jnp.moveaxis(lv, -1, 0)                  # (C, sl, sl)
        t = jnp.pad(t, ((0, GP - C), (0, R_ROWS), (0, XW - sl)))
        blocks.append(jnp.moveaxis(t, 0, 1))         # (sl+R, GP, XW)
    strip = jnp.concatenate(blocks, axis=0)[None]    # (1, YR, GP, XW)

    cv = levels[cl]
    ct = jnp.moveaxis(cv, -1, 0)                     # (C, s_c, s_c)
    ct = jnp.pad(ct, ((0, GP - C), (0, 0), (0, LANE - s_c)))
    coarse = jnp.moveaxis(ct, 0, 1)[None]            # (1, s_c, GP, 128)

    return TiledStrips(strip=strip, coarse=coarse, yr_off=yr_off,
                       size=S, channels=C, levels=L, coarse_level=cl,
                       wrap=wrap)
