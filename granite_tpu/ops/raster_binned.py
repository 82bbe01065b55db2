"""Binned tile rasterizer — the TPU performance path.

Replaces the O(T x P) chunked-scan rasterizer (ops/raster.py) with the
classic GPU software-raster structure (binning -> per-tile raster), built
the TPU way:

  1. **Emit**: every valid triangle whose bbox fits a SPAN_W x SPAN_H
     tile window emits ONE key — its top-left covered tile.  (Round-1
     emitted 8 duplicated keys per triangle; binning by origin cuts the
     sort and packet-gather volume 8x.  The raster kernel compensates by
     scanning the bins of the window up-left of its tile, which is where
     any triangle overlapping it must have been binned.)  Triangles
     spanning more tiles (or crossing the near plane) go to a
     fixed-capacity "huge" list that every tile processes (Sponza-class
     scenes have only a handful after culling); overflow is COUNTED and
     surfaced via stats — never silently grown.
  2. **Sort**: one XLA sort of the T keys groups entries by bin;
     per-bin [start, end) ranges come from a vectorized searchsorted.
     This replaces atomics/append-buffers of GPU binning — sorting is
     the TPU-native idiom for irregular scatter.
  3. **Gather**: triangle setup packets (edge rows, z-plane, offset,
     tri id) are re-ordered into sorted order with one big take, so the
     per-tile kernel reads *contiguous* packet ranges.
  4. **Raster kernel (Pallas)**: grid over tiles; each instance walks the
     packet ranges of its SPAN_H bin rows (each row's SPAN_W bins are
     adjacent in key space -> one contiguous range per row) in chunks of
     16 with double-buffered HBM->VMEM DMA, evaluates the triangles
     against its 32x128 pixels on the VPU, and keeps a (depth, tri)
     visibility buffer in VMEM scratch.

Outputs match ops/raster.rasterize exactly (same edge functions, same
top-left rule, same reverse-Z GREATER test) — tested against it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import TriangleSetup


class BinPlan(NamedTuple):
    """Cached binning plan — the TPU answer to the reference's per-frame
    draw-call sort (render_queue.cpp:41-58): a static scene under a
    slowly moving camera re-derives the SAME bin structure every frame,
    so the sort permutation, bin ranges, and static payload lanes are
    computed once (classified on the union of the current and a
    predicted-future camera's tile rects) and carried as render-graph
    history; each frame runs a cheap conservative validity check and
    only re-bins (lax.cond) when a triangle's actual tile cover escapes
    what the plan's kernels would scan.  Kills the per-frame argsort
    (~16 ms at 164k keys) and 128-lane packet gather (~15 ms) that
    dominated the gbuffer rung (round-4 ladder).

    Shapes (Cp = compaction capacity + CHUNK, Ph = alloc*tiles_y +
    CHUNK):
      flag        (1,)   i32  — 0 = no plan yet (initial history)
      payload     (Cp, 128) f32 — nan-cleaned sorted packet image; the
                  fast path reuses its STATIC lanes (triid + resolve
                  payload past the adjugate) and rebuilds the per-frame
                  lanes (edges/zplane/offset/adj/zmax/unions)
      src         (Cp,)  i32  — source triangle per sorted row
      rect        (Cp, 4) i32 — planned cover rect (inclusive tile
                  coords) the kernels actually scan for this row
      starts      (2*ntiles+1,) i32
      member      (T,)   i32  — 0 none / 1 small / 2 huge at plan time
      huge_src    (alloc,) i32
      huge_slot   (Ph,)  i32
      huge_starts (tiles_y+1,) i32
      huge_cover  (alloc, 2) i32 — planned row span per huge slot
    """
    flag: jax.Array
    payload: jax.Array
    src: jax.Array
    rect: jax.Array
    starts: jax.Array
    member: jax.Array
    huge_src: jax.Array
    huge_slot: jax.Array
    huge_starts: jax.Array
    huge_cover: jax.Array


def bin_plan_shapes(T: int, width: int, height: int,
                    huge_cap: int = 1024,
                    max_visible: int | None = None) -> dict:
    """name -> (shape, dtype) for declaring BinPlan history buffers."""
    tx = -(-width // TILE_W)
    ty = -(-height // TILE_H)
    C = max_visible if (max_visible is not None and max_visible < T) \
        else T
    alloc = -(-max(huge_cap, 1) // CHUNK) * CHUNK
    return {
        "flag": ((1,), jnp.int32),
        "payload": ((C + CHUNK, PACKET_F32), jnp.float32),
        "src": ((C + CHUNK,), jnp.int32),
        "rect": ((C + CHUNK, 4), jnp.int32),
        "starts": ((2 * tx * ty + 1,), jnp.int32),
        "member": ((T,), jnp.int32),
        "huge_src": ((alloc,), jnp.int32),
        "huge_slot": ((alloc * ty + CHUNK,), jnp.int32),
        "huge_starts": ((ty + 1,), jnp.int32),
        "huge_cover": ((alloc, 2), jnp.int32),
    }

TILE_H = 32
TILE_W = 128
SPAN_W = 2
SPAN_H = 4
# Packet row = 128 f32: edge 15 + zplane 3 + offset 2 + triid 1 + padding.
# HBM tiles f32 arrays to 128 lanes anyway (a (E, 24) array is stored as
# (E, 128) physically), and Mosaic requires DMA slices lane-aligned — so
# the 128-wide row is free in memory and makes (CHUNK, 128) DMAs legal.
PACKET_F32 = 128
# Column holding the triangle's conservative max reverse-Z depth (bbox
# upper bound).  Packets are sorted FRONT-TO-BACK (descending zmax)
# within each bin so the tile kernels can terminate a bin early once
# every pixel's depth exceeds the chunk bound (classic early-z).
COL_ZMAX = 120
# Chunk-union tile bbox, packed lo + (hi << 11) as an INTEGER-VALUED
# f32 (exact: < 2^22; Mosaic has no scalar bitcast), written into the
# FIRST row of every 16-row group of the sorted array: the kernels skip
# a whole chunk when its union misses their tile (a tile scans the bins
# of a span_h x span_w window; most neighbor-bin packets never reach it
# — measured round 3: the window scan made the gbuffer rung ~148
# ms/frame at 1080p).
COL_UNION_X = 126          # min_tx + max_tx * 2048
COL_UNION_Y = 127          # min_ty + max_ty * 2048
_UNION_SHIFT = 11          # tile ids < 2048 (ntiles < 2048 asserted)
# Quantized-z bits folded into the bin sort key: ONE argsort orders by
# (bin, front-to-back) instead of a z pre-sort + stable bin sort (XLA
# TPU sort is expensive: ~25 ms at 260k keys).
_ZQ_BITS = 19
_ZQ_MAX = (1 << _ZQ_BITS) - 1
# Early-z bound padding: the sort key quantizes zmax to 2^-_ZQ_BITS, so
# a later row can exceed a chunk's bound by one quantum.
ZQ_PAD = 2.0 ** -(_ZQ_BITS - 1)


def _zq_key(zmax: jax.Array) -> jax.Array:
    """Ascending i32 key: nearest (largest reverse-Z zmax) first.

    nan_to_num: a plan-covered triangle that is only valid under the
    FUTURE camera can have a garbage current-frame z plane; a NaN here
    would corrupt the composite key's BIN bits (NaN->i32 cast is
    backend-defined), not just its z order."""
    z = jnp.nan_to_num(1.0 - zmax, nan=1.0, posinf=1.0, neginf=0.0)
    return (jnp.clip(z, 0.0, 1.0) * _ZQ_MAX).astype(jnp.int32)


def _chunk_union_cols(n: int, tx0, ty0, tx1, ty1, n_valid_key):
    """Per-16-row-group bbox unions as two (n, 1) f32 COLUMNS (n as
    passed already includes the CHUNK pad; values on rows 0::16, zero
    elsewhere).  Pad/tail rows carry always-invalid keys and ARBITRARY
    gathered packet bytes (triangle 0 / dead tris) — kernels must
    range-mask them out, as bin_triangles' contract documents.

    tx0.. are the per-row tile bboxes IN SORTED ORDER (invalid rows —
    key >= n_valid_key — contribute empty boxes).  The kernels read the
    union from the chunk's first row, so ranges must be walked
    16-ALIGNED (head rows masked).  Returned as columns so the caller
    CONCATENATES them into the packet build (fused into the packet
    gather) — patching them in with `.at[rows, col].set` copied the
    whole (C, 128) array twice (~9 ms/frame at C=164k on hardware)."""
    g = -(-n // CHUNK)                    # the pad covers a partial tail
    big = jnp.int32(1 << 14)

    def grp(v, red, empty):
        v = jnp.where(n_valid_key, v, empty)
        v = jnp.concatenate([v, jnp.full((g * CHUNK - n,), empty,
                                         v.dtype)])
        return red(v.reshape(g, CHUNK), axis=1)

    # An empty group packs lo=2047, hi=0 -> lo > hi -> never hits.
    ux0 = jnp.minimum(grp(tx0, jnp.min, big), 2047)
    uy0 = jnp.minimum(grp(ty0, jnp.min, big), 2047)
    ux1 = jnp.maximum(grp(tx1, jnp.max, -1), 0)
    uy1 = jnp.maximum(grp(ty1, jnp.max, -1), 0)
    px = (ux0 + (ux1 << _UNION_SHIFT)).astype(jnp.float32)
    py = (uy0 + (uy1 << _UNION_SHIFT)).astype(jnp.float32)

    def col(vals):
        c = jnp.zeros((g, CHUNK), jnp.float32).at[:, 0].set(vals)
        return c.reshape(-1)[:n, None]

    return col(px), col(py)


def _fold_union_cols(body: jax.Array, ux, uy) -> jax.Array:
    """Place the union columns at COL_UNION_X/Y via a lane-iota select —
    pure elementwise, so XLA fuses it into the packet-gather output pass
    (a concatenate or `.at[rows, col].set` costs a second full
    materialization: ~7 ms at (164k, 128) on hardware)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, body.shape[1]), 1)
    return jnp.where(lane == COL_UNION_X, ux,
                     jnp.where(lane == COL_UNION_Y, uy, body))


def _tri_zmax(setup: TriangleSetup) -> jax.Array:
    """(T,) conservative max attainable reverse-Z depth per triangle.

    The z plane is affine in (px, py), so its max over the (convex)
    bbox is at a corner; coverage clamps depth to <= 1, so min(zmax, 1)
    is a valid upper bound of any depth the triangle can write."""
    g0 = setup.zplane[:, 0]
    g1 = setup.zplane[:, 1]
    g2 = setup.zplane[:, 2]
    ox = setup.offset[:, 0]
    oy = setup.offset[:, 1]
    bb = setup.bbox.astype(jnp.float32)
    zm = None
    for xi, yi in ((0, 1), (2, 1), (0, 3), (2, 3)):
        z = g0 * (bb[:, xi] - ox) + g1 * (bb[:, yi] - oy) + g2
        zm = z if zm is None else jnp.maximum(zm, z)
    return jnp.minimum(zm, 1.0)


def _build_packets(setup: TriangleSetup, extra=None, idx=None) -> jax.Array:
    """(T, PACKET_F32) f32 packets; slot 20 holds the int32 tri id
    (bitcast); slot COL_ZMAX the conservative max depth (early-z sort
    key).  The chunk-union columns (COL_UNION_X/_Y) are left zero here
    and folded in SORTED order by the binner via the lane select in
    `bin_triangles` (they cannot be built in triangle domain).

    extra: optional (T, E<=99) resolve payload placed at columns 21..
    (the fused raster+resolve kernel, ops/raster_fused.py).

    idx: optional (N,) i32 — build packets DIRECTLY in gathered order
    (row i holds triangle idx[i]; slot 20 = idx[i]).  Per-column
    gathers: only worth it for SMALL N (the huge list); at C=164k one
    fused concat-gather (`_build_packets(...)[fidx]`) measured 14.7 ms
    vs 17.9 for this form."""
    T = setup.adj.shape[0]
    if idx is None:
        ids = jnp.arange(T, dtype=jnp.int32)
        g = lambda a: a
    else:
        ids = idx.astype(jnp.int32)
        g = lambda a: a[ids]
    N = ids.shape[0]
    tri_ids = jax.lax.bitcast_convert_type(ids, jnp.float32)
    cols = [g(setup.edge.reshape(T, 15)),
            g(setup.zplane),
            g(setup.offset),
            tri_ids[:, None]]
    used = 21
    if extra is not None:
        cols.append(g(extra.astype(jnp.float32)))
        used += extra.shape[1]
    assert used <= COL_ZMAX
    cols.append(jnp.zeros((N, COL_ZMAX - used), jnp.float32))
    cols.append(g(_tri_zmax(setup))[:, None])
    cols.append(jnp.zeros((N, PACKET_F32 - COL_ZMAX - 1), jnp.float32))
    return jnp.concatenate(cols, axis=1)


def _tile_rects(bbox, width: int, height: int):
    """Pixel bbox (T, 4) -> inclusive tile rect (tx0, ty0, tx1, ty1).

    Empty bboxes (x1 <= x0, the invalid-triangle encoding from
    setup_triangles) produce tx1 < tx0 — an empty rect callers must
    mask by validity."""
    return (bbox[:, 0] // TILE_W, bbox[:, 1] // TILE_H,
            (bbox[:, 2] - 1) // TILE_W, (bbox[:, 3] - 1) // TILE_H)


def _kill_dead_rows(pkts: jax.Array, alive: jax.Array) -> jax.Array:
    """Zero every lane of rows where ~alive and set edge-0's constant
    (lane 2) to -1, making coverage identically false (lam = -1, and
    a = b = 0 fails the top-left tie rule).  Keeps 0 * garbage out of
    the pass-2 one-hot MXU accumulation — any NaN lane there poisons
    the band accumulator (CLAUDE.md round-2 incident rule)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, pkts.shape[1]), 1)
    dead = jnp.where(lane == 2, -1.0, 0.0)
    return jnp.where(alive[:, None], pkts, dead)


def bin_triangles(setup: TriangleSetup, width: int, height: int,
                  huge_cap: int = 1024, max_visible: int | None = None,
                  span_w: int = SPAN_W, span_h: int = SPAN_H,
                  extra=None):
    """Sort-based binning (one key per small triangle — see module doc).

    Returns (packets_sorted (T+CHUNK, 128), starts (2*ntiles+1,) —
    EXACT single-tile bins at [0, ntiles), WINDOW multi-tile bins at
    [ntiles, 2*ntiles),
    huge_rows ((huge_cap*ty)+CHUNK, 128) row-expanded front-to-back,
    huge_row_starts (ty+1,), stats dict).

    stats: {"huge_overflow": dropped huge triangles,
            "visible_overflow": dropped by max_visible compaction} —
    the reference never drops geometry (render_queue.cpp:41-58); these
    counters make any capacity overflow observable (graph/debug.py).

    max_visible: optional static capacity for a visibility-compaction
    stage.  Culled scenes often keep <25% of triangles; compacting the
    survivors first shrinks the sort and the packet gather by the same
    factor.  SMALL triangles beyond the capacity are DROPPED and
    counted (huge triangles compact independently against huge_cap).
    """
    pk, st, hr, hs, _plan, stats = _bin_core(
        setup, width, height, huge_cap, max_visible, span_w, span_h,
        extra, class_rects=None, valid_any=None, valid_now=None,
        emit_plan=False)
    return pk, st, hr, hs, stats


def _bin_core(setup: TriangleSetup, width: int, height: int,
              huge_cap: int, max_visible: int | None,
              span_w: int, span_h: int, extra,
              class_rects, valid_any, valid_now, emit_plan: bool):
    """bin_triangles body, parameterized for the cached-plan path.

    class_rects: optional (tx0, ty0, tx1, ty1) tile rects used for
    CLASSIFICATION (exact/window/huge + bin origin) instead of the
    current-frame rects — the plan builder passes the union of the
    current and predicted-future rects so the resulting plan stays a
    conservative cover for several frames of camera motion.
    valid_any: classification validity (current | future);
    valid_now: this frame's validity — rows of tris not valid NOW are
    kill-masked in the emitted packets (they exist only so the plan
    covers them later).  Both default to setup.valid.
    emit_plan: also build the BinPlan arrays (see BinPlan).
    """
    tx = -(-width // TILE_W)
    ty = -(-height // TILE_H)
    ntiles = tx * ty

    assert ntiles < (1 << 11), "composite sort key needs ntiles < 2048"
    T = setup.adj.shape[0]
    # FRONT-TO-BACK ordering rides the bin sort key: key = bin << 20 |
    # quantized(1 - zmax), so ONE argsort yields bin-grouped ranges that
    # are near-first within each bin (reverse-Z GREATER) and both tile
    # kernels can early-terminate once a tile is fully covered nearer
    # than the chunk bound.  (Replaces a separate z pre-sort + stable
    # bin sort: XLA TPU argsort costs ~25 ms at 260k keys — one sort,
    # not two.)
    zq_f = _zq_key(_tri_zmax(setup))
    stats = {}
    if valid_any is None:
        valid_any = setup.valid
    # ALL key math runs in triangle domain (pure elementwise over T);
    # compaction and sort act on (key, src) index pairs only, and the
    # 128-wide packets are built ONCE, by a single gather with composed
    # (compaction ∘ sort) indices — XLA fuses the column concat INTO
    # the gather, so the (T, 128) array is never materialized, there is
    # no 128-wide compaction scatter, and the chunk-union columns are
    # folded in by a lane select riding the same output pass.  Rows past
    # a range end hold ARBITRARY packets (dead tris / tail garbage),
    # which is safe: both pass-1 and pass-2 kernels zero-mask rows
    # outside [start, start+count), and pass-2 winner gids are global
    # ROW indices that masked rows can never win.
    bbf = setup.bbox
    if class_rects is None:
        tx0_f, ty0_f, tx1_f, ty1_f = _tile_rects(bbf, width, height)
    else:
        tx0_f, ty0_f, tx1_f, ty1_f = class_rects
    sw_f = tx1_f - tx0_f + 1
    sh_f = ty1_f - ty0_f + 1
    small_f = valid_any & (sw_f <= span_w) & (sh_f <= span_h)
    huge = valid_any & ~small_f

    # --- small: ONE key per triangle ---------------------------------------
    # TWO sub-populations ride one sort (round-3 window-redundancy fix):
    #   EXACT [0, ntiles): triangles covering exactly ONE tile — keyed
    #     at that tile; only that tile ever streams them.
    #   WINDOW [ntiles, 2*ntiles): multi-tile triangles keyed at their
    #     top-left covered tile; tiles scan the span_h x span_w window.
    # Most triangles in a dense scene are single-tile, so the window
    # walk (up to span_h*span_w redundant streams per packet) shrinks
    # to the small multi-tile population — measured round 3: the window
    # scan dominated the 148 ms/frame gbuffer rung at 1080p.
    single_f = small_f & (sw_f == 1) & (sh_f == 1)
    bin_id = ty0_f * tx + tx0_f
    pop_bin = jnp.where(single_f, bin_id, ntiles + bin_id)
    invalid_key = jnp.int32((2 * ntiles) << _ZQ_BITS)
    key_f = jnp.where(small_f,
                      (pop_bin << _ZQ_BITS) | zq_f,
                      invalid_key).astype(jnp.int32)
    arange_t = jnp.arange(T, dtype=jnp.int32)
    # The sorted array carries one extra DMA chunk of tail slots (the
    # kernels read chunk-aligned ranges and may touch up to CHUNK-1
    # rows past a range end) — allocated HERE as always-invalid key
    # slots instead of a post-gather zero-pad concat (a concat is a
    # second full materialization).
    if max_visible is not None and max_visible < T:
        C = max_visible
        vpos = jnp.cumsum(small_f.astype(jnp.int32)) - 1
        sel = small_f & (vpos < C)
        stats["visible_overflow"] = (small_f.sum() - sel.sum()) \
            .astype(jnp.int32)
        stats["exact_entries"] = (single_f & sel).sum().astype(jnp.int32)
        stats["window_entries"] = (sel & ~single_f).sum() \
            .astype(jnp.int32)
        dst = jnp.where(sel, vpos, C + CHUNK)
        keys = jnp.full((C + CHUNK,), invalid_key).at[dst].set(
            key_f, mode="drop")
        src = jnp.zeros((C + CHUNK,), jnp.int32).at[dst].set(
            arange_t, mode="drop")
    else:
        stats["visible_overflow"] = jnp.int32(0)
        stats["exact_entries"] = single_f.sum().astype(jnp.int32)
        stats["window_entries"] = (small_f & ~single_f).sum() \
            .astype(jnp.int32)
        keys = jnp.concatenate(
            [key_f, jnp.full((CHUNK,), invalid_key)])
        src = jnp.concatenate([arange_t, jnp.zeros((CHUNK,), jnp.int32)])
    order = jnp.argsort(keys, stable=False)
    sorted_keys = keys[order] >> _ZQ_BITS
    fidx = src[order]

    ux, uy = _chunk_union_cols(
        fidx.shape[0], tx0_f[fidx], ty0_f[fidx], tx1_f[fidx],
        ty1_f[fidx], sorted_keys < 2 * ntiles)
    raw = _build_packets(setup, extra)[fidx]
    if valid_now is not None:
        # Planned path: rows covering future-only triangles carry
        # garbage current-frame lanes — nan-clean the plan image and
        # kill-mask this frame's packets to the CURRENT validity.
        raw = jnp.nan_to_num(raw)
        alive = valid_now[fidx] & (sorted_keys < 2 * ntiles)
        packets_sorted = _fold_union_cols(_kill_dead_rows(raw, alive),
                                          ux, uy)
    else:
        packets_sorted = _fold_union_cols(raw, ux, uy)
    starts = jnp.searchsorted(sorted_keys,
                              jnp.arange(2 * ntiles + 1, dtype=jnp.int32),
                              side="left").astype(jnp.int32)

    # --- huge: fixed-capacity compaction + PER-ROW lists --------------------
    # A tile must only ever scan huge triangles that intersect its ROW:
    # the old single global list cost O(n_huge x n_tiles) kernel work
    # (582 huge x 510 tiles at the 1080p bench = ~300k wasted packet
    # visits PER PASS, mostly in sky tiles that can never early-out).
    # Each compacted huge triangle emits one copy per tile row its bbox
    # spans; a stable row sort preserves the front-to-back order within
    # every row so early-z applies to the huge stream too.
    hidx = jnp.cumsum(huge.astype(jnp.int32)) - 1
    hsel = huge & (hidx < huge_cap)
    alloc = -(-max(huge_cap, 1) // CHUNK) * CHUNK
    slots = jnp.where(hsel, hidx, alloc)
    hsrc = jnp.zeros((alloc,), jnp.int32).at[slots].set(arange_t,
                                                        mode="drop")
    # Scatter TILE-space rects (classification rects — the plan path's
    # union rects, so huge row coverage stays a conservative cover).
    trects = jnp.stack([tx0_f, ty0_f, tx1_f, ty1_f], axis=1)
    hbb = jnp.full((alloc, 4), -1, jnp.int32).at[slots].set(
        trects, mode="drop")
    hzq = jnp.full((alloc,), _ZQ_MAX, jnp.int32).at[slots].set(
        zq_f, mode="drop")
    n_huge = huge.sum()
    huge_count = jnp.minimum(n_huge, huge_cap).astype(jnp.int32)
    stats["huge_overflow"] = jnp.maximum(
        n_huge - huge_cap, 0).astype(jnp.int32)

    htx0 = jnp.clip(hbb[:, 0], 0, tx - 1)
    htx1 = jnp.clip(hbb[:, 2], 0, tx - 1)
    hty0 = jnp.clip(hbb[:, 1], 0, ty - 1)
    hty1 = jnp.clip(hbb[:, 3], 0, ty - 1)
    live = (jnp.arange(alloc) < huge_count) & (hbb[:, 3] >= hbb[:, 1]) \
        & (hbb[:, 1] >= 0)
    rows = jnp.arange(ty, dtype=jnp.int32)[None, :]        # (alloc, ty)
    pair_mask = live[:, None] & (rows >= hty0[:, None]) \
        & (rows <= hty1[:, None])
    # composite: front-to-back within each row via the same zq bits
    pair_keys = jnp.where(pair_mask,
                          (rows << _ZQ_BITS) | hzq[:, None],
                          ty << _ZQ_BITS).reshape(-1)
    # One tail DMA chunk of always-dead pair slots (same contract as the
    # small array — no post-gather pad concat).
    pair_keys = jnp.concatenate(
        [pair_keys, jnp.full((CHUNK,), ty << _ZQ_BITS)])
    order_h = jnp.argsort(pair_keys, stable=False)
    pair_slot = jnp.minimum(order_h // ty, alloc - 1)
    # Materialize the tiny (alloc, 128) huge population once via the
    # per-column gathered build (alloc <= ~1k: per-op cost only), then
    # row-expand with a cheap contiguous-row gather.
    sorted_rows = pair_keys[order_h] >> _ZQ_BITS
    hux, huy = _chunk_union_cols(
        pair_slot.shape[0], htx0[pair_slot], hty0[pair_slot],
        htx1[pair_slot], hty1[pair_slot], sorted_rows < ty)
    hraw = _build_packets(setup, extra, idx=hsrc)[pair_slot]
    if valid_now is not None:
        hraw = _kill_dead_rows(
            jnp.nan_to_num(hraw),
            valid_now[hsrc][pair_slot] & (sorted_rows < ty))
    huge_rows = _fold_union_cols(hraw, hux, huy)
    huge_row_starts = jnp.searchsorted(
        sorted_rows, jnp.arange(ty + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)

    plan = None
    if emit_plan:
        # Planned cover rects per sorted row, derived from the key:
        # exact rows cover exactly their tile; window rows the FULL
        # (span_w, span_h) window the kernels scan from the bin origin
        # (more permissive than the classified span — drift stays valid
        # until the triangle leaves what the kernel actually reads);
        # dead rows get a full-screen rect so they can never trigger a
        # violation.
        k = sorted_keys
        is_exact = k < ntiles
        is_dead = k >= 2 * ntiles
        b = jnp.where(is_exact, k, k - ntiles)
        bx = b % tx
        by = b // tx
        r0 = jnp.where(is_dead, 0, bx)
        r1 = jnp.where(is_dead, 0, by)
        r2 = jnp.where(is_dead, tx - 1,
                       jnp.where(is_exact, bx,
                                 jnp.minimum(bx + span_w - 1, tx - 1)))
        r3 = jnp.where(is_dead, ty - 1,
                       jnp.where(is_exact, by,
                                 jnp.minimum(by + span_h - 1, ty - 1)))
        member = jnp.where(small_f, 1, jnp.where(huge, 2, 0)) \
            .astype(jnp.int32)
        hcover = jnp.stack(
            [jnp.where(live, hty0, 0),
             jnp.where(live, hty1, ty - 1)], axis=1).astype(jnp.int32)
        plan = BinPlan(
            flag=jnp.ones((1,), jnp.int32),
            payload=raw,        # already nan-cleaned above (valid_now path)
            src=fidx.astype(jnp.int32),
            rect=jnp.stack([r0, r1, r2, r3], axis=1).astype(jnp.int32),
            starts=starts,
            member=member,
            huge_src=hsrc.astype(jnp.int32),
            huge_slot=pair_slot.astype(jnp.int32),
            huge_starts=huge_row_starts,
            huge_cover=hcover)
    return packets_sorted, starts, huge_rows, huge_row_starts, plan, stats


def bin_triangles_planned(setup: TriangleSetup, width: int, height: int,
                          plan: BinPlan, future_fn=None,
                          huge_cap: int = 1024,
                          max_visible: int | None = None,
                          span_w: int = SPAN_W, span_h: int = SPAN_H,
                          extra=None, payload_dyn_cols: int = 9):
    """bin_triangles with a carried BinPlan (see BinPlan docstring).

    future_fn: nullary callable -> (valid, pixel_bbox) of the SAME
    triangle list under a predicted-future camera; traced only inside
    the re-bin branch, so its cost is paid per re-bin, not per frame.
    Prediction quality only affects re-bin frequency — correctness is
    enforced by the per-frame cover check regardless.

    payload_dyn_cols: leading `extra` columns that are camera-dependent
    (the folded adjugate the fused raster prepends) and must be rebuilt
    every frame; the remaining columns must be FRAME-INVARIANT (vertex
    attribute corners, material constants) — the caller is responsible
    for disabling the plan when they are not (animation, ocean).

    Returns (packets, starts, huge_rows, huge_row_starts, plan_out,
    stats); stats gains "bin_rebin" (1 on re-bin frames).
    """
    tx = -(-width // TILE_W)
    ty = -(-height // TILE_H)
    T = setup.adj.shape[0]
    valid_now = setup.valid
    ctx0, cty0, ctx1, cty1 = _tile_rects(setup.bbox, width, height)

    # --- conservative cover check (cheap, every frame) ------------------
    cur = jnp.stack([ctx0, cty0, ctx1, cty1,
                     valid_now.astype(jnp.int32)], axis=1)
    pg = cur[plan.src]                                  # (Cp, 5) gather
    pv = pg[:, 4] > 0
    r = plan.rect
    viol_small = jnp.any(pv & ((pg[:, 0] < r[:, 0]) | (pg[:, 1] < r[:, 1])
                               | (pg[:, 2] > r[:, 2])
                               | (pg[:, 3] > r[:, 3])))
    hg = cur[plan.huge_src]                             # (alloc, 5)
    viol_huge = jnp.any((hg[:, 4] > 0)
                        & ((hg[:, 1] < plan.huge_cover[:, 0])
                           | (hg[:, 3] > plan.huge_cover[:, 1])))
    viol_new = jnp.any(valid_now & (plan.member == 0))
    need_rebin = viol_small | viol_huge | viol_new | (plan.flag[0] == 0)

    dyn_cols = 20 + payload_dyn_cols

    def rebin(_):
        if future_fn is None:
            valid_f, bbox_f = valid_now, setup.bbox
        else:
            valid_f, bbox_f = future_fn()
        ftx0, fty0, ftx1, fty1 = _tile_rects(bbox_f, width, height)
        big = jnp.int32(1 << 14)

        def umin(c, f):
            return jnp.clip(jnp.minimum(jnp.where(valid_now, c, big),
                                        jnp.where(valid_f, f, big)),
                            0, big)

        def umax(c, f, hi):
            return jnp.clip(jnp.maximum(jnp.where(valid_now, c, -1),
                                        jnp.where(valid_f, f, -1)),
                            -1, hi)

        rects = (umin(ctx0, ftx0), umin(cty0, fty0),
                 umax(ctx1, ftx1, tx - 1), umax(cty1, fty1, ty - 1))
        pk, st, hr, hs, plan_new, stats = _bin_core(
            setup, width, height, huge_cap, max_visible, span_w, span_h,
            extra, class_rects=rects, valid_any=valid_now | valid_f,
            valid_now=valid_now, emit_plan=True)
        stats["bin_rebin"] = jnp.int32(1)
        return pk, st, hr, hs, plan_new, stats

    def fast(_):
        # Per-frame lanes rebuilt by ONE narrow gather in plan order;
        # static lanes ride the carried payload image untouched.
        edge15 = setup.edge.reshape(T, 15)
        dyn_payload = extra[:, :payload_dyn_cols] if extra is not None \
            else jnp.zeros((T, payload_dyn_cols), jnp.float32)
        dyn = jnp.concatenate(
            [edge15, setup.zplane, setup.offset, dyn_payload,
             _tri_zmax(setup)[:, None]], axis=1)      # (T, dyn_cols+1)
        ds = jnp.nan_to_num(dyn[plan.src])            # (Cp, dyn_cols+1)
        alive = pv
        lane20 = jax.lax.broadcasted_iota(jnp.int32, (1, 20), 1)
        kill20 = jnp.where(lane20 == 2, -1.0, 0.0)
        head20 = jnp.where(alive[:, None], ds[:, :20], kill20)
        adj_dyn = jnp.where(alive[:, None],
                            ds[:, 20:dyn_cols], 0.0)
        zmax_col = jnp.where(alive, ds[:, dyn_cols], 0.0)[:, None]
        ux, uy = _chunk_union_cols(
            plan.src.shape[0], pg[:, 0], pg[:, 1], pg[:, 2], pg[:, 3],
            alive)
        pk = jnp.concatenate(
            [head20,
             plan.payload[:, 20:21],                       # triid
             adj_dyn,
             plan.payload[:, dyn_cols + 1:COL_ZMAX],       # static
             zmax_col,
             plan.payload[:, COL_ZMAX + 1:COL_UNION_X],    # zeros
             ux, uy], axis=1)

        # Huge stream: tiny population — rebuild fully via the carried
        # slot maps (alloc<=~1k rows + row-expansion gather).
        hraw = _build_packets(setup, extra, idx=plan.huge_src)
        hraw = jnp.nan_to_num(hraw[plan.huge_slot])
        halive = (valid_now[plan.huge_src])[plan.huge_slot]
        hrect = jnp.stack([ctx0, cty0, ctx1, cty1],
                          axis=1)[plan.huge_src][plan.huge_slot]
        hux, huy = _chunk_union_cols(
            plan.huge_slot.shape[0], hrect[:, 0], hrect[:, 1],
            hrect[:, 2], hrect[:, 3], halive)
        hr = _fold_union_cols(_kill_dead_rows(hraw, halive), hux, huy)
        stats = {"visible_overflow": jnp.int32(0),
                 "exact_entries": jnp.int32(0),
                 "window_entries": jnp.int32(0),
                 "huge_overflow": jnp.int32(0),
                 "bin_rebin": jnp.int32(0)}
        return pk, plan.starts, hr, plan.huge_starts, plan, stats

    return jax.lax.cond(need_rebin, rebin, fast, None)


CHUNK = 16               # packets per DMA (16 x 512B = 8KB transfers)
MAX_ENTRIES_PER_TILE = 65536


def _raster_tile_kernel(starts_ref, huge_starts_ref,     # scalar prefetch
                        packets_hbm, huge_hbm,           # ANY/HBM inputs
                        depth_out, tri_out,              # VMEM outputs
                        pkt_scratch, dma_sems,           # scratch
                        depth_s, tri_s,
                        *, tiles_x: int, tiles_y: int,
                        span_w: int, span_h: int):
    tile = pl.program_id(0)
    ty = tile // tiles_x
    tx = tile % tiles_x

    # Pixel-center coordinates of this tile (int iota: Mosaic requirement).
    px = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
          .astype(jnp.float32) + ((tx * TILE_W).astype(jnp.float32) + 0.5))
    py = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + ((ty * TILE_H).astype(jnp.float32) + 0.5))

    depth_s[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    tri_s[:] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

    def process_chunk(c):
        """Rasterize one (CHUNK, 24) packet block.

        Unrolled per-triangle: every op is a (TILE_H, TILE_W) VPU
        elementwise with scalar coefficients (no >2D gathers — Mosaic
        supports only 2D gather).  First-hit-wins on depth ties to match
        the scan rasterizer's argmax semantics.
        """
        depth_cur = depth_s[:]
        tri_cur = tri_s[:]
        tri_ids = jax.lax.bitcast_convert_type(c[:, 20], jnp.int32)
        for k in range(CHUNK):
            lam_ok = None
            for e in range(3):
                a = c[k, e * 5 + 0]
                b = c[k, e * 5 + 1]
                cc = c[k, e * 5 + 2]
                ex = c[k, e * 5 + 3]
                ey = c[k, e * 5 + 4]
                lam = a * (px - ex) + b * (py - ey) + cc
                top_left = (a > 0) | ((a == 0) & (b > 0))
                # select-on-bool is illegal in Mosaic; use boolean algebra:
                ok = (lam > 0) | (top_left & (lam == 0))
                lam_ok = ok if lam_ok is None else (lam_ok & ok)
            z = (c[k, 15] * (px - c[k, 18]) + c[k, 16] * (py - c[k, 19])
                 + c[k, 17])
            cover = lam_ok & (z >= 0.0) & (z <= 1.0)
            hit = cover & (z > depth_cur)
            depth_cur = jnp.where(hit, z, depth_cur)
            tri_cur = jnp.where(hit, tri_ids[k], tri_cur)
        depth_s[:] = depth_cur
        tri_s[:] = tri_cur

    def run_range(hbm_ref, start, count):
        # Safety cap: a pathological tile (everything projected onto one
        # spot) must not run for minutes and trip the TPU watchdog; the
        # reference's fixed-capacity per-tile bins drop excess the same
        # way under overload.  Overflow is observable host-side via the
        # per-bin range sizes (rasterize_binned stats).
        count = jnp.minimum(count, MAX_ENTRIES_PER_TILE)
        # 16-ALIGNED walk: the chunk-union bbox (COL_UNION_*) lives in
        # the first row of each aligned 16-row group; head rows outside
        # [start, start+count) are masked like the tail.
        astart = (start // CHUNK) * CHUNK
        head = start - astart
        # Empty ranges issue no DMA (cdiv(head, CHUNK) can be 1).
        n_chunks = jnp.where(count > 0, pl.cdiv(count + head, CHUNK), 0)

        def get_dma(buf, i):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(astart + i * CHUNK, CHUNK), :],
                pkt_scratch.at[buf],
                dma_sems.at[buf])

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

            def cond(state):
                i, stop = state
                return (i < n_chunks) & jnp.logical_not(stop)

            def body(state):
                i, _ = state
                buf = i % 2
                @pl.when(i + 1 < n_chunks)
                def _():
                    get_dma((i + 1) % 2, i + 1).start()
                get_dma(buf, i).wait()
                craw = pkt_scratch[buf]
                # Chunk-union tile bbox from the UNMASKED first row
                # (unions cover the whole aligned group, so they are
                # conservative for any sub-range) — skip the whole
                # 16-triangle eval when it cannot touch this tile.
                M = (1 << _UNION_SHIFT) - 1
                ux = craw[0, COL_UNION_X].astype(jnp.int32)
                uy = craw[0, COL_UNION_Y].astype(jnp.int32)
                hit_tile = ((ux & M) <= tx) \
                    & (tx <= (ux >> _UNION_SHIFT)) \
                    & ((uy & M) <= ty) & (ty <= (uy >> _UNION_SHIFT))
                # Mask head+tail rows outside [start, start+count).
                r = (jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, 1), 0)[:, 0] + i * CHUNK)
                valid_rows = (r >= head) & (r < head + count)
                c = jnp.where(valid_rows[:, None], craw, 0.0)

                @pl.when(hit_tile)
                def _():
                    process_chunk(c)
                # EARLY-Z: packets are front-to-back per bin (descending
                # conservative zmax); once every pixel's depth exceeds
                # this chunk's bound, no later triangle in the range can
                # pass the GREATER test.  Masked rows contribute a 0
                # bound — conservative.  The sort key quantizes zmax to
                # 2^-20, so a later row may exceed this bound by one
                # quantum: pad the bound by it.
                zb = jnp.max(c[:, COL_ZMAX]) + jnp.float32(ZQ_PAD)
                stop = zb <= jnp.min(depth_s[:])
                return (i + 1, stop)

            final_i, stopped = jax.lax.while_loop(
                cond, body, (jnp.int32(0), False))
            # Drain the speculative lookahead DMA of an early stop (an
            # unawaited semaphore would corrupt the next grid step).
            @pl.when(stopped & (final_i < n_chunks))
            def _():
                get_dma(final_i % 2, final_i).wait()

    # EXACT population first: single-tile triangles keyed at THIS tile
    # (bins [0, ntiles) of the composite starts array).
    ntiles_ = tiles_x * tiles_y
    b0 = ty * tiles_x + tx
    run_range(packets_hbm, starts_ref[b0],
              starts_ref[b0 + 1] - starts_ref[b0])
    # WINDOW population: a multi-tile triangle overlapping this tile was
    # binned at its top-left covered tile, which lies within the
    # (span_w, span_h) window up-left of us (bins [ntiles, 2*ntiles)).
    # Each bin is ONE contiguous packet range, internally front-to-back —
    # per-bin ranges (not whole window rows) keep the early-z bound
    # monotone within every run_range call.
    for wy in range(span_h):
        by = ty - wy
        for wx in range(span_w):
            bx = tx - wx

            @pl.when((by >= 0) & (bx >= 0))
            def _(by=by, bx=bx):
                b = ntiles_ + by * tiles_x + bx
                run_range(packets_hbm, starts_ref[b],
                          starts_ref[b + 1] - starts_ref[b])

    # huge stream: ONLY this tile's row's list (per-row binning).
    run_range(huge_hbm, huge_starts_ref[ty],
              huge_starts_ref[ty + 1] - huge_starts_ref[ty])

    depth_out[:] = depth_s[:]
    tri_out[:] = tri_s[:]


def rasterize_binned(setup: TriangleSetup, width: int, height: int,
                     huge_cap: int = 1024, interpret: bool | None = None,
                     max_visible: int | None = None,
                     span_w: int = SPAN_W, span_h: int = SPAN_H,
                     with_stats: bool = False):
    """Full binned rasterization.  Returns (depth (H, W), tri (H, W))
    [, stats dict if with_stats].

    span_w/span_h size the per-triangle bin window in tiles; triangles
    exceeding it go to the all-tiles huge list.  Views with many large
    triangles (ortho shadow maps of tall geometry) need a bigger window —
    an overloaded huge list makes every tile scan it and can run long
    enough to trip the TPU watchdog.

    stats: {"huge_overflow", "visible_overflow", "max_bin_entries"} —
    non-zero overflow means geometry was dropped (surface it; the
    reference never drops draws, render_queue.cpp:41-58).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tx = -(-width // TILE_W)
    ty = -(-height // TILE_H)
    ntiles = tx * ty
    pw = tx * TILE_W
    ph = ty * TILE_H

    packets, starts, huge_rows, huge_row_starts, stats = bin_triangles(
        setup, width, height, huge_cap, max_visible=max_visible,
        span_w=span_w, span_h=span_h)
    stats["max_bin_entries"] = jnp.max(starts[1:] - starts[:-1]) \
        .astype(jnp.int32)

    kernel = functools.partial(_raster_tile_kernel, tiles_x=tx,
                               tiles_y=ty, span_w=span_w, span_h=span_h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda i, *_: (i // (pw // TILE_W),
                                        i % (pw // TILE_W)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda i, *_: (i // (pw // TILE_W),
                                        i % (pw // TILE_W)),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, PACKET_F32), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.int32),
        ],
    )
    depth, tri = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.int32),
        ],
        interpret=interpret,
    )(starts, huge_row_starts, packets, huge_rows)
    if with_stats:
        return depth[:height, :width], tri[:height, :width], stats
    return depth[:height, :width], tri[:height, :width]
