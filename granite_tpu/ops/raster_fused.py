"""Fused raster + visibility resolve — the TPU mega-kernel.

Extends the binned rasterizer (ops/raster_binned.py) so the per-pixel
RESOLVE happens inside the tile kernel instead of via per-pixel HBM
gathers (which cost ~22ms per 2M indices on the v5e regardless of
locality — CLAUDE.md gather economics):

  1. packets carry the full resolve payload (edges + z-plane + adjugate
     + 3 corner attribute rows + material constants) in their spare
     lanes — the 128-wide packet row was already padded;
  2. each tile DMAs its packet ranges into a VMEM table and rasterizes
     from it, tracking the winning TABLE SLOT per pixel;
  3. the winner's 64-lane payload is fetched for every pixel with a
     ONE-HOT dot_general on the MXU: onehot(win_slot) contracted with
     the packet table — the "gather" runs at matmul speed;
  4. perspective-correct interpolation + analytic UV derivatives run on
     the fetched planes in VMEM, and the kernel writes 32 attribute
     PLANES (attr-major (32, H, W) — no lane padding, ideal for the
     elementwise XLA shading that follows).

Plane layout (PLANE_*): depth, covered, world pos, normal, tangent4,
uv, duv/dx, duv/dy, base color factor, metallic/roughness, bundle id,
emissive, prev-frame pos (motion vectors).  Texture fetches stay in XLA
(the bundle array is HBM-resident).

Outputs bit-match the classic surface_attributes interpolation (tested
in interpret mode against it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import TriangleSetup
from .raster_binned import (
    CHUNK, PACKET_F32, SPAN_H, SPAN_W, TILE_H, TILE_W, bin_triangles,
)

# Packet payload columns (base layout cols 0..20 as raster_binned):
COL_ADJ = 21          # 9: adjugate rows
COL_CORNER = 30       # 36: 3 corners x (pos3, nrm3, tan4, uv2)
COL_BASE = 66         # 4: base color factor
COL_MR = 70           # 2
COL_BUNDLE = 72       # 1
COL_EMISSIVE = 73     # 3
COL_PREV = 76         # 9: 3 corners x prev world pos
EXTRA_COLS = 64       # payload lanes fetched by the one-hot matmul
PAYLOAD_LO = 21       # payload slice [PAYLOAD_LO, PAYLOAD_LO+64)

# Output plane indices (32 planes).
PLANE_DEPTH = 0
PLANE_COVERED = 1
PLANE_POS = 2         # 3
PLANE_NRM = 5         # 3
PLANE_TAN = 8         # 4
PLANE_UV = 12         # 2
PLANE_DUVDX = 14      # 2
PLANE_DUVDY = 16      # 2
PLANE_BASE = 18       # 4
PLANE_MR = 22         # 2
PLANE_BUNDLE = 24
PLANE_EMISSIVE = 25   # 3
PLANE_PREV = 28       # 3
NUM_PLANES = 32

# (Round-3 redesign: the old fixed-capacity VMEM packet table
# (MAX_TILE_E = 2048) silently dropped geometry on dense tiles — the
# bench's sphere cluster reaches >30k entries in one 32x128 tile at
# 1080p and >100k at 360p, so whole tiles lost their floor (the huge
# list filled last) and showed sky.  The kernel is now CAPACITY-FREE:
# pass 1 streams every packet chunk (double-buffered DMA, early-z
# termination on the front-to-back order), tracking the winning GLOBAL
# packet row per pixel; pass 2 re-streams only the chunks pass 1
# visited and accumulates the winner's payload with exact-id one-hot
# MXU matmuls.)


def build_resolve_extra(scene, world_pos, world_normal, world_tangent,
                        prev_world_pos=None):
    """(T, 55|64) per-triangle resolve payload appended to packets.

    Column layout matches COL_* minus the COL_ADJ origin (packets place
    this block starting at column 21; adj/offset already live in the
    base packet, so this starts at the corner block... no — adj is NOT
    in the base packet; it is part of this extra block)."""
    T_ = scene.indices.shape[0]
    attrs = [world_pos, world_normal, world_tangent, scene.uvs]
    if prev_world_pos is not None:
        attrs.append(prev_world_pos)
    vattrs = jnp.concatenate(attrs, axis=1)
    A = vattrs.shape[1]
    corner = vattrs[scene.indices]                  # (T, 3, A)
    base = corner[..., 0:12].reshape(T_, 36)
    mat = scene.tri_material
    cols = [base,
            scene.mat_base_color[mat],
            scene.mat_mr[mat],
            scene.mat_bundle[mat].astype(jnp.float32)[:, None],
            scene.mat_emissive[mat]]
    if prev_world_pos is not None:
        cols.append(corner[..., 12:15].reshape(T_, 9))
    return jnp.concatenate(cols, axis=1)


def _fused_kernel(starts_ref, huge_starts_ref,
                  packets_hbm, huge_hbm,
                  planes_out,
                  pkt_scratch, dma_sems, depth_s, win_s, acc_s,
                  stops_smem,
                  *, tiles_x: int, n_tiles: int, span_w: int,
                  span_h: int, has_prev: bool, pass2: bool = True,
                  pass1: bool = True):
    from .raster_binned import COL_ZMAX, MAX_ENTRIES_PER_TILE, ZQ_PAD
    tile = pl.program_id(0)
    ty = tile // tiles_x
    tx = tile % tiles_x

    px = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
          .astype(jnp.float32) + ((tx * TILE_W).astype(jnp.float32) + 0.5))
    py = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + ((ty * TILE_H).astype(jnp.float32) + 0.5))

    depth_s[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    win_s[:] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)   # -1=background

    if not pass1:
        # Probe mode (GRANITE_RASTER_BIN_ONLY): no packet streaming at
        # all — the ladder's g-base rung then measures transform +
        # setup + binning + sort alone (pallas_call is opaque to XLA,
        # so the binning inputs still compute).  NOT a rendering mode.
        for p in range(NUM_PLANES):
            planes_out[p] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        return

    # Huge-list winners get global ids offset past the small array.
    HUGE_BASE = packets_hbm.shape[0]

    def ranges():
        """(wy, wx, slot) per window bin; slot EXACT_SLOT is the
        single-tile exact bin, slot HUGE_SLOT the huge stream.

        A multi-tile triangle overlapping this tile was binned at its
        top-left covered tile — within the (span_w, span_h) window
        up-left; single-tile triangles live in the exact bins [0,
        ntiles) of the composite starts array (bin_triangles)."""
        out = []
        slot = 0
        for wy in range(span_h):
            for wx in range(span_w):
                out.append((wy, wx, slot))
                slot += 1
        return out

    def walk(hbm_ref, start, count, gid_base, on_chunk, n_chunks_cap):
        """Stream [start, start+count) in 16-ALIGNED CHUNK rows with
        double-buffered DMA; on_chunk(i, c, gid0, hit_tile) returns
        stop (early-z).  gid_base must be the UNALIGNED range start's
        global-id base; row ids follow the aligned grid.  Head/tail
        rows outside the range are zero-masked; hit_tile is the
        chunk-union bbox test (see raster_binned.COL_UNION_*).
        Returns chunks processed."""
        from .raster_binned import COL_UNION_X, COL_UNION_Y, _UNION_SHIFT
        count = jnp.minimum(count, MAX_ENTRIES_PER_TILE)
        astart = (start // CHUNK) * CHUNK
        head = start - astart
        agid = gid_base - head
        # Empty ranges must issue NO DMA (cdiv(head, CHUNK) can be 1,
        # and a winner-window start for an empty window is a sentinel
        # far outside the array).
        n_chunks = jnp.where(count > 0,
                             jnp.minimum(pl.cdiv(count + head, CHUNK),
                                         n_chunks_cap), 0)

        def get_dma(buf, i):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(astart + i * CHUNK, CHUNK), :],
                pkt_scratch.at[buf],
                dma_sems.at[buf])

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
            M = (1 << _UNION_SHIFT) - 1
            ux = craw[0, COL_UNION_X].astype(jnp.int32)
            uy = craw[0, COL_UNION_Y].astype(jnp.int32)
            hit_tile = ((ux & M) <= tx) \
                & (tx <= (ux >> _UNION_SHIFT)) \
                & ((uy & M) <= ty) & (ty <= (uy >> _UNION_SHIFT))
            r = (jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, 1), 0)[:, 0] + i * CHUNK)
            valid_rows = (r >= head) & (r < head + count)
            c = jnp.where(valid_rows[:, None], craw, 0.0)
            # asarray: a Python-bool stop (pass 2 never stops early)
            # must still lower as i1 in the while carry (Mosaic).
            stop = jnp.asarray(
                on_chunk(i, c, agid + i * CHUNK, hit_tile),
                dtype=jnp.bool_)
            return (i + 1, stop)

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()
        fi, stopped = jax.lax.while_loop(
            cond, body, (jnp.int32(0), n_chunks <= 0))
        # Drain the speculative lookahead DMA of an early stop (an
        # unawaited semaphore would corrupt the next grid step).
        @pl.when(stopped & (fi < n_chunks) & (fi > 0))
        def _():
            get_dma(fi % 2, fi).wait()
        return fi

    # ---- PASS 1: raster every chunk, winner = global packet row --------
    def raster_chunk(i, c, gid0, hit_tile):
        @pl.when(hit_tile)
        def _():
            depth_cur = depth_s[:]
            win_cur = win_s[:]
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
                    ok = (lam > 0) | (top_left & (lam == 0))
                    lam_ok = ok if lam_ok is None else (lam_ok & ok)
                z = (c[k, 15] * (px - c[k, 18])
                     + c[k, 16] * (py - c[k, 19]) + c[k, 17])
                cover = lam_ok & (z >= 0.0) & (z <= 1.0)
                hit = cover & (z > depth_cur)
                depth_cur = jnp.where(hit, z, depth_cur)
                win_cur = jnp.where(hit, gid0 + k, win_cur)
            depth_s[:] = depth_cur
            win_s[:] = win_cur
        # EARLY-Z (see raster_binned): front-to-back order makes the
        # chunk's conservative bound monotone within the bin range
        # (padded by one zq quantum — the sort key rounds zmax).
        return (jnp.max(c[:, COL_ZMAX]) + jnp.float32(ZQ_PAD)) \
            <= jnp.min(depth_s[:])

    EXACT_SLOT = span_h * span_w
    HUGE_SLOT = EXACT_SLOT + 1
    # EXACT population: single-tile triangles keyed at THIS tile.
    e_start = starts_ref[ty * tiles_x + tx]
    e_count = starts_ref[ty * tiles_x + tx + 1] - e_start
    done = walk(packets_hbm, e_start, e_count, e_start, raster_chunk,
                jnp.int32(MAX_ENTRIES_PER_TILE // CHUNK))
    stops_smem[EXACT_SLOT] = done
    # WINDOW population (bins offset by ntiles in the composite array).
    for wy, wx, slot in ranges():
        by = ty - wy
        bx = tx - wx
        b = n_tiles + jnp.maximum(by, 0) * tiles_x + jnp.maximum(bx, 0)
        start = starts_ref[b]
        count = jnp.where((by >= 0) & (bx >= 0),
                          starts_ref[b + 1] - start, 0)
        done = walk(packets_hbm, start, count, start, raster_chunk,
                    jnp.int32(MAX_ENTRIES_PER_TILE // CHUNK))
        stops_smem[slot] = done
    # huge stream: ONLY this tile's row's list (per-row binning); gids
    # offset into the row-expanded array stay unique within the tile.
    h_start = huge_starts_ref[ty]
    h_count = huge_starts_ref[ty + 1] - h_start
    done = walk(huge_hbm, h_start, h_count, HUGE_BASE + h_start,
                raster_chunk, jnp.int32(MAX_ENTRIES_PER_TILE // CHUNK))
    stops_smem[HUGE_SLOT] = done

    # ---- PASS 2: exact-id one-hot payload accumulation ------------------
    # Winners can only live in chunks pass 1 visited (early-stopped
    # chunks all lost the depth test), so each range re-streams at most
    # stops_smem[slot] chunks.  Fully-background tiles (sky) skip the
    # whole pass — nothing can match the -1 winners.
    if not pass2:
        # Probe mode (GRANITE_RASTER_PASS1_ONLY): depth/coverage only —
        # the hardware ladder's split of pass-1 raster cost vs pass-2
        # payload+interp cost.  NOT a rendering mode.
        planes_out[PLANE_DEPTH] = depth_s[:]
        planes_out[PLANE_COVERED] = (win_s[:] != -1).astype(jnp.float32)
        for p in range(2, NUM_PLANES):
            planes_out[p] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        return
    acc_s[:] = jnp.zeros((EXTRA_COLS, TILE_H * TILE_W), jnp.float32)
    idx_flat = win_s[:].reshape(1, TILE_H * TILE_W)        # (1, P)
    any_win = jnp.max(win_s[:]) >= 0

    def winner_window(start, count):
        """Tightest [row, row+count) window of this range's WINNING
        global ids — pass 2 only needs chunks containing winners, and
        the front-to-back order clusters them at the range head."""
        w = win_s[:]
        inr = (w >= start) & (w < start + count)
        big = jnp.int32(1 << 30)
        wmin = jnp.min(jnp.where(inr, w, big))
        wmax = jnp.max(jnp.where(inr, w, -1))
        return wmin, jnp.maximum(wmax - wmin + 1, 0)

    def payload_chunk(i, c, gid0, hit_tile):
        @pl.when(hit_tile)
        def _():
            ids = (jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, TILE_H * TILE_W), 0) + gid0)
            match = (ids == idx_flat).astype(jnp.float32)   # (CHUNK, P)
            w = c[:, PAYLOAD_LO:PAYLOAD_LO + EXTRA_COLS]    # (CHUNK, 64)
            acc_s[:] = acc_s[:] + jax.lax.dot_general(
                w, match, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (64, P)
        return False

    @pl.when(any_win)
    def _():
        e_start = starts_ref[ty * tiles_x + tx]
        e_count = starts_ref[ty * tiles_x + tx + 1] - e_start
        w0, wc = winner_window(e_start, e_count)
        walk(packets_hbm, w0, wc, w0, payload_chunk,
             stops_smem[EXACT_SLOT])
        for wy, wx, slot in ranges():
            by = ty - wy
            bx = tx - wx
            b = n_tiles + jnp.maximum(by, 0) * tiles_x \
                + jnp.maximum(bx, 0)
            start = starts_ref[b]
            count = jnp.where((by >= 0) & (bx >= 0),
                              starts_ref[b + 1] - start, 0)
            w0, wc = winner_window(start, count)
            walk(packets_hbm, w0, wc, w0, payload_chunk,
                 stops_smem[slot])
        h_start = huge_starts_ref[ty]
        h_count = huge_starts_ref[ty + 1] - h_start
        # huge gids are offset by HUGE_BASE; map back to array rows.
        w0, wc = winner_window(HUGE_BASE + h_start, h_count)
        walk(huge_hbm, w0 - HUGE_BASE, wc, w0, payload_chunk,
             stops_smem[HUGE_SLOT])

    v = acc_s[:].reshape(EXTRA_COLS, TILE_H, TILE_W)
    # Payload columns relative to PAYLOAD_LO (=21):
    # [0:9] adj | [9:45] corners | [45:49] base | [49:51] mr |
    # [51] bundle | [52:55] emissive | [55:64] prev corners
    # NOTE: offset (packet cols 18:20) is NOT in the payload window; the
    # adjugate is evaluated about the per-triangle origin, so we need it:
    # re-fetch via a second tiny one-hot?  No — fold: the raster loop
    # already evaluated z about the offset; for interpolation we fetch
    # offset through two extra payload lanes mirrored at build time
    # (extra cols 62:64 when prev is absent).  To keep one layout, the
    # packet builder ALWAYS mirrors offset into cols 85:87... simpler:
    # adj is affine in (px,py); the builder pre-folds the offset into
    # adj's constant term: lam = a*(px-ox)+b*(py-oy)+c
    #                           = a*px + b*py + (c - a*ox - b*oy).
    adj_a = [v[0], v[3], v[6]]
    adj_b = [v[1], v[4], v[7]]
    adj_c = [v[2], v[5], v[8]]
    lam = [adj_a[i] * px + adj_b[i] * py + adj_c[i] for i in range(3)]
    D = lam[0] + lam[1] + lam[2]
    Dx = adj_a[0] + adj_a[1] + adj_a[2]
    Dy = adj_b[0] + adj_b[1] + adj_b[2]
    D = jnp.where(jnp.abs(D) < 1e-20, 1e-20, D)
    inv_d = 1.0 / D

    covered = (win_s[:] != -1).astype(jnp.float32)

    def interp(c0, c1, c2):
        n = lam[0] * c0 + lam[1] * c1 + lam[2] * c2
        return n * inv_d

    def interp_derivs(c0, c1, c2):
        n = lam[0] * c0 + lam[1] * c1 + lam[2] * c2
        nx = adj_a[0] * c0 + adj_a[1] * c1 + adj_a[2] * c2
        ny = adj_b[0] * c0 + adj_b[1] * c1 + adj_b[2] * c2
        val = n * inv_d
        ddx = (nx - val * Dx) * inv_d
        ddy = (ny - val * Dy) * inv_d
        return val, ddx, ddy

    planes_out[PLANE_DEPTH] = depth_s[:]
    planes_out[PLANE_COVERED] = covered
    for a in range(12):
        c0 = v[9 + a]
        c1 = v[9 + 12 + a]
        c2 = v[9 + 24 + a]
        if a < 10:                              # pos, nrm, tan
            planes_out[PLANE_POS + a] = interp(c0, c1, c2)
        else:                                   # uv + derivatives
            val, ddx, ddy = interp_derivs(c0, c1, c2)
            u_off = a - 10
            planes_out[PLANE_UV + u_off] = val
            planes_out[PLANE_DUVDX + u_off] = ddx
            planes_out[PLANE_DUVDY + u_off] = ddy
    for a in range(4):
        planes_out[PLANE_BASE + a] = v[45 + a]
    planes_out[PLANE_MR] = v[49]
    planes_out[PLANE_MR + 1] = v[50]
    planes_out[PLANE_BUNDLE] = v[51]
    for a in range(3):
        planes_out[PLANE_EMISSIVE + a] = v[52 + a]
    if has_prev:
        for a in range(3):
            planes_out[PLANE_PREV + a] = interp(v[55 + a], v[58 + a],
                                                v[61 + a])
    else:
        for a in range(3):
            planes_out[PLANE_PREV + a] = jnp.zeros((TILE_H, TILE_W),
                                                   jnp.float32)
    planes_out[NUM_PLANES - 1] = jnp.zeros((TILE_H, TILE_W), jnp.float32)


def rasterize_resolve(setup: TriangleSetup, extra, width: int,
                      height: int, huge_cap: int = 1024,
                      interpret: bool | None = None,
                      span_w: int = SPAN_W, span_h: int = SPAN_H,
                      has_prev: bool = False,
                      max_visible: int | None = None,
                      plan=None, future_fn=None):
    """Fused binned raster + resolve.  Returns planes (32, H, W) f32,
    or (planes, plan_out) when a BinPlan is passed.

    extra: (T, 46|55) payload from build_resolve_extra (corners +
    material constants); the offset-folded adjugate is prepended here.

    max_visible: optional visibility-compaction capacity (shrinks the
    per-frame argsort to the post-cull survivor count; overflow DROPS
    geometry and is counted in stats — see bin_triangles).

    plan/future_fn: cached-binning path (raster_binned.BinPlan) — the
    per-frame argsort + packet gather run only when the carried plan's
    cover check fails; `extra` columns must be frame-invariant then
    (the adjugate prefix this function prepends is rebuilt per frame).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tx = -(-width // TILE_W)
    ty = -(-height // TILE_H)
    ntiles = tx * ty
    pw = tx * TILE_W
    ph = ty * TILE_H

    T_ = setup.adj.shape[0]
    adj9 = fold_adjugate(setup).reshape(T_, 9)
    payload = jnp.concatenate([adj9, extra], axis=1)
    if payload.shape[1] < EXTRA_COLS:
        payload = jnp.concatenate(
            [payload, jnp.zeros((T_, EXTRA_COLS - payload.shape[1]),
                                jnp.float32)], axis=1)

    plan_out = None
    if plan is not None:
        from .raster_binned import bin_triangles_planned
        (packets, starts, huge_rows, huge_row_starts, plan_out,
         stats) = bin_triangles_planned(
            setup, width, height, plan, future_fn, huge_cap,
            max_visible, span_w, span_h, extra=payload,
            payload_dyn_cols=9)
    else:
        packets, starts, huge_rows, huge_row_starts, stats = \
            bin_triangles(
                setup, width, height, huge_cap, span_w=span_w,
                span_h=span_h, extra=payload, max_visible=max_visible)

    import os as _os
    kernel = functools.partial(
        _fused_kernel, tiles_x=tx, n_tiles=ntiles, span_w=span_w,
        span_h=span_h, has_prev=has_prev,
        pass2=not _os.environ.get("GRANITE_RASTER_PASS1_ONLY"),
        pass1=not _os.environ.get("GRANITE_RASTER_BIN_ONLY"))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (NUM_PLANES, TILE_H, TILE_W),
            lambda i, *_: (0, i // (pw // TILE_W), i % (pw // TILE_W)),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, PACKET_F32), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.int32),
            pltpu.VMEM((EXTRA_COLS, TILE_H * TILE_W), jnp.float32),
            pltpu.SMEM((span_h * span_w + 2,), jnp.int32),
        ],
    )
    planes = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_PLANES, ph, pw), jnp.float32),
        interpret=interpret,
    )(starts, huge_row_starts, packets, huge_rows)
    planes = planes[:, :height, :width]
    if plan is not None:
        return planes, plan_out
    return planes


def fold_adjugate(setup: TriangleSetup):
    """Adjugate with the per-triangle origin folded into the constant
    term: lam = a*(px-ox) + b*(py-oy) + c  ==  a*px + b*py + c' with
    c' = c - a*ox - b*oy.  Lets the kernel interpolate without the
    offset columns."""
    adj = setup.adj                                   # (T, 3, 3)
    ox = setup.offset[:, 0:1]
    oy = setup.offset[:, 1:2]
    c_folded = adj[..., 2] - adj[..., 0] * ox - adj[..., 1] * oy
    return jnp.concatenate(
        [adj[..., 0:1], adj[..., 1:2], c_folded[..., None]], axis=-1)
