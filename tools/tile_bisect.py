#!/usr/bin/env python
"""Tile-level bisect harness for the tile-rect sampler (forensics).

Born from the late-round-2 incident: a few material-sampler tiles
produced NaN texels at the 510-tile 1080p grid (clean at 60 tiles and
in CPU interpret), which the containment clamp zeroed and the
auto-exposure then spread into black frames — and in the driver's run
the TPU worker died outright.  Root cause: the scalar-prefetch info
table (ntiles x 64 i32 = 127.6 KiB at 510 tiles) collided with SMEM
capacity; the fix streams the table as a per-tile SMEM block.

Root cause (found round 3, via this harness's masked-input cases): a
tile whose second slot is EMPTY (slot1 bundle == -1 — fewer than two
material bundles present) but which contains uncovered pixels planned
live band spans for slot1, because the planner mask `bt == bk` with
bk == -1 matched exactly the uncovered pixels.  The kernel then
scanned the never-DMA'd rect1 VMEM scratch with zero one-hot weights
— and 0 x NaN = NaN: stale NaN-patterned bits (or interpret mode's
deliberate NaN fill) poisoned the whole band accumulator.  Fixed in
plan_rects (mask &= bk >= 0); the SMEM streaming change stays as
defense in depth.

This harness keeps the forensic capability: it renders the SAME
sampler inputs through (a) the Pallas tile kernel on hardware and
(b) the known-good classic XLA gather path, compares per 32x128 tile,
and dumps the planning words of any mismatching tile.  Run it whenever
the sampler changes:

  python tools/tile_bisect.py --width 1920 --height 1080
  python tools/tile_bisect.py --tiles 37 added-42   # single-tile runs

Reference analogue: vulkan/breadcrumbs.hpp:38-110 (fault trail down to
the failing draw).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def synthetic_inputs(H, W, B, rng):
    """Smooth uv/lod fields + per-region bundle ids like a real frame:
    perspective-ish uv gradients, lod ramp 0..6, ~7% uncovered pixels."""
    import numpy as np
    yy, xx = np.meshgrid(np.arange(H) / H, np.arange(W) / W,
                         indexing="ij")
    u = (xx * 3.0 + 0.13 * np.sin(yy * 9.0)).astype(np.float32)
    v = (yy * 2.0 + 0.11 * np.cos(xx * 7.0)).astype(np.float32)
    lod = (6.0 * yy + 0.5 * np.sin(xx * 20)).clip(0, 9).astype(np.float32)
    cell = (yy * 7).astype(np.int32) * 5 + (xx * 5).astype(np.int32)
    bundle = (cell % B).astype(np.int32)
    holes = rng.rand(H, W) < 0.07
    bundle = np.where(holes, -1, bundle)
    return u, v, lod, bundle


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--size", type=int, default=512,
                    help="texture size (bench material bundles are 512)")
    ap.add_argument("--bundles", type=int, default=4)
    ap.add_argument("--channels", type=int, default=12)
    ap.add_argument("--tiles", type=str, default=None,
                    help="comma list of tile ids: run the kernel on a "
                         "one-tile-tall crop containing each (grid "
                         "bisection)")
    ap.add_argument("--tol", type=float, default=5e-3,
                    help="max |hardware - interpret| allowed per tile")
    ap.add_argument("--ref", choices=["interpret", "none"],
                    default="interpret",
                    help="'interpret' compares hardware vs interpret "
                         "mode (slow at 1080p); 'none' = NaN census + "
                         "classic-path stats only")
    args = ap.parse_args(argv)

    import numpy as np

    from granite_tpu.ops import texture as T
    from granite_tpu.ops.tile_sampler import (
        INFO_WORDS, PX_H, PX_W, build_tiled_strips_np, plan_rects,
        sample_tiled,
    )

    rng = np.random.RandomState(11)
    H, W, B, C = args.height, args.width, args.bundles, args.channels
    images = [rng.rand(args.size, args.size, C).astype(np.float32)
              for _ in range(B)]
    strips = build_tiled_strips_np(images)
    # classic path reference: quad-packed LOD strip bundles
    bundles_classic = np.stack(
        [T.build_packed_lod_strip_np(img, dtype="float32")
         for img in images])

    u, v, lod, bundle = synthetic_inputs(H, W, B, rng)

    import jax.numpy as jnp
    uj, vj, lj = map(jnp.asarray, (u, v, lod))
    bj = jnp.asarray(bundle)

    def run_region(uj, vj, lj, bj, label):
        h, w = uj.shape
        # PRIMARY comparison: Mosaic hardware compile vs interpret mode
        # of the SAME kernel — the incident signature was exactly
        # "interpret green, hardware NaN".  (On a CPU host both run
        # interpreted and this degenerates to a NaN census.)
        got = np.asarray(sample_tiled(strips, uj, vj, lj, bj))
        if args.ref == "interpret":
            want = np.asarray(sample_tiled(strips, uj, vj, lj, bj,
                                           interpret=True))
        else:
            want = got
        # informational: classic gather path (legitimately diverges via
        # bf16 storage + coarse-level fallback)
        classic = np.asarray(T.sample_packed_lod(
            jnp.asarray(bundles_classic), jnp.where(bj < 0, 0, bj),
            uj, vj, lj, C))
        classic = np.where(np.asarray(bj)[..., None] >= 0, classic, 0.0)
        gm = np.where(np.asarray(bj)[..., None] >= 0, got, 0.0)
        print(f"[{label}] |tiled - classic| mean "
              f"{np.abs(gm - classic).mean():.5f} max "
              f"{np.abs(gm - classic).max():.4f} (informational)")
        want = np.where(np.asarray(bj)[..., None] >= 0, want, 0.0)
        got = gm
        ty, tx = -(-h // PX_H), -(-w // PX_W)
        ph, pw = ty * PX_H, tx * PX_W
        d = np.zeros((ph, pw))
        d[:h, :w] = np.abs(got - want).max(axis=-1)
        nanmask = np.zeros((ph, pw), bool)
        nanmask[:h, :w] = ~np.isfinite(got).all(axis=-1)
        dt = d.reshape(ty, PX_H, tx, PX_W).transpose(0, 2, 1, 3)
        dt = dt.reshape(ty * tx, -1).max(axis=1)
        nt = nanmask.reshape(ty, PX_H, tx, PX_W).transpose(0, 2, 1, 3)
        nt = nt.reshape(ty * tx, -1).any(axis=1)
        info, _ = plan_rects(uj, vj, lj, bj, strips)
        info = np.asarray(info)
        bad = sorted(set(np.nonzero(nt)[0].tolist())
                     | set(np.nonzero(dt > args.tol)[0].tolist()))
        print(f"[{label}] grid {ty}x{tx} = {ty * tx} tiles | "
              f"max tile diff {dt.max():.4f} | NaN tiles {int(nt.sum())}"
              f" | bad tiles {len(bad)}")
        for t in bad[:16]:
            print(f"  tile {t} (row {t // tx}, col {t % tx}): "
                  f"maxdiff {dt[t]:.4f} nan={bool(nt[t])}")
            print(f"    info: {info[t].tolist()}")
        return bad

    if args.tiles:
        # bisection mode: crop to a single 32-row band per requested tile
        tx = -(-W // PX_W)
        bad_any = []
        for t in [int(x) for x in args.tiles.split(",")]:
            r, c = t // tx, t % tx
            sl = np.s_[r * PX_H:(r + 1) * PX_H,
                       c * PX_W:(c + 1) * PX_W]
            bad = run_region(uj[sl], vj[sl], lj[sl], bj[sl],
                             f"tile {t} solo")
            bad_any += bad
        return 1 if bad_any else 0

    bad = run_region(uj, vj, lj, bj, f"{W}x{H}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
