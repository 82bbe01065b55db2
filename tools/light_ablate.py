"""Lighting-rung ablation: split the +118 ms/frame lighting cost
(honest round-4 orbit ladder, 1080p bench conditions) by config knob.

Runs the FULL bench graph end-to-end under the bench's own chained
protocol (12 frames, camera orbit 0.01, ONE scalar readback) for a set
of config variants, so deltas are in-context marginal costs (isolated
stage probes mis-predict by 2-100x; CLAUDE.md).  Single-feature deltas
carry +-3-5 ms compile-to-compile fusion variance — trust big numbers.

Run ON TPU:  python tools/light_ablate.py [-k 12] [--width --height]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

VARIANTS = [
    # Round-4 late set: the lighting rung is +48.3 ms at the compaction
    # bench config (ladder 127.8); split it by term.
    ("full (bench config)", {}),
    ("envSpecularHalfRes on (pending A/B)", {"envSpecularHalfRes": True}),
    ("directionalLightShadows off (sun PCF term)",
     {"directionalLightShadows": False}),
    ("clusteredLightsShadows off (half-res term cost)",
     {"clusteredLightsShadows": False}),
    ("envTileSampler off", {"envTileSampler": False}),
    # The base config (mirroring bench.py) already sets
    # shadowTermHalfRes=True, so the A/B must toggle it OFF.
    ("shadowTermHalfRes off (full-res sun term)",
     {"shadowTermHalfRes": False}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("-k", type=int, default=12)
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter on variant labels")
    args = ap.parse_args()
    n = args.k

    import jax

    print("device:", jax.devices()[0], flush=True)
    from granite_tpu.app.scene_viewer import SceneViewerApplication

    results = {}
    for label, overrides in VARIANTS:
        if args.only and args.only not in label:
            continue
        cfg = {"renderer": "deferred", "hdrBloom": True,
               "shadowMapResolution": 2048,
               "rasterMaxVisible": 163840,   # mirror bench.py's config
               "shadowTermHalfRes": True,
               **overrides}
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            json.dump(cfg, f)
            path = f.name
        app = SceneViewerApplication(types.SimpleNamespace(
            scene=None, config=path, camera_index=-1, bench_scene=True))
        app.swapchain_updated(args.width, args.height)
        t0 = time.monotonic()
        np.asarray(app.render_frames_chained(
            1 / 60, 1 / 60, n, camera_orbit=0.01)[0, 0:1])
        compile_s = time.monotonic() - t0
        best = None
        for _ in range(2):
            t0 = time.monotonic_ns()
            np.asarray(app.render_frames_chained(
                1 / 60, 2 / 60, n, camera_orbit=0.01)[0, 0:1])
            dt = (time.monotonic_ns() - t0) / 1e6 / n
            best = dt if best is None else min(best, dt)
        print(f"{label:44s} {best:8.2f} ms/frame   "
              f"[compile {compile_s:.0f}s]", flush=True)
        results[label] = round(best, 2)
        del app
    print(json.dumps(results))


if __name__ == "__main__":
    main()
