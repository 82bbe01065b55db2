"""In-context per-stage frame costs via graph prefix re-bakes.

Isolated stage probes (tools/stage_probe.py) mis-predict the chained
frame: XLA fuses and schedules differently inside the real program
(measured round 2: per-stage sums were ~2x the end-to-end bench).
This tool measures the REAL thing: it re-bakes the bench graph with the
backbuffer source set to successive intermediate resources — dead-pass
elimination culls everything downstream — and times each prefix with
the bench's own chained protocol (12 frames under lax.scan, ONE scalar
readback).  Successive differences are true in-context marginal stage
costs.

Run ON TPU:  python tools/frame_probe.py [-k 12] [--width --height]
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

LADDER = [
    ("shadow-depth", "shadow map"),
    ("g-base", "+gbuffer (fused raster+resolve+material)"),
    ("hdr", "+lighting (sun/pcf/env/clustered)"),
    ("bloom-final", "+bloom pyramid"),
    ("backbuffer", "+luminance+tonemap+encode"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("-k", type=int, default=12)
    ap.add_argument("--stop-after", default=None,
                    help="resource name: ladder only up to this rung "
                         "(cheap single-rung probes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cfg = {"renderer": "deferred", "hdrBloom": True,
           "shadowMapResolution": 2048,
           "rasterMaxVisible": 163840}     # mirror bench.py's config
    if os.environ.get("GRANITE_BENCH_CFG"):
        # Same A/B hook as bench.py: ladder any config variant.
        cfg.update(json.loads(os.environ["GRANITE_BENCH_CFG"]))
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name
    from granite_tpu.app.scene_viewer import SceneViewerApplication
    app = SceneViewerApplication(types.SimpleNamespace(
        scene=None, config=path, camera_index=-1, bench_scene=True))
    app.swapchain_updated(args.width, args.height)
    print("device:", jax.devices()[0], flush=True)

    # ROUND-4 FIX: build params with the app's OWN _build_frame_params,
    # not __graft_entry__._frame_inputs — the entry builder omits
    # env_tiled_strip / cluster_shadow_atlas / static-VSM, so the old
    # ladder silently measured a LIGHTER frame than the bench runs
    # (123.3 vs 188.5 ms/frame protocol-equivalent, the round-3
    # "bench-vs-ladder gap").  _build_frame_params also renders the
    # static shadow once via the host-side cache, exactly like bench.
    params = dict(app._build_frame_params(1 / 60, 0.1))
    n = args.k
    stacked = {"frame_time": jnp.broadcast_to(jnp.float32(1 / 60), (n,))}
    static = dict(params)
    static.pop("frame_time", None)
    # ORBIT the camera per frame (round-3 hoist finding): a static
    # camera makes every prefix loop-invariant and XLA hoists it out of
    # the scan — the round-2 ladder measured hoistability, not cost.
    app.stack_orbit_params(static, stacked, n, 0.01)

    g = app.graph
    prev = None
    results = []
    for res, label in LADDER:
        if res not in g._resources:
            print(f"{label:48s}  (resource absent, skipped)", flush=True)
            continue
        g.set_backbuffer_source(res)
        g.bake()
        step = g._step
        history = g.initial_history()

        def chain(static, stacked, hist, step=step):
            head = jax.tree_util.tree_map(lambda x: x[:n - 1], stacked)

            def body(carry, fs):
                h, acc = carry
                o, nh = step({**static, **fs}, h)
                # accumulate each frame's output in the carry: without
                # this, prefixes with no history resources have dead
                # scan bodies (XLA removes frames 1..n-1 entirely) and
                # the measurement silently becomes single-frame/n.
                return (nh, acc + o.astype(jnp.float32).sum()), None

            (hist2, acc), _ = jax.lax.scan(body, (hist, jnp.float32(0.0)),
                                           head)
            last = jax.tree_util.tree_map(lambda x: x[n - 1], stacked)
            out, _ = step({**static, **last}, hist2)
            return acc + out.astype(jnp.float32).sum()

        fn = jax.jit(chain)
        t0 = time.monotonic()
        np.asarray(fn(static, stacked, history))       # compile + warm
        compile_s = time.monotonic() - t0
        t0 = time.monotonic_ns()
        np.asarray(fn(static, stacked, history))
        ms = (time.monotonic_ns() - t0) / 1e6 / n
        marg = ms - prev if prev is not None else ms
        print(f"{label:48s} {ms:8.2f} ms/frame   (+{marg:6.2f})"
              f"   [compile {compile_s:.0f}s]", flush=True)
        results.append((res, ms))
        prev = ms
        if args.stop_after and res == args.stop_after:
            break

    # restore the real backbuffer
    g.set_backbuffer_source("backbuffer")
    g.bake()
    print(json.dumps({r: round(m, 2) for r, m in results}))


if __name__ == "__main__":
    main()
