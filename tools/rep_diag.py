"""Rep-diag: split the bench-vs-ladder gap (272.9 vs 193.7 ms/frame,
round 3) into output-shipping vs protocol causes.

Times, on the SAME baked bench graph and identical inputs:
  A. app.render_frames_chained      (the bench path: backbuffer +
     donated history + checksum returned)
  B. execute_chain's jit with a SCALAR-only return (checksum only —
     the frame_probe ladder protocol)
  C. B but returning backbuffer too (isolates the 8 MB output cost)

Run ON TPU:  python tools/rep_diag.py [-k 12] [--width --height]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("-k", type=int, default=12)
    args = ap.parse_args()
    n = args.k

    import jax
    import jax.numpy as jnp

    cfg = {"renderer": "deferred", "hdrBloom": True,
           "shadowMapResolution": 2048}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name
    from granite_tpu.app.scene_viewer import SceneViewerApplication
    app = SceneViewerApplication(types.SimpleNamespace(
        scene=None, config=path, camera_index=-1, bench_scene=True))
    app.swapchain_updated(args.width, args.height)
    print("device:", jax.devices()[0], flush=True)

    def timed(label, fn, reps=2):
        fn()                                   # compile + warm
        best = None
        for _ in range(reps):
            t0 = time.monotonic_ns()
            fn()
            dt = (time.monotonic_ns() - t0) / 1e6 / n
            best = dt if best is None else min(best, dt)
        print(f"{label:56s} {best:8.2f} ms/frame", flush=True)
        return best

    # --- A: the bench path exactly --------------------------------------
    a = timed("A bench render_frames_chained (backbuffer+hist out)",
              lambda: np.asarray(app.render_frames_chained(
                  1 / 60, 2 / 60, n, camera_orbit=0.01)[0, 0:1]))

    # --- shared inputs for B/C: the same params/stacked the bench used --
    cached = app._param_cache
    static = dict(cached[1])
    static.pop("frame_time")
    stacked = {"frame_time": jnp.broadcast_to(jnp.float32(1 / 60), (n,))}
    stacked.update(app._orbit_cache[1])
    for k in app._orbit_cache[1]:
        static.pop(k, None)
    step = app.graph._step
    history0 = app.graph.initial_history()

    def chain_core(static, stacked, hist):
        head = jax.tree_util.tree_map(lambda x: x[:n - 1], stacked)

        def body(carry, fs):
            h, acc = carry
            o, nh = step({**static, **fs}, h)
            return (nh, acc + o.astype(jnp.float32).sum()), None

        (h2, acc), _ = jax.lax.scan(body, (hist, jnp.float32(0.0)), head)
        last = jax.tree_util.tree_map(lambda x: x[n - 1], stacked)
        out, _ = step({**static, **last}, h2)
        return acc, out

    fb = jax.jit(lambda s, t, h: chain_core(s, t, h)[0])
    timed("B ladder protocol (scalar checksum only)",
          lambda: np.asarray(fb(static, stacked, history0)))

    fc = jax.jit(lambda s, t, h: chain_core(s, t, h))
    timed("C ladder chain + full backbuffer output",
          lambda: np.asarray(fc(static, stacked, history0)[1][0, 0:1]))

    print(json.dumps({"bench": round(a, 2)}))


if __name__ == "__main__":
    main()
