"""Hardware bisect of the chained bloom-block cost (round-3 ledger:
bloom owns ~136 ms of the 179.6 ms chained frame vs 4.7 ms standalone).

Runs the EXACT bench protocol (bench.py conditions: bench scene,
deferred HDR, 2048^2 shadow, 1080p, 12-frame chain, one scalar
readback) with a truncated bloom pyramid (hdrBloomDepth knob) or extra
config overrides from argv.

Usage:  python tools/bloom_sweep.py <depth> [k=v ...]
        python tools/bloom_sweep.py 0
        python tools/bloom_sweep.py 6 hdrBloomDynamicExposure=false
"""

import json
import os
import sys
import tempfile
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    cfg = {"renderer": "deferred", "hdrBloom": True,
           "shadowMapResolution": 2048, "hdrBloomDepth": depth}
    frames = 12
    seq = False
    orbit = 0.0
    ablate = None
    for kv in sys.argv[2:]:
        k, v = kv.split("=", 1)
        if k == "frames":
            frames = int(v)
        elif k == "seq":
            seq = json.loads(v)
        elif k == "orbit":
            orbit = float(v)
        elif k == "ablate":
            ablate = v          # env | lights | shadows
        else:
            cfg[k] = json.loads(v)
    if ablate == "shadows":
        cfg["directionalLightShadows"] = False
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name
    from granite_tpu.app.scene_viewer import SceneViewerApplication
    app = SceneViewerApplication(types.SimpleNamespace(
        scene=None, config=path, camera_index=-1, bench_scene=True))
    # Lighting-attribution ablations (patch BEFORE the graph bakes).
    if ablate == "env":
        orig = app._light_kwargs

        def no_env(ctx):
            kw = orig(ctx)
            kw["env"] = None
            return kw
        app._light_kwargs = no_env
    elif ablate == "lights":
        for nd in app.info.nodes:
            if nd.light is not None and \
                    app.info.lights[nd.light].type != 0:
                nd.light = None
    app.swapchain_updated(1920, 1080)
    t0 = time.monotonic_ns()
    if seq:
        # Per-frame dispatch (swapchain-readback-per-frame analogue):
        # measures the true unchained frame incl. per-call output cost.
        np.asarray(app.render_frame(1 / 60, 1 / 60)[0, 0:1])
        compile_s = (time.monotonic_ns() - t0) / 1e9
        t0 = time.monotonic_ns()
        for i in range(frames):
            out = app.render_frame(1 / 60, (2 + i) / 60)
        np.asarray(out[0, 0:1])
    else:
        np.asarray(app.render_frames_chained(
            1 / 60, 1 / 60, frames, camera_orbit=orbit)[0, 0:1])
        compile_s = (time.monotonic_ns() - t0) / 1e9
        t0 = time.monotonic_ns()
        out = app.render_frames_chained(1 / 60, 2 / 60, frames,
                                        camera_orbit=orbit)
        np.asarray(out[0, 0:1])
    ms = (time.monotonic_ns() - t0) / 1e6 / frames
    print(json.dumps({"depth": depth, "overrides": sys.argv[2:],
                      "ms_per_frame": round(ms, 2),
                      "compile_s": round(compile_s, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
