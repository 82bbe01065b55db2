"""Driver benchmark: prints ONE JSON line with the headline metric.

Workload = BASELINE config 3: the Sponza-class synthetic scene (~260k
tris, see granite_tpu/app/bench_scene.py) through the full deferred HDR
graph (shadow 2048^2, G-buffer, clustered lights, bloom pyramid, async
luminance exposure, filmic tonemap) at 1080p on the real chip.

The metric is ms/frame; `vs_baseline` is frame_time / 10ms — the fraction
of the BASELINE.md budget used (<1.0 means beating the target).
"""

from __future__ import annotations

import json
import sys
import time
import types


def image_gate(img):
    """(ok, rgb plane means) for a rendered (H, W, 4) backbuffer.

    A black RGBA frame reads mean 63.75 through the alpha channel — the
    rgb PLANES are the only honest black/NaN signal (CLAUDE.md rule
    from the round-2 incident, automated per VERDICT weak #5)."""
    import numpy as np
    rgb = np.asarray(img, np.float32)[..., :3]
    means = [round(float(m), 2) for m in rgb.mean(axis=(0, 1))]
    ok = bool(np.isfinite(rgb).all()
              and all(1.0 < m < 250.0 for m in means))
    return ok, means


def bench_deferred_hdr(width=1920, height=1080, frames=12,
                       safe: bool = False):
    import json as _json
    import tempfile
    # PCF directional shadows (the reference default).  VSM + the
    # tiled moment sampler exists behind directionalLightShadowsVSM but
    # measured slower end-to-end this round (96.7 vs 85.9 ms) — the
    # shadow footprints' tall texel spans make the tile kernel scan
    # more rect rows than the PCF gather costs.
    cfg = {"renderer": "deferred", "hdrBloom": True,
           "shadowMapResolution": 2048,
           # Visibility compaction: the bench scene's cull census is
           # 126.5k valid of 258.8k tris (49%, stable under the orbit);
           # 163840 keeps 29% headroom and nearly halves the per-frame
           # composite-key argsort.  Measured 136.2 -> 127.9 ms/frame
           # with bit-identical plane means (no drops).
           "rasterMaxVisible": 163840,
           # Sun PCF term at half res + bilinear upsample: -9.6 ms/frame
           # (119.3 -> 109.7, round-4 light_ablate).  Same quality trade
           # the clustered-light shadow term already takes (default
           # half-res); 2-px quantization of shadow edge positions,
           # documented in PARITY.md.
           "shadowTermHalfRes": True}
    if safe:
        # Fallback mode (see main): newest Pallas paths off so a kernel
        # regression can never leave the round without a number.
        cfg["fusedShade"] = False
    import os as _os
    if _os.environ.get("GRANITE_BENCH_CFG"):
        # A/B hook: JSON config overrides merged on top of the bench
        # config (tools/hw_day experiments; never set by the driver).
        cfg.update(_json.loads(_os.environ["GRANITE_BENCH_CFG"]))
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        _json.dump(cfg, f)
        cfg_path = f.name
    from granite_tpu.app.scene_viewer import SceneViewerApplication
    args = types.SimpleNamespace(scene=None, config=cfg_path,
                                 camera_index=-1, bench_scene=True)
    import numpy as np
    app = SceneViewerApplication(args)
    app.swapchain_updated(width, height)
    # Warmup/compile: the chain (graph.execute_chain) is the ONLY
    # executable this process compiles — param building is host-only
    # (scene_viewer._build_frame_params), which halves cold-start vs
    # also compiling the per-frame step (the Fossilize lesson).
    # block_until_ready() does NOT wait on the axon tunnel (CLAUDE.md)
    # — a tiny readback is the only true fence.
    # camera_orbit: the HONESTY knob — with a fully static frame XLA
    # hoists the loop-invariant render out of the scan and a 12-frame
    # chain times ~1 frame of work (round-3 finding; see
    # render_frames_chained docstring).  A real viewer's camera moves
    # every frame; 0.01 rad/frame keeps frame-0 culling valid.
    ORBIT = 0.01
    t_c0 = time.monotonic_ns()
    np.asarray(app.render_frames_chained(
        1 / 60, 1 / 60, frames, camera_orbit=ORBIT)[0, 0:1])
    compile_s = (time.monotonic_ns() - t_c0) / 1e9
    t0 = time.monotonic_ns()
    out = app.render_frames_chained(1 / 60, 2 / 60, frames,
                                    camera_orbit=ORBIT)
    np.asarray(out[0, 0:1])
    dt_ms = (time.monotonic_ns() - t0) / 1e6 / frames
    print(json.dumps({"compileTimeS": round(compile_s, 1)},
                     ), file=sys.stderr)
    # Hardware image-validity gate (the round-2 black-frame incident,
    # automated): rgb-plane means + NaN scan of the timed frame, one
    # untimed readback.  A bench number for a broken image is worse
    # than no number.
    image_ok, means = image_gate(np.asarray(out))
    return {
        "metric": "frame_time_ms_deferred_hdr_sponza_class_1080p",
        "value": round(dt_ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(dt_ms / 10.0, 4),
        "imageOk": image_ok,
        "planeMeans": means,
        "safeMode": safe,
        # Warm-start trend (VERDICT r3 #7): cold-process compile cost is
        # driver-recorded so rounds can compare.  Chain-only compilation
        # keeps this to ONE executable.
        "compileTimeS": round(compile_s, 1),
    }


PROBE_SRC = (
    "import jax, numpy as np\n"
    "x = jax.jit(lambda a: a * 2)(np.ones((8, 128), np.float32))\n"
    "print('probe ok', np.asarray(x[0, 0:1]))\n"
)


def tunnel_probe(timeout_s: float = 150.0, budget_s: float = 2700.0,
                 backoff_s: float = 30.0) -> bool:
    """1-op jit in a subprocess, retried against a WALL-CLOCK budget.

    Round-3 lesson (BENCH_r03 rc=124): with the axon tunnel dead, the
    first real compile hangs/burns ~25 min and the driver's whole
    window times out with nothing diagnostic recorded.  Probe first;
    on failure the caller prints a parseable error line and exits
    non-zero.

    Round-4 lesson (BENCH_r04 rc=1): 3 attempts x 120 s gave up after
    ~8.5 minutes of a MULTI-HOUR driver window and lost the round's
    only perf number to a transient outage.  The probe now persists:
    retry every ~2.5-3 min for up to `budget_s` (default 45 min)
    before declaring the tunnel dead.  The tunnel serves ONE client;
    a probe racing a previous process's teardown times out
    TRANSIENTLY, and mid-round outages have recovered within tens of
    minutes (round-4 hardware day) — patience is cheap, a lost round
    is not."""
    import subprocess
    import time as _time
    deadline = _time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run([sys.executable, "-c", PROBE_SRC],
                                  capture_output=True, text=True,
                                  timeout=timeout_s)
            if "probe ok" in (proc.stdout or ""):
                if attempt > 1:
                    print(f"tunnel probe ok on attempt {attempt}",
                          file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - _time.monotonic()
        if remaining <= backoff_s:
            return False
        print(f"tunnel probe attempt {attempt} failed; "
              f"{remaining / 60:.1f} min of budget left", file=sys.stderr)
        _time.sleep(backoff_s)


def main() -> int:
    import os
    import subprocess
    safe = os.environ.get("GRANITE_BENCH_SAFE") == "1"
    if not safe and not tunnel_probe():
        # Dead tunnel: fail fast with a diagnostic JSON tail the driver
        # records, instead of timing out rc=124 with nothing.
        print(json.dumps({"error": "tunnel-unavailable",
                          "detail": "1-op jit probe failed for 45 min"}))
        return 1
    try:
        result = bench_deferred_hdr(safe=safe)
        failed = not result.get("imageOk", True)
    except Exception as e:                      # noqa: BLE001
        print(f"bench run failed: {e!r}", file=sys.stderr)
        result, failed = None, True
    if failed and not safe:
        # A kernel fault must never leave the round without a number
        # (the round-2 rc=1 lesson): retry ONCE in a fresh process with
        # the newest Pallas paths disabled.
        print("retrying in safe mode (fusedShade off)", file=sys.stderr)
        env = dict(os.environ, GRANITE_BENCH_SAFE="1")
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env)
        return proc.returncode
    if result is None:
        return 1
    print(json.dumps(result))
    return 0 if result.get("imageOk", True) else 1


if __name__ == "__main__":
    sys.exit(main())
