#!/usr/bin/env python
"""Perf sweep harness (reference: tools/sweep_scene.py:17-42).

Runs the headless viewer once per config file for N iterations, reads the
stat JSON's averageFrameTimeUs, and reports mean/stdev per config.

  python tools/sweep_scene.py --scene s.gltf --configs a.json b.json \
      --iterations 3 --width 1280 --height 720 --frames 32
"""

import argparse
import json
import statistics
import subprocess
import sys
import tempfile


def run_once(args, config) -> float:
    with tempfile.NamedTemporaryFile(suffix=".json") as stat:
        cmd = [sys.executable, "-m", "granite_tpu.app.scene_viewer",
               "--width", str(args.width), "--height", str(args.height),
               "--frames", str(args.frames), "--time-step", "0.0166",
               "--stat", stat.name]
        if args.scene:
            cmd += ["--scene", args.scene]
        if config:
            cmd += ["--config", config]
        subprocess.run(cmd, check=True, capture_output=True)
        return json.load(open(stat.name))["averageFrameTimeUs"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=str, default=None)
    ap.add_argument("--configs", nargs="*", default=[None])
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args(argv)

    results = {}
    for config in args.configs:
        name = config or "<default>"
        times = [run_once(args, config) for _ in range(args.iterations)]
        results[name] = {
            "averageFrameTimeUs": statistics.mean(times),
            "stdev": statistics.stdev(times) if len(times) > 1 else 0.0,
            "iterations": times,
        }
        print(f"{name}: {statistics.mean(times):.1f} us "
              f"(+/- {results[name]['stdev']:.1f})")
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
