#!/usr/bin/env python
"""AA quality/perf sweep (reference: tools/aa_bench.cpp + tools/bench_aa.py).

Renders the same scene once per AA mode, reports frame time from the stat
JSON and PSNR of each mode against a reference mode (default: none).

  python tools/aa_bench.py --modes none fxaa taa smaa --frames 16 \
      --width 640 --height 360 [--scene s.gltf]
"""

import argparse
import json
import subprocess
import sys
import tempfile
import os


def run_mode(args, mode: str, outdir: str):
    cfg = {"postAA": mode, "shadowMapResolution": 256}
    if mode == "taaFSR2":
        # FSR2 renders at reduced resolution and upscales to display
        # (temporal.hpp:91 scaling_factor contract).
        cfg["resolutionScale"] = args.fsr2_scale
    cfg_path = os.path.join(outdir, f"cfg_{mode}.json")
    json.dump(cfg, open(cfg_path, "w"))
    stat = os.path.join(outdir, f"stat_{mode}.json")
    png = os.path.join(outdir, f"{mode}.png")
    cmd = [sys.executable, "-m", "granite_tpu.app.scene_viewer",
           "--width", str(args.width), "--height", str(args.height),
           "--frames", str(args.frames), "--time-step", "0.0166",
           "--chain",
           "--config", cfg_path, "--stat", stat, "--png-path", png]
    if args.scene:
        cmd += ["--scene", args.scene]
    subprocess.run(cmd, check=True, capture_output=True)
    return json.load(open(stat))["averageFrameTimeUs"], png


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+",
                    default=["none", "fxaa", "taa", "smaa", "smaaT2X",
                             "taaFSR2"])
    ap.add_argument("--fsr2-scale", type=float, default=0.67)
    ap.add_argument("--scene", default=None)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args(argv)

    outdir = args.outdir or tempfile.mkdtemp(prefix="aa_bench_")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from granite_tpu.utils.image_compare import psnr_channels
    from granite_tpu.utils.image_io import load_image

    results = {}
    ref_png = None
    for mode in args.modes:
        us, png = run_mode(args, mode, outdir)
        entry = {"averageFrameTimeUs": us}
        if ref_png is None:
            ref_png = png
        else:
            entry.update(psnr_channels(load_image(png),
                                       load_image(ref_png)))
        results[mode] = entry
        print(f"{mode:12s} {us:10.1f} us"
              + (f"  luma-psnr-vs-{args.modes[0]} "
                 f"{entry.get('psnrLuma', 0):.2f} dB"
                 if mode != args.modes[0] else ""))
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
