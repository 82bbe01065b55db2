#!/usr/bin/env python
"""Hardware image verification gate — MUST pass before any bench claim.

Automates the CLAUDE.md rule born from the late-round-2 black-frame
incident: render the BENCH config at BENCH resolution on the real chip,
write the PNG, and ASSERT on the rgb planes (a black RGBA frame has
mean 63.75 because of alpha — the planes are the only honest signal).

Checks:
  1. per-plane (r, g, b) means are inside sane bounds (not black, not
     blown out);
  2. black-tile census: the fraction of 32x128 screen tiles whose rgb
     content is entirely zero must be tiny (NaN-poisoned sampler tiles
     show up as zeroed rects after the containment clamp);
  3. the chained run's DCE-proof checksum is finite and consistent with
     frames x (single-frame sum) within tolerance;
  4. sequential frame N and chained frame N agree exactly from the same
     initial history (the chain is the timed path — it must render the
     same image).

Reference analogue: application_headless.cpp:440-461 PNG dump +
tools/image_compare.cpp gates, run as a deploy gate.

  python tools/hw_verify.py [--width 1920 --height 1080] [--out dir]
Exit 0 = gate passed.
"""

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out", default="/tmp/hw_verify")
    ap.add_argument("--config", default=None,
                    help="config.json (default: the bench config)")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    import numpy as np

    from granite_tpu.app.scene_viewer import SceneViewerApplication
    from granite_tpu.utils.image_io import save_png

    cfg_path = args.config
    if cfg_path is None:
        import tempfile
        cfg = {"renderer": "deferred", "hdrBloom": True,
               "shadowMapResolution": 2048}
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            json.dump(cfg, f)
            cfg_path = f.name

    app = SceneViewerApplication(types.SimpleNamespace(
        scene=None, config=cfg_path, camera_index=-1, bench_scene=True))
    app.swapchain_updated(args.width, args.height)

    failures = []

    # Like-for-like: N sequential frames vs N chained frames, both from
    # freshly-cleared history (exposure adaptation otherwise makes frame
    # 1 differ from frame N by construction).  The first sequential
    # frame also warms the per-frame executable and the param cache the
    # chain reuses.
    seq = None
    for _ in range(args.frames):
        seq = app.render_frame(1 / 60, 0.0)
    seq = np.asarray(seq)
    app.reset_history()
    chained = np.asarray(app.render_frames_chained(1 / 60, 1 / 60,
                                                   args.frames))
    chk = getattr(app, "_last_chain_checksum", None)
    chk = float(np.asarray(chk)) if chk is not None else None

    png = os.path.join(args.out, "bench_frame.png")
    save_png(png, chained)

    rgb = chained[..., :3].astype(np.float64)
    means = rgb.reshape(-1, 3).mean(axis=0)
    # 1. plane means: the bench scene is a lit interior; anything below
    # 2/255 per plane means a black or near-black frame, anything above
    # 250 a blown-out one.
    for c, m in zip("rgb", means):
        if not (2.0 < m < 250.0):
            failures.append(f"plane {c} mean {m:.2f} outside (2, 250)")

    # 2. black-tile census (32x128 tiles, the sampler/raster tile size)
    H, W = rgb.shape[:2]
    th, tw = 32, 128
    ph, pw = -(-H // th) * th, -(-W // tw) * tw
    padded = np.zeros((ph, pw, 3))
    padded[:H, :W] = rgb
    tiles = padded.reshape(ph // th, th, pw // tw, tw, 3)
    tile_max = tiles.max(axis=(1, 3, 4))
    n_black = int((tile_max == 0).sum())
    n_tiles = tile_max.size
    if n_black > 0.01 * n_tiles:
        failures.append(f"{n_black}/{n_tiles} screen tiles are all-black "
                        f"(zeroed/NaN-clamped sampler rects?)")

    # 3. chain checksum sanity
    if chk is None:
        failures.append("no chain checksum (chain fell back to "
                        "sequential?)")
    elif not np.isfinite(chk):
        failures.append(f"chain checksum not finite: {chk}")
    else:
        # frames are static: every scanned frame should sum like the
        # final one (exposure history converges fast; 10% slack)
        per_frame = chained.astype(np.float64).sum()
        n_scanned = args.frames - 1
        if n_scanned and not (0.5 * n_scanned * per_frame <= chk
                              <= 1.5 * n_scanned * per_frame):
            failures.append(
                f"checksum {chk:.3e} vs ~{n_scanned}x frame sum "
                f"{n_scanned * per_frame:.3e} — scanned frames diverge")

    # 4. sequential frame N == chained frame N (static scene, same
    # initial history)
    if not np.array_equal(seq, chained):
        diff = int((seq != chained).sum())
        failures.append(f"sequential final frame != chained final frame "
                        f"({diff} bytes differ)")

    report = {
        "width": args.width, "height": args.height,
        "plane_means": [round(float(m), 3) for m in means],
        "black_tiles": n_black, "total_tiles": n_tiles,
        "chain_checksum": chk,
        "png": png,
        "ok": not failures,
        "failures": failures,
    }
    with open(os.path.join(args.out, "hw_verify.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
