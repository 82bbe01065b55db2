"""Image -> GTPX packer with mip generation and BCn compression
(reference: tools/image_packer.cpp — packs source images into a .gtx
with full mip chains and optional compression).

  python tools/image_packer.py in.png --output out.gtpx
      [--format rgba8|bc1|bc3|bc4|bc5|bc7|bc6h] [--mips] [--srgb]

bc6h takes float HDR input (a .npy float array, kept linear); the
other formats take 8-bit LDR (PNG or uint8 .npy).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def box_mips(img):
    import numpy as np
    levels = [img]
    cur = img.astype(np.float32)
    while max(cur.shape[0], cur.shape[1]) > 1:
        h = max(cur.shape[0] // 2, 1)
        w = max(cur.shape[1] // 2, 1)
        nxt = cur[: h * 2, : w * 2].reshape(h, 2, w, 2, -1).mean((1, 3))
        levels.append(np.clip(nxt + 0.5, 0, 255).astype(img.dtype))
        cur = nxt
    return levels


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="bc1",
                    choices=["rgba8", "bc1", "bc3", "bc4", "bc5",
                             "bc7", "bc6h"])
    ap.add_argument("--mips", action="store_true")
    ap.add_argument("--srgb", action="store_true",
                    help="tag the container sRGB (flag bit 0)")
    args = ap.parse_args(argv)

    import numpy as np

    from granite_tpu.native import (
        encode_bc1, encode_bc3, encode_bc4, encode_bc5, encode_bc6h,
        encode_bc7, gtpx_save,
    )
    from granite_tpu.utils.image_io import load_image

    hdr = args.format == "bc6h"
    if args.input.endswith(".npy"):
        img = np.load(args.input)
        if hdr:
            img = img.astype(np.float32)
        elif img.dtype != np.uint8:
            img = np.clip(img * 255 + 0.5, 0, 255).astype(np.uint8)
    else:
        img = load_image(args.input)
        if hdr:   # PNG fallback: treat sRGB-ish bytes as linear HDR
            img = (img.astype(np.float32) / 255.0) ** 2.2
    if img.ndim == 2:
        img = img[..., None]
    if hdr:
        if img.shape[-1] < 3:
            img = np.concatenate(
                [img] + [img[..., :1]] * (3 - img.shape[-1]), axis=-1)
        img = np.ascontiguousarray(img[..., :3], np.float32)
    elif img.shape[-1] < 4:
        pad = np.full(img.shape[:2] + (4 - img.shape[-1],), 255,
                      np.uint8)
        pad[..., :max(3 - img.shape[-1], 0)] = 0
        img = np.concatenate([img, pad], axis=-1)

    if args.mips:
        levels = box_mips(img) if not hdr else None
        if hdr:   # float mips: plain box average, no rounding/clamp
            levels = [img]
            cur = img
            while max(cur.shape[0], cur.shape[1]) > 1:
                h2 = max(cur.shape[0] // 2, 1)
                w2 = max(cur.shape[1] // 2, 1)
                cur = cur[: h2 * 2, : w2 * 2].reshape(
                    h2, 2, w2, 2, -1).mean((1, 3)).astype(np.float32)
                levels.append(cur)
    else:
        levels = [img]
    enc = {"rgba8": lambda x: x.tobytes(), "bc1": encode_bc1,
           "bc3": encode_bc3, "bc4": encode_bc4, "bc5": encode_bc5,
           "bc7": encode_bc7, "bc6h": encode_bc6h}
    payload = b""
    for lv in levels:
        out = enc[args.format](np.ascontiguousarray(lv))
        payload += out if isinstance(out, bytes) else bytes(out)
    gtpx_save(args.output, payload, args.format, img.shape[1],
              img.shape[0], levels=len(levels),
              flags=1 if args.srgb else 0)
    print(f"wrote {args.output}: {args.format} {img.shape[1]}x"
          f"{img.shape[0]} levels={len(levels)} "
          f"({img.nbytes} -> {len(payload)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
