"""Offline IBL convolver CLI.

Reference: tools/convert_equirect_to_environment.cpp — bakes an equirect
HDR into a GGX-prefiltered reflection chain + cosine-convolved
irradiance (the reference writes .gtx cubemaps; here one .genv.npz
bundle the runtime Environment loads directly).

Usage:
  python tools/convert_equirect_to_environment.py input.{npy,png,hdr}
      --output env.genv.npz [--size 64] [--samples 64] [--scale 1.0]
      [--reflection refl.npy] [--irradiance irr.npy]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def load_equirect(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.asarray(np.load(path), np.float32)[..., :3]
    from granite_tpu.utils.image_io import load_image
    img = load_image(path, srgb_to_linear=True)
    return np.asarray(img, np.float32)[..., :3]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("equirect")
    ap.add_argument("--output", required=True,
                    help=".genv.npz bundle for Environment(baked=...)")
    ap.add_argument("--size", type=int, default=64,
                    help="reflection level-0 resolution (square)")
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="radiance scale (tool --cube-scale analogue)")
    ap.add_argument("--reflection", default=None,
                    help="also dump the reflection chain as .npy list")
    ap.add_argument("--irradiance", default=None,
                    help="also dump the irradiance map as .npy")
    args = ap.parse_args()

    from granite_tpu.renderer.environment import save_baked_environment
    env = load_equirect(args.equirect) * args.scale
    baked = save_baked_environment(args.output, env, base_size=args.size,
                                   samples=args.samples)
    if args.reflection:
        np.save(args.reflection,
                np.asarray(baked["reflection_0"], np.float32))
    if args.irradiance:
        np.save(args.irradiance, baked["irradiance"])
    print(f"baked {args.output}: {baked['num_levels']} reflection levels "
          f"at {args.size}^2, SH9 + 32x64 irradiance")
    return 0


if __name__ == "__main__":
    sys.exit(main())
