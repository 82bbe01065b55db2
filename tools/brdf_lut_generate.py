"""Split-sum BRDF LUT baker (reference: tools/brdf_lut_generate.cpp —
integrates the GGX environment BRDF into a (NoV, roughness) -> (scale,
bias) LUT and writes it to a texture file).

  python tools/brdf_lut_generate.py --output brdf.npy [--size 256]
      [--samples 512] [--gtpx brdf.gtpx] [--png brdf.png]

The .npy is (S, S, 2) f32: x = NoV, y = roughness, channels = F0
scale / bias of the split-sum approximation.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def radical_inverse_vdc(bits: np.ndarray) -> np.ndarray:
    bits = bits.astype(np.uint32)
    bits = (bits << np.uint32(16)) | (bits >> np.uint32(16))
    bits = ((bits & np.uint32(0x55555555)) << np.uint32(1)) | \
        ((bits & np.uint32(0xAAAAAAAA)) >> np.uint32(1))
    bits = ((bits & np.uint32(0x33333333)) << np.uint32(2)) | \
        ((bits & np.uint32(0xCCCCCCCC)) >> np.uint32(2))
    bits = ((bits & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | \
        ((bits & np.uint32(0xF0F0F0F0)) >> np.uint32(4))
    bits = ((bits & np.uint32(0x00FF00FF)) << np.uint32(8)) | \
        ((bits & np.uint32(0xFF00FF00)) >> np.uint32(8))
    return bits.astype(np.float64) * 2.3283064365386963e-10


def integrate_brdf(size: int, samples: int) -> np.ndarray:
    """Vectorized split-sum integration (brdf_lut_generate.cpp
    IntegrateBRDF; geometry term uses the IBL k = a^2/2 variant)."""
    nov = (np.arange(size) + 0.5) / size                    # (S,)
    rough = (np.arange(size) + 0.5) / size                  # (S,)
    NoV = nov[None, :, None]                                # (1, S, 1)
    R = rough[:, None, None]                                # (S, 1, 1)

    V = np.concatenate([np.sqrt(1.0 - NoV * NoV),
                        np.zeros_like(NoV), NoV], axis=-1)  # (1,S,3)

    i = np.arange(samples)
    xi1 = (i + 0.5) / samples
    xi2 = radical_inverse_vdc(i)

    a = (R * R)[..., 0]                                     # (S, 1)
    scale = np.zeros((size, size))
    bias = np.zeros((size, size))
    for s in range(samples):
        phi = 2.0 * np.pi * xi1[s]
        cos_t = np.sqrt((1.0 - xi2[s]) /
                        (1.0 + (a * a - 1.0) * xi2[s]))     # (S, 1)
        sin_t = np.sqrt(np.maximum(1.0 - cos_t * cos_t, 0.0))
        H = np.stack([np.cos(phi) * sin_t, np.sin(phi) * sin_t,
                      cos_t * np.ones_like(sin_t)], axis=-1)  # (S,1,3)
        VoH = (V * H).sum(-1)                               # (S, S)
        L = 2.0 * VoH[..., None] * H - V
        NoL = np.clip(L[..., 2], 0.0, 1.0)
        NoH = np.clip(H[..., 2], 0.0, 1.0)
        VoH = np.clip(VoH, 0.0, 1.0)
        mask = NoL > 0
        k = (a * a) / 2.0                                   # (S, 1)
        NoVv = np.clip(V[..., 2], 1e-4, 1.0)                # (1, S)
        g_v = NoVv / (NoVv * (1.0 - k) + k)
        g_l = NoL / (NoL * (1.0 - k) + k)
        g_vis = np.where(mask, g_l * g_v * VoH
                         / np.maximum(NoH * NoVv, 1e-6), 0.0)
        fc = (1.0 - VoH) ** 5
        scale += (1.0 - fc) * g_vis
        bias += fc * g_vis
    out = np.stack([scale, bias], axis=-1) / samples
    return out.astype(np.float32)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True, help=".npy LUT")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--gtpx", default=None,
                    help="also write an rgba8 GTPX (rg = scale/bias)")
    ap.add_argument("--png", default=None)
    args = ap.parse_args(argv)

    lut = integrate_brdf(args.size, args.samples)
    np.save(args.output, lut)
    print(f"wrote {args.output} ({args.size}x{args.size}x2 f32)")
    if args.gtpx or args.png:
        u8 = np.zeros((args.size, args.size, 4), np.uint8)
        u8[..., :2] = np.clip(lut * 255 + 0.5, 0, 255).astype(np.uint8)
        u8[..., 3] = 255
        if args.gtpx:
            from granite_tpu.native import gtpx_save
            gtpx_save(args.gtpx, u8.tobytes(), "rgba8", args.size,
                      args.size)
            print(f"wrote {args.gtpx}")
        if args.png:
            from granite_tpu.utils.image_io import save_png
            save_png(args.png, u8)
            print(f"wrote {args.png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
