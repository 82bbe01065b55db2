"""Bindless texture analogue: a uniform mip-mapped texture array.

The reference binds thousands of material textures through a bindless
descriptor pool (vulkan/descriptor_set.hpp:90) and samples by index.  The
TPU-native equivalent is ONE device array of shape (N, L, H, W, 4): every
texture resampled to a common base size with a full mip stack, sampled by
(tex_id, lod, uv) gathers.  Uniform shapes keep the sampling kernel fully
vectorized; float16 storage halves bandwidth (textures were decoded
sRGB->linear at load, matching VK_FORMAT_*_SRGB semantics where hardware
decodes BEFORE filtering).

Index 0 is always a 1x1-style white texture; index 1 a flat normal map —
material slots with no texture point there (the reference's fallback
images per AssetClass, asset_manager.hpp:51-66).
"""

from __future__ import annotations

import numpy as np

from ..ops.srgb import srgb_u8_to_linear_np
from ..utils.logging import LOGI

WHITE_TEXTURE = 0
FLAT_NORMAL_TEXTURE = 1
NUM_BUILTIN_TEXTURES = 2


class TextureArray:
    def __init__(self, data, base_size: int):
        self.data = data            # (N, 2S, S, 4) mip strips, f16
        self.base_size = base_size

    @property
    def num_levels(self) -> int:
        from ..ops.texture import num_mip_levels
        return num_mip_levels(self.base_size, self.base_size)


class TextureArrayBuilder:
    def __init__(self, base_size: int = 512):
        self.base_size = base_size
        self._images: list[np.ndarray] = []   # linear float32 RGBA at base
        white = np.ones((base_size, base_size, 4), np.float32)
        normal = np.zeros((base_size, base_size, 4), np.float32)
        normal[..., 0:2] = 0.5
        normal[..., 2] = 1.0
        normal[..., 3] = 1.0
        self._images.append(white)
        self._images.append(normal)

    def add_image(self, img_u8: np.ndarray, srgb: bool) -> int:
        """Add an (H, W, 4) uint8 image; returns its texture index."""
        if srgb:
            linear = srgb_u8_to_linear_np(img_u8)
        else:
            linear = img_u8.astype(np.float32) / 255.0
        s = self.base_size
        if linear.shape[0] != s or linear.shape[1] != s:
            # Resize in linear space (numpy bilinear; PIL lacks float RGBA).
            linear = _resize_bilinear(linear, s, s)
        self._images.append(linear.astype(np.float32))
        return len(self._images) - 1

    def build(self, device: bool = True) -> TextureArray:
        import jax.numpy as jnp
        from ..ops.texture import build_mip_strip, num_mip_levels
        s = self.base_size
        L = num_mip_levels(s, s)
        n = len(self._images)
        LOGI("TextureArray: %d textures at %d^2, %d mip levels (%.1f MB f16)",
             n, s, L, n * 2 * s * s * 4 * 2 / 2**20)
        stacks = []
        for img in self._images:
            stacks.append(np.asarray(
                build_mip_strip(jnp.asarray(img))).astype(np.float16))
        data = np.stack(stacks)       # (N, 2S, S, 4)
        if device:
            data = jnp.asarray(data)
        return TextureArray(data, s)


class MaterialBundleBuilder:
    """Material texture bundles — the tile-coherent sampling layout.

    All four textures of a PBR material (base color, metallic-roughness,
    normal, emissive) are sampled at the SAME (uv, lod), so interleaving
    them channel-wise into one 16-channel gutter strip means one (2, 32)
    patch gather fetches every texel the material needs per mip level:
    2 gather ops for full trilinear material sampling instead of 32.
    (The reference reaches the same coherence through the texture cache;
    descriptor_set.hpp:90 bindless pool -> one bundle per material here.)

    Bundles are deduped by the (base, mr, normal, emissive) image tuple.
    """

    CHANNELS = 16

    def __init__(self, base_size: int = 512):
        self.base_size = base_size
        self._images: dict = {}       # key -> linear float32 (S, S, 4)
        self._bundles: list[tuple] = []
        self._bundle_of: dict[tuple, int] = {}
        s = base_size
        white = np.ones((s, s, 4), np.float32)
        normal = np.zeros((s, s, 4), np.float32)
        normal[..., 0:2] = 0.5
        normal[..., 2] = 1.0
        normal[..., 3] = 1.0
        self._images["__white__"] = white
        self._images["__normal__"] = normal

    def add_image(self, key, img_u8: np.ndarray, srgb: bool) -> None:
        if key in self._images:
            return
        if srgb:
            linear = srgb_u8_to_linear_np(img_u8)
        else:
            linear = img_u8.astype(np.float32) / 255.0
        s = self.base_size
        if linear.shape[0] != s or linear.shape[1] != s:
            linear = _resize_bilinear(linear, s, s)
        self._images[key] = linear.astype(np.float32)

    def bundle_for(self, base=None, mr=None, normal=None,
                   emissive=None) -> int:
        """Bundle index for a material's image tuple (dedup by tuple)."""
        key = (base if base is not None else "__white__",
               mr if mr is not None else "__white__",
               normal if normal is not None else "__normal__",
               emissive if emissive is not None else "__white__")
        if key not in self._bundle_of:
            self._bundle_of[key] = len(self._bundles)
            self._bundles.append(key)
        return self._bundle_of[key]

    def build(self, device: bool = True):
        """-> (B, HS, (S+1)*16) f16 gutter-strip bundle array."""
        import jax.numpy as jnp
        from ..ops.texture import build_gutter_strip_np
        if not self._bundles:
            self.bundle_for()          # at least the default bundle
        s = self.base_size
        strips = []
        for key in self._bundles:
            stacked = np.concatenate(
                [self._images.get(k, self._images["__white__"])
                 for k in key], axis=-1)          # (S, S, 16)
            strips.append(build_gutter_strip_np(stacked))
        data = np.stack(strips)
        LOGI("MaterialBundles: %d bundles at %d^2 (%.1f MB f16)",
             len(strips), s, data.nbytes / 2**20)
        return jnp.asarray(data) if device else data


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    y = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    x = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(y).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(x).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(y - y0, 0, 1)[:, None, None]
    fx = np.clip(x - x0, 0, 1)[None, :, None]
    a = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    b = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return (a * (1 - fy) + b * fy).astype(np.float32)
