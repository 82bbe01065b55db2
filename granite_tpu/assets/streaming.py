"""Texture streaming: AssetManager-driven bundle residency.

Reference flow (SURVEY §3.4): AssetManager::register_asset ->
Application::post_frame -> AssetManager::iterate (budget/LRU, BG decode
tasks) -> ResourceManager::latch_handles publishes new views; draws use
per-class fallback images until resident
(filesystem/asset_manager.hpp:51-66, 93-135;
vulkan/managers/resource_manager.hpp:78-152).

TPU-native form: the draw-time "view" is a row of the material bundle
array (see renderer/scene_renderer.py).  Each glTF image registers as an
asset; instantiation decodes (sRGB -> linear, resize, optional GTPX/BCn
sidecar via the native decoders) on a ThreadGroup worker under a byte
budget.  latch() rebuilds the bundle strips whose images changed and
swaps the rows into the device bundle array — the array rides params, so
no retrace happens.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..filesystem.asset_manager import (
    AssetClass, AssetInstantiatorInterface, AssetManager,
)
from ..utils.logging import LOGI


class ImageInstantiator(AssetInstantiatorInterface):
    """Decodes one glTF image to a linear (S, S, 4) float32 array.

    Prefers a `<path>.gtpx` BC1 sidecar (gltf_repacker output) decoded
    with the native codec; otherwise converts the parser-provided u8
    RGBA.  Cost = decoded bytes (the HBM the bundle row will hold).
    """

    def __init__(self, images, image_srgb, image_paths, base_size: int):
        self.images = images
        self.image_srgb = image_srgb
        self.image_paths = image_paths or [None] * len(images)
        self.base_size = base_size
        s = base_size
        self._white = np.ones((s, s, 4), np.float32)
        normal = np.zeros((s, s, 4), np.float32)
        normal[..., 0:2] = 0.5
        normal[..., 2] = 1.0
        normal[..., 3] = 1.0
        self._normal = normal

    def instantiate(self, path: str, asset_class: AssetClass):
        idx = int(path.split("://", 1)[1])
        src = self.image_paths[idx] if idx < len(self.image_paths) \
            else None
        img_u8 = None
        if src and os.path.exists(src + ".gtpx"):
            # Compressed runtime container (gltf_repacker output): BCn
            # payload decoded by the native codec (texture_decoder.cpp
            # analogue).
            from ..native import decode_blocks, decode_bc6h, gtpx_load
            try:
                fmt, w, h, _levels, _flags, payload = gtpx_load(
                    src + ".gtpx")
                if fmt in ("bc6h", "bc6h_s"):
                    # HDR float path: bypass the u8/sRGB conversion.
                    hdr = decode_bc6h(np.frombuffer(payload, np.uint8),
                                      w, h, signed=fmt == "bc6h_s")
                    linear = np.concatenate(
                        [hdr, np.ones_like(hdr[..., :1])], axis=-1)
                    s = self.base_size
                    if linear.shape[0] != s or linear.shape[1] != s:
                        from .texture_array import _resize_bilinear
                        linear = _resize_bilinear(linear, s, s)
                    return linear.astype(np.float32), linear.nbytes
                if fmt != "rgba8":
                    img_u8 = decode_blocks(
                        fmt, np.frombuffer(payload, np.uint8), w, h)
                else:
                    img_u8 = np.frombuffer(payload, np.uint8) \
                        .reshape(h, w, 4)
            except Exception:
                img_u8 = None
        if img_u8 is None:
            img_u8 = self.images[idx]
        from ..ops.srgb import srgb_u8_to_linear_np
        if self.image_srgb[idx]:
            linear = srgb_u8_to_linear_np(img_u8)
        else:
            linear = img_u8.astype(np.float32) / 255.0
        s = self.base_size
        if linear.shape[0] != s or linear.shape[1] != s:
            from .texture_array import _resize_bilinear
            linear = _resize_bilinear(linear, s, s)
        return linear.astype(np.float32), linear.nbytes

    def fallback(self, asset_class: AssetClass):
        if asset_class == AssetClass.NORMAL:
            return self._normal
        return self._white


class TextureStreamer:
    """Bundle-array residency manager for a packed scene."""

    def __init__(self, info, mat_tex: np.ndarray, bundle_keys,
                 tex_to_image: dict, base_size: int = 512,
                 budget_bytes: Optional[int] = None, thread_group=None):
        """tex_to_image: texture index -> glTF image index (builtin
        white/flat-normal slots map to None)."""
        self.bundle_keys = bundle_keys
        self.tex_to_image = tex_to_image
        self.base_size = base_size
        self._inst = ImageInstantiator(
            info.images, info.image_srgb,
            getattr(info, "image_paths", None), base_size)
        self.manager = AssetManager(self._inst, thread_group)
        if budget_bytes is not None:
            self.manager.set_asset_budget(budget_bytes)
        self._asset_of_tex: dict = {}
        for tex, img in tex_to_image.items():
            if img is None:
                continue
            cls = AssetClass.COLOR
            self._asset_of_tex[tex] = self.manager.register_asset(
                f"img://{img}", cls)
        self._resident_sig: dict = {}
        self._bundles = None

    def _tex_image(self, tex: int, kind: int) -> np.ndarray:
        aid = self._asset_of_tex.get(tex)
        cls = AssetClass.NORMAL if kind == 2 else AssetClass.COLOR
        if aid is None:
            return self._inst.fallback(cls)
        self.manager.mark_used(aid)
        payload = self.manager.get_asset(aid)
        if payload is None:
            return self._inst.fallback(cls)
        return payload

    def initial_bundles(self):
        """All-fallback bundle array for frame 0 (device)."""
        import jax.numpy as jnp
        from ..renderer.scene_renderer import build_bundle_strip
        strips = [build_bundle_strip(
            [self._inst.fallback(AssetClass.COLOR),
             self._inst.fallback(AssetClass.COLOR),
             self._inst.fallback(AssetClass.NORMAL),
             self._inst.fallback(AssetClass.COLOR)])] * len(
                 self.bundle_keys)
        self._bundles = jnp.asarray(np.stack(strips))
        return self._bundles

    def latch(self):
        """Per-frame latch (ResourceManager::latch_handles): rebuild and
        swap bundle rows whose images changed residency.  Returns the
        current device bundle array."""
        import jax.numpy as jnp
        from ..renderer.scene_renderer import build_bundle_strip
        # Request + touch every referenced asset (keeps the LRU fresh and
        # flags wanted-but-absent assets for the next iterate()).
        for aid in self._asset_of_tex.values():
            self.manager.get_asset(aid)
        self.manager.iterate()
        dirty = []
        for b, key in enumerate(self.bundle_keys):
            sig = tuple(
                self.manager.is_resident(self._asset_of_tex[t])
                if t in self._asset_of_tex else False for t in key)
            if self._resident_sig.get(b) != sig:
                self._resident_sig[b] = sig
                dirty.append(b)
        for b in dirty:
            key = self.bundle_keys[b]
            strip = build_bundle_strip(
                [self._tex_image(t, k) for k, t in enumerate(key)])
            self._bundles = self._bundles.at[b].set(jnp.asarray(strip))
        if dirty:
            LOGI("TextureStreamer: latched %d bundle(s), %d bytes "
                 "resident", len(dirty), self.manager.current_cost)
        return self._bundles
