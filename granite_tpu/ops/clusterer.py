"""Clustered lighting: z-binning + screen-tile light masks.

Reference: renderer/lights/clusterer.{hpp,cpp} (bindless path) +
assets/shaders/lights/clusterer_bindless_binning.comp — lights are sorted
by view-space Z into bins (z-binning) and rasterized into per-screen-tile
bitmasks; shading reads zbin_mask & tile_mask and iterates set bits.

TPU-native design: both binning steps are single vectorized ops over
(lights x bins) / (lights x tiles); shading is a fori_loop over the
fixed light capacity with per-pixel mask tests — lanes skip masked-out
lights via where().  Light capacity is a static knob (dynamic-shape rule).

Light table layout (PositionalLightInfo analogue, SoA):
  pos (L, 3), color (L, 3), inv_radius (L,), dir (L, 3),
  spot_scale_bias (L, 2), is_spot (L,)  — padded to capacity with
  inv_radius = BIG so dead lights never pass the falloff test.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .pbr import PI, compute_f0, d_ggx, fresnel, g_schlick

MIN_POINT_DIST = 0.1


class LightBuffer(NamedTuple):
    pos: jax.Array
    color: jax.Array
    inv_radius: jax.Array
    dir: jax.Array
    spot_scale_bias: jax.Array
    is_spot: jax.Array
    count: jax.Array           # () int32 actual light count


def pack_lights(positions, colors, radii, directions=None,
                inner_cones=None, outer_cones=None, is_spot=None,
                capacity: int = 32) -> LightBuffer:
    """Host-side packing to the fixed-capacity device light table."""
    n = min(len(positions), capacity)
    pos = np.zeros((capacity, 3), np.float32)
    col = np.zeros((capacity, 3), np.float32)
    inv_r = np.full(capacity, 1e9, np.float32)
    dirs = np.tile(np.array([0, -1, 0], np.float32), (capacity, 1))
    ssb = np.zeros((capacity, 2), np.float32)
    spot = np.zeros(capacity, np.float32)
    pos[:n] = positions[:n]
    col[:n] = colors[:n]
    inv_r[:n] = 1.0 / np.maximum(np.asarray(radii[:n], np.float32), 1e-6)
    if directions is not None:
        dirs[:n] = directions[:n]
    if is_spot is not None:
        spot[:n] = np.asarray(is_spot[:n], np.float32)
        if inner_cones is not None:
            ci = np.cos(np.asarray(inner_cones[:n], np.float32))
            co = np.cos(np.asarray(outer_cones[:n], np.float32))
            scale = 1.0 / np.maximum(ci - co, 1e-4)
            ssb[:n, 0] = scale
            ssb[:n, 1] = -co * scale
    return LightBuffer(jnp.asarray(pos), jnp.asarray(col),
                       jnp.asarray(inv_r), jnp.asarray(dirs),
                       jnp.asarray(ssb), jnp.asarray(spot),
                       jnp.int32(n))


def bin_lights_z(lights: LightBuffer, view, z_slices: int, z_near: float,
                 z_far: float):
    """Z-binning (clusterer_bindless_binning.comp z-range pass):
    per-slice uint32 masks of lights whose view-Z range overlaps.
    Slice boundaries are logarithmic in view depth.  Returns
    (z_slices, words) uint32."""
    L = lights.pos.shape[0]
    words = (L + 31) // 32
    vz = -(lights.pos @ view[2, :3].T + view[2, 3])      # positive depth
    r = 1.0 / jnp.maximum(lights.inv_radius, 1e-12)
    z0 = jnp.maximum(vz - r, z_near)
    z1 = jnp.maximum(vz + r, z_near)
    log_ratio = np.log(z_far / z_near)
    s0 = jnp.floor(jnp.log(z0 / z_near) / log_ratio * z_slices)
    s1 = jnp.ceil(jnp.log(z1 / z_near) / log_ratio * z_slices)
    s0 = jnp.clip(s0, 0, z_slices - 1).astype(jnp.int32)
    s1 = jnp.clip(s1, 0, z_slices).astype(jnp.int32)
    alive = (jnp.arange(L) < lights.count) & (vz + r > z_near)
    slice_ids = jnp.arange(z_slices, dtype=jnp.int32)
    overlap = (slice_ids[:, None] >= s0[None, :]) & \
        (slice_ids[:, None] < s1[None, :]) & alive[None, :]   # (S, L)
    return _masks_from_overlap(overlap, words)


def bin_lights_tiles(lights: LightBuffer, view_proj, width: int,
                     height: int, tile: int = 64):
    """Screen-tile binning: conservative sphere -> screen-rect test.
    Returns (ty, tx, words) uint32 masks."""
    L = lights.pos.shape[0]
    words = (L + 31) // 32
    tx = -(-width // tile)
    ty = -(-height // tile)
    # Conservative: project the 8 corners of the light's AABB.
    r = 1.0 / jnp.maximum(lights.inv_radius, 1e-12)
    corners = jnp.asarray(np.array(
        [[(i >> k) & 1 for k in range(3)] for i in range(8)],
        np.float32) * 2 - 1)                        # (8, 3)
    pts = lights.pos[:, None, :] + corners[None] * r[:, None, None]
    h = pts @ view_proj[:3, :3].T + view_proj[:3, 3]
    w = pts @ view_proj[3, :3].T + view_proj[3, 3]
    behind = w <= 1e-6
    any_behind = behind.any(axis=1)
    w_safe = jnp.where(behind, 1e-6, w)
    sx = (0.5 * h[..., 0] / w_safe + 0.5) * width
    sy = (0.5 * h[..., 1] / w_safe + 0.5) * height
    x0 = jnp.where(any_behind, 0.0, sx.min(axis=1))
    x1 = jnp.where(any_behind, float(width), sx.max(axis=1))
    y0 = jnp.where(any_behind, 0.0, sy.min(axis=1))
    y1 = jnp.where(any_behind, float(height), sy.max(axis=1))
    tx0 = jnp.clip(jnp.floor(x0 / tile), 0, tx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil(x1 / tile), 1, tx).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(y0 / tile), 0, ty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil(y1 / tile), 1, ty).astype(jnp.int32)
    alive = jnp.arange(L) < lights.count
    ix = jnp.arange(tx, dtype=jnp.int32)
    iy = jnp.arange(ty, dtype=jnp.int32)
    in_x = (ix[None, :] >= tx0[:, None]) & (ix[None, :] < tx1[:, None])
    in_y = (iy[None, :] >= ty0[:, None]) & (iy[None, :] < ty1[:, None])
    overlap = (in_y.T[:, None, :] & in_x.T[None, :, :]
               & alive[None, None, :])                    # (ty, tx, L)
    return _masks_from_overlap(overlap, words)


def _masks_from_overlap(overlap, words: int):
    """Pack a (..., L) bool into (..., words) uint32 bitmasks."""
    L = overlap.shape[-1]
    pad = words * 32 - L
    if pad:
        overlap = jnp.concatenate(
            [overlap, jnp.zeros(overlap.shape[:-1] + (pad,), bool)], -1)
    bits = overlap.reshape(overlap.shape[:-1] + (words, 32))
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return (bits.astype(jnp.uint32) * weights).sum(-1, dtype=jnp.uint32)


def positional_light_color(lights: LightBuffer, i, world_pos):
    """compute_point_color / compute_spot_color (point.h:33, spot.h:33):
    returns (color (..., 3), L direction (..., 3))."""
    lp = lights.pos[i]
    full = world_pos - lp                     # surface <- light
    dist = jnp.sqrt(jnp.maximum((full * full).sum(-1), 1e-12))
    dist = jnp.maximum(dist, MIN_POINT_DIST)
    ldir = -full / dist[..., None]
    x = dist * lights.inv_radius[i]
    t = jnp.clip((x - 0.9) / 0.1, 0.0, 1.0)
    static_falloff = 1.0 - t * t * (3.0 - 2.0 * t)     # 1 - smoothstep
    cone = jnp.clip((-ldir * lights.dir[i]).sum(-1)
                    * lights.spot_scale_bias[i, 0]
                    + lights.spot_scale_bias[i, 1], 0.0, 1.0)
    cone = cone * cone
    falloff = jnp.where(lights.is_spot[i] > 0.5, cone, 1.0) * static_falloff
    color = lights.color[i] * (falloff / (dist * dist))[..., None]
    return color, ldir


def shade_clustered(lights: LightBuffer, z_masks, tile_masks, base_color,
                    normal, metallic, roughness_in, world_pos, camera_pos,
                    view, px, py, z_near: float, z_far: float,
                    tile: int = 64, cluster_shadows=None):
    """compute_cluster_light (lights/clusterer.h): accumulate the full
    cook-torrance response of every light whose cluster mask bit is set.

    The fori_loop runs to the static light capacity; per-pixel mask
    where()s keep lanes cheap for unset bits.  z/tile masks are gathered
    per pixel once.

    cluster_shadows: optional dict {atlas_flat, vps_np, size,
    light_slice_np, light_kind_np, light_pos_np, k, bias} — the shadow
    atlas path (clusterer.hpp:52-58): per-pixel top-K shadowed-light
    terms are resolved via ops/light_shadows.topk_shadow_terms and each
    light's contribution is scaled by its slot's PCF term.
    """
    L = lights.pos.shape[0]
    z_slices = z_masks.shape[0]
    log_ratio = np.log(z_far / z_near)
    vz = -(world_pos @ view[2, :3].T + view[2, 3])
    s = jnp.clip(jnp.log(jnp.maximum(vz, z_near) / z_near)
                 / log_ratio * z_slices, 0, z_slices - 1).astype(jnp.int32)
    # Per-pixel gathers cost ~22ms per 2M indices on the v5e, but both
    # mask lookups are structured: the tile mask is BLOCK-CONSTANT (a
    # pure repeat-upsample) and the z mask comes from a tiny per-slice
    # table (a select tree over the slices beats a gather ~10x).
    zsel = z_masks[0]
    for k in range(1, z_slices):
        zsel = jnp.where((s == k)[..., None], z_masks[k], zsel)
    th, tw = tile_masks.shape[:2]
    tiled = jnp.repeat(jnp.repeat(tile_masks, tile, axis=0), tile, axis=1)
    H_, W_ = world_pos.shape[:2] if world_pos.ndim == 3 else (None, None)
    if H_ is not None and tiled.shape[0] >= H_ and tiled.shape[1] >= W_:
        tsel = tiled[:H_, :W_]
    else:
        tix = jnp.clip((px / tile).astype(jnp.int32), 0, tw - 1)
        tiy = jnp.clip((py / tile).astype(jnp.int32), 0, th - 1)
        tsel = tile_masks[tiy, tix]
    pixel_masks = zsel & tsel                            # (H, W, words)

    shadow_slots = shadow_terms = None
    if cluster_shadows is not None:
        from .light_shadows import topk_shadow_terms
        cs = cluster_shadows
        shadow_slots, shadow_terms = topk_shadow_terms(
            cs["atlas_flat"], cs["vps_np"], cs["size"],
            int(cs["num_lights"]), cs["light_slice_np"],
            cs["light_kind_np"], cs["light_pos_np"], pixel_masks,
            world_pos, k=cs.get("k", 4), bias=cs.get("bias", 2e-3),
            half_res=cs.get("half_res", False))

    roughness = roughness_in * 0.75 + 0.25
    V = camera_pos - world_pos
    V = V / jnp.sqrt(jnp.maximum((V * V).sum(-1), 1e-20))[..., None]
    N = normal
    nov = jnp.clip((N * V).sum(-1), 1e-3, 1.0)
    f0 = compute_f0(base_color, metallic)

    def body(i, acc):
        word = i // 32
        bit = jnp.uint32(1) << jnp.uint32(i % 32)
        active = (pixel_masks[..., word] & bit) != 0
        color, Ld = positional_light_color(lights, i, world_pos)
        if shadow_slots is not None:
            shadow = jnp.ones_like(metallic)
            for s in range(shadow_slots.shape[0]):
                shadow = jnp.where(shadow_slots[s] == i,
                                   shadow_terms[s], shadow)
            color = color * shadow[..., None]
        H = Ld + V
        H = H / jnp.sqrt(jnp.maximum((H * H).sum(-1), 1e-20))[..., None]
        nol = jnp.clip((N * Ld).sum(-1), 1e-3, 1.0)
        hov = jnp.clip((H * V).sum(-1), 1e-3, 1.0)
        spec_f = fresnel(f0, hov)
        dg = d_ggx(roughness, (N * H).sum(-1)) * g_schlick(roughness, nov,
                                                           nol)
        term = color * nol[..., None]
        contrib = term * (spec_f * dg[..., None]
                          + (1.0 - spec_f) * (1.0 / PI)
                          * base_color * (1.0 - metallic[..., None]))
        return acc + jnp.where(active[..., None], contrib, 0.0)

    # Unrolled (L is a small static capacity): one fused XLA kernel with
    # intermediates in registers — a fori_loop keeps the while-op
    # barrier and runs ~2x slower at L=8.
    acc = jnp.zeros_like(base_color)
    for i in range(L):
        acc = body(i, acc)
    return acc
