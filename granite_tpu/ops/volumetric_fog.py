"""Volumetric (froxel) fog.

Reference: renderer/lights/volumetric_fog.{hpp,cpp} +
assets/shaders/lights/{fog_light_density,fog_accumulate}.comp +
volumetric_fog.h.  Exact behavioral ports:
  * slice mapping: world_z = exp2(tz / s) - 1 with
    s = slice_z_log2_scale = 1 / log2(1 + z_range)  (volumetric_fog.cpp:89);
  * per-froxel albedo = density_mod * slice_extent(z) * length_mod
    (fog_light_density.comp get_fog_albedo; slice extents
    volumetric_fog.cpp:122);
  * accumulation recurrence (fog_accumulate.comp accumulate_scattering):
    light += back.rgb * exp2(-front.a) * back.a;  a += back.a — which is
    a pure prefix-sum in disguise, so the TPU version is two cumsums over
    the depth axis instead of a serial loop;
  * the 17-tap neighborhood smoothing of the light-density volume is a
    fixed-offset filter -> implemented as shifts (zero gathers).

Default grid 160 x 92 x 64, z_range 80 (volumetric_fog.hpp:87-90).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

DEFAULT_W, DEFAULT_H, DEFAULT_D = 160, 92, 64
DEFAULT_Z_RANGE = 80.0
DEFAULT_DENSITY_MOD = 0.5       # volumetric_fog.hpp:92
DEFAULT_INSCATTER_MOD = 0.25    # volumetric_fog.hpp:93


def slice_z_log2_scale(z_range: float) -> float:
    return 1.0 / np.log2(1.0 + z_range)


def texture_z_to_world(tz, s):
    return jnp.exp2(tz / s) - 1.0


def world_to_texture_z(world_z, s):
    return jnp.log2(1.0 + jnp.maximum(world_z, 0.0)) * s


def _trilerp3_clamp(vol, local):
    """Trilinear sample of a (Dz, Hy, Wx) density grid at local [0,1]^3
    coords (LinearClampSampler semantics); 8 taps — froxel counts are
    tiny so plain gathers are fine here."""
    dz, hy, wx = vol.shape
    x = jnp.clip(local[..., 0] * wx - 0.5, 0, wx - 1)
    y = jnp.clip(local[..., 1] * hy - 0.5, 0, hy - 1)
    z = jnp.clip(local[..., 2] * dz - 0.5, 0, dz - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, wx - 1)
    y1 = jnp.minimum(y0 + 1, hy - 1)
    z1 = jnp.minimum(z0 + 1, dz - 1)
    fx, fy, fz = x - x0, y - y0, z - z0
    c = lambda zi, yi, xi: vol[zi, yi, xi]
    cx0 = (c(z0, y0, x0) * (1 - fx) + c(z0, y0, x1) * fx,
           c(z0, y1, x0) * (1 - fx) + c(z0, y1, x1) * fx)
    cx1 = (c(z1, y0, x0) * (1 - fx) + c(z1, y0, x1) * fx,
           c(z1, y1, x0) * (1 - fx) + c(z1, y1, x1) * fx)
    cy0 = cx0[0] * (1 - fy) + cx0[1] * fy
    cy1 = cx1[0] * (1 - fy) + cx1[1] * fy
    return cy0 * (1 - fz) + cy1 * fz


def region_fog_density(pos, regions):
    """compute_fog_density with FOG_REGIONS
    (fog_light_density.comp:20-60): per-froxel sum over unit-box
    regions of fade_coeff(local) * density-volume sample; fade ramps to
    0 over the outer 1/16 of the box (8*(0.5-max|local-0.5|))."""
    wp1 = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)
    density = jnp.zeros(pos.shape[:-1], jnp.float32)
    for w2t, vol in regions:
        local = wp1 @ jnp.asarray(w2t).T
        xmax = jnp.abs(local - 0.5).max(-1)
        fade = jnp.clip(8.0 * (0.5 - xmax), 0.0, 1.0)
        if vol is not None:
            fade = fade * _trilerp3_clamp(jnp.asarray(vol), local)
        density = density + fade
    return density


def fog_light_density(inv_view_proj, proj, camera_pos, sun_dir, sun_color,
                      shadow_map=None, shadow_uv_mat=None,
                      lights=None,
                      grid=(DEFAULT_D, DEFAULT_H, DEFAULT_W),
                      z_range: float = DEFAULT_Z_RANGE,
                      density_mod: float = DEFAULT_DENSITY_MOD,
                      inscatter_mod: float = DEFAULT_INSCATTER_MOD,
                      fog_density: float = 0.1, regions=None):
    """-> (D, H, W, 4) light-density volume: rgb = in-scattered light,
    a = extinction albedo (fog_light_density.comp)."""
    D, H, W = grid
    s = slice_z_log2_scale(z_range)
    tz = (jnp.arange(D, dtype=jnp.float32) + 0.5) / D
    world_z = texture_z_to_world(tz, s)                       # (D,)
    # slice extents LUT (volumetric_fog.cpp:118-123)
    edges = texture_z_to_world(jnp.arange(D + 1, dtype=jnp.float32) / D,
                               s)
    extents = edges[1:] - edges[:-1]                          # (D,)

    u = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    uu, vv = jnp.meshgrid(u, v)                               # (H, W)
    ndc_x = 2 * uu - 1
    ndc_y = 2 * vv - 1

    # to_clip_z: view depth d -> NDC z via the projection rows
    # (z_transform in the reference): ndc_z = (m22*(-d) + m23) / d.
    m22, m23 = float(proj[2, 2]), float(proj[2, 3])
    clip_z = (-m22 * world_z + m23) / jnp.maximum(world_z, 1e-6)  # (D,)

    ndc = jnp.stack([
        jnp.broadcast_to(ndc_x, (D, H, W)),
        jnp.broadcast_to(ndc_y, (D, H, W)),
        jnp.broadcast_to(clip_z[:, None, None], (D, H, W)),
        jnp.ones((D, H, W), jnp.float32)], axis=-1)
    wp = ndc @ inv_view_proj.T
    pos = wp[..., :3] / jnp.where(jnp.abs(wp[..., 3:4]) < 1e-12, 1e-12,
                                  wp[..., 3:4])               # (D,H,W,3)

    # Directional in-scatter with shadow + Henyey-ish phase
    # (lighting_scatter.h): phase = 0.55 - 0.45 * dot(view_dir, L).
    view_dir = pos - camera_pos
    view_dir = view_dir / jnp.sqrt(jnp.maximum(
        (view_dir * view_dir).sum(-1, keepdims=True), 1e-12))
    phase = 0.55 - 0.45 * (view_dir * sun_dir).sum(-1)
    shadow = 1.0
    if shadow_map is not None and shadow_map.ndim == 2:
        from .shadow import sample_directional_shadow
        shadow = sample_directional_shadow(shadow_map, shadow_uv_mat, pos)
    light = sun_color * (phase * shadow)[..., None]

    if lights is not None:
        # Clustered lights evaluated for every froxel (pure ALU; the
        # falloff kills distant lights, so no cluster-mask gathers).
        from .clusterer import positional_light_color

        acc = jnp.zeros_like(light)
        for i in range(lights.pos.shape[0]):   # unrolled: fuses fully
            color, ld = positional_light_color(lights, i, pos)
            ph = 0.55 - 0.45 * (view_dir * ld).sum(-1)
            alive = (i < lights.count).astype(jnp.float32)
            acc = acc + color * (ph * alive)[..., None]
        light = light + acc

    # albedo = density_mod * slice_extent * length_mod * density
    # (get_fog_albedo x compute_fog_density: the constant 0.1
    # uniform-fog path, or the FOG_REGIONS per-froxel sum when region
    # volumes are present — matching the reference's #ifdef split).
    xs = 1.0 / abs(float(proj[0, 0]))
    ys = 1.0 / abs(float(proj[1, 1]))
    length_mod = jnp.sqrt(1.0 + (ndc_x * xs) ** 2 + (ndc_y * ys) ** 2)
    if regions is not None:
        dens = region_fog_density(pos, regions)          # (D, H, W)
    else:
        dens = jnp.full((D, H, W), fog_density, jnp.float32)
    albedo = density_mod * dens * extents[:, None, None] \
        * length_mod[None]
    return jnp.concatenate([light * inscatter_mod,
                            albedo[..., None]], axis=-1)


def _shift3(vol, dy: int, dx: int, dz: int):
    """Edge-clamped shift of a (D, H, W, C) volume (z = slice axis)."""
    D, H, W = vol.shape[:3]
    pz0, pz1 = max(dz, 0), max(-dz, 0)
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    out = jnp.pad(vol, ((pz1, pz0), (py1, py0), (px1, px0), (0, 0)),
                  mode="edge")
    return out[pz0:pz0 + D, py0:py0 + H, px0:px0 + W]


def fog_accumulate(light_density):
    """(D, H, W, 4) -> (D, H, W, 4) accumulated fog volume:
    rgb = in-scatter up to the slice, a = transmittance exp2(-sum a)
    (fog_accumulate.comp — smoothing taps + scattering prefix sums)."""
    w0 = 1.0 / (1.375 * 4.0)
    w1 = 1.0 / (1.375 * 8.0)
    w2 = 1.0 / (1.375 * 16.0)
    w3 = 1.0 / (1.375 * 32.0)
    taps = [(0, 0, 0, w0),
            (0, -1, -1, w2), (-1, 0, -1, w2), (1, 0, -1, w2),
            (0, 1, -1, w2),
            (-1, -1, -1, w3), (1, -1, -1, w3), (-1, 1, -1, w3),
            (1, 1, -1, w3),
            (0, -1, 0, w1), (-1, 0, 0, w1), (1, 0, 0, w1), (0, 1, 0, w1),
            (1, -1, 0, w2), (-1, -1, 0, w2), (-1, 1, 0, w2),
            (1, 1, 0, w2)]
    back = 0.0
    for x, y, z, w in taps:
        back = back + w * _shift3(light_density, y, x, z)

    a = back[..., 3]
    a_incl = jnp.cumsum(a, axis=0)
    a_excl = a_incl - a
    rgb = jnp.cumsum(back[..., :3] * (a * jnp.exp2(-a_excl))[..., None],
                     axis=0)
    return jnp.concatenate([rgb, jnp.exp2(-a_incl)[..., None]], axis=-1)


def apply_fog(color, world_z, fog_volume, z_range: float = DEFAULT_Z_RANGE):
    """Composite fog onto a shaded frame (volumetric_fog.h
    sample_volumetric_fog): color * transmittance + inscatter.

    color: (H, W, 3); world_z: (H, W) positive view depth (background =
    large); fog_volume: (D, Hf, Wf, 4).  One nearest-xy + linear-z fetch
    pair (fog is low-frequency; 2 gathers)."""
    D, Hf, Wf = fog_volume.shape[:3]
    H, W = color.shape[:2]
    s = slice_z_log2_scale(z_range)
    tz = world_to_texture_z(world_z, s) * D - 0.5
    z0 = jnp.clip(jnp.floor(tz).astype(jnp.int32), 0, D - 1)
    z1 = jnp.clip(z0 + 1, 0, D - 1)
    fz = jnp.clip(tz - z0.astype(tz.dtype), 0.0, 1.0)[..., None]
    xi = jnp.clip((jnp.arange(W) * Wf) // W, 0, Wf - 1)
    yi = jnp.clip((jnp.arange(H) * Hf) // H, 0, Hf - 1)
    xi = jnp.broadcast_to(xi[None, :], (H, W))
    yi = jnp.broadcast_to(yi[:, None], (H, W))
    flat = fog_volume.reshape(D * Hf * Wf, 4)
    f0 = flat[(z0 * Hf + yi) * Wf + xi]
    f1 = flat[(z1 * Hf + yi) * Wf + xi]
    fog = f0 * (1 - fz) + f1 * fz
    return color * fog[..., 3:4] + fog[..., :3]
