"""Volumetric diffuse GI — ambient-cube probe grids.

Reference: renderer/lights/volumetric_diffuse.{hpp,cpp} +
assets/shaders/lights/volumetric_diffuse.h (sampling) +
volumetric_hemisphere_integral.comp / volumetric_light_compute_fallback
.comp (probe bake math).  Each volume is a (X, Y, Z) grid of probes over
a node-transformed unit box; every probe stores an AMBIENT CUBE (6 RGB
irradiance values, one per axis direction).  Shading samples the grid
trilinearly, blends the three axis faces by normal^2 with sign-selected
faces, weights volumes by a guard-band term, and normalizes by total
weight with a 0.01-weighted sky fallback (volumetric_diffuse.h:87-153).

TPU-native design notes:
  * The reference packs faces into the 3D texture's X axis (x/6 atlas,
    lo/hi_tex_coord_x clamps); here each volume is a dense
    (6, Z, Y, X, 3) array and the face select indexes axis 0 — the
    atlas-packing details exist only because Vulkan wanted one bindless
    texture per volume.
  * Trilinear in 3D is an 8-tap footprint; per the measured gather
    economics (ops/texture.py) the probe grid is OCT-PACKED at build
    time (all 8 corners as channels) so one axis face costs ONE gather.
  * The bake renders 6 tiny cube faces per probe through the engine's
    own forward path and integrates them with the exact cubemap-texel
    solid-angle formula 4/(res^2 * l^3), cosine-weighted, / PI
    (volumetric_hemisphere_integral.comp:100-115).  The reference
    updates probes incrementally over 4 frame layers with jitter; here
    the bake is a load-time step (the viewer hard-disables the whole
    system anyway: `if (false && config.volumetric_diffuse)`,
    scene_viewer_application.cpp:300).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pbr import PI

# Cube-face basis (inc/cube_coordinates.h: +X,-X,+Y,-Y,+Z,-Z with the
# standard Vulkan cubemap du/dv).
FACE_DIRS = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
FACE_DU = np.array([[0, 0, -1], [0, 0, 1], [1, 0, 0],
                    [1, 0, 0], [1, 0, 0], [-1, 0, 0]], np.float32)
FACE_DV = np.array([[0, -1, 0], [0, -1, 0], [0, 0, 1],
                    [0, 0, -1], [0, -1, 0], [0, -1, 0]], np.float32)


@dataclass
class DiffuseVolume:
    """One probe-grid volume (VolumetricDiffuseLightComponent)."""
    world_to_tex: np.ndarray     # (3, 4) world -> [0,1]^3
    tex_to_world: np.ndarray     # (3, 4)
    resolution: tuple            # (X, Y, Z)
    ambient: jax.Array           # (6, Z, Y, X, 3) ambient-cube grid
    packed: jax.Array            # (6, Z-1|Z, Y, X, 24) oct-packed corners
    guard_band_factor: float = 0.9
    guard_band_sharpen: float = 16.0


def volume_transforms(node_world: np.ndarray):
    """world_to_tex / tex_to_world for a unit box [-0.5, 0.5]^3 node:
    tex = local + 0.5 (the reference's texture_to_world push constant)."""
    m = np.asarray(node_world, np.float64)
    shift = np.eye(4)
    shift[:3, 3] = -0.5               # tex [0,1] -> local [-0.5, 0.5]
    t2w = (m @ shift)[:3].astype(np.float32)
    w2t = np.linalg.inv(m @ shift)[:3].astype(np.float32)
    return w2t, t2w


def probe_positions(t2w: np.ndarray, resolution) -> np.ndarray:
    """(Z, Y, X, 3) world probe positions at texel centers
    (volumetric_hemisphere_integral.comp:186 tex_space = (idx+0.5)/res)."""
    rx, ry, rz = resolution
    gx = (np.arange(rx) + 0.5) / rx
    gy = (np.arange(ry) + 0.5) / ry
    gz = (np.arange(rz) + 0.5) / rz
    zz, yy, xx = np.meshgrid(gz, gy, gx, indexing="ij")
    tex = np.stack([xx, yy, zz, np.ones_like(xx)], axis=-1)
    return (tex @ t2w.T).astype(np.float32)


def face_solid_angle_weights(res: int):
    """Per-texel cube-face (direction, area) arrays: the exact
    A = 4 / (res^2 * l^3) texel solid-angle estimate
    (volumetric_hemisphere_integral.comp:100-112).
    Returns (dirs (6, R, R, 3) unnormalized, area (R, R))."""
    uv = (np.arange(res, dtype=np.float32) + 0.5) / res * 2.0 - 1.0
    cu, cv = np.meshgrid(uv, uv, indexing="xy")
    dirs = (FACE_DIRS[:, None, None] + FACE_DU[:, None, None] * cu[..., None]
            + FACE_DV[:, None, None] * cv[..., None])
    # |n| = sqrt(1 + u^2 + v^2) is face-independent: area is (R, R).
    inv_l = 1.0 / np.sqrt(1.0 + cu * cu + cv * cv)
    area = (4.0 / (res * res)) * inv_l ** 3
    return dirs.astype(np.float32), area.astype(np.float32)


def ambient_cube_integral(face_colors, dirs=None, area=None):
    """6 rendered cube faces -> ambient cube (6, 3).

    face_colors: (6, R, R, 3) linear HDR.  For each primary direction
    N_f: sum(color * clamp(dot(N_f, n), 0) * A) / PI over ALL cube
    texels (volumetric_light_compute_fallback.comp integrate_sample —
    texel-exact; the probe-path's per-patch hemisphere masks are a
    workgroup-granularity approximation of the same integral).
    """
    res = face_colors.shape[1]
    if dirs is None:
        dirs, area = face_solid_angle_weights(res)
    dirs = jnp.asarray(dirs)
    inv_l = 1.0 / jnp.sqrt((dirs * dirs).sum(-1, keepdims=True))
    n = dirs * inv_l                                     # (6, R, R, 3)
    area = jnp.asarray(area)                             # (R, R)
    fc = jnp.asarray(face_colors)
    cube = []
    for f in range(6):
        cosw = jnp.clip((n @ jnp.asarray(FACE_DIRS[f])), 0.0, None)
        w = cosw * area[None]                            # (6, R, R)
        cube.append((fc * w[..., None]).sum((0, 1, 2)) / PI)
    return jnp.stack(cube)                               # (6, 3)


def oct_pack_grid(ambient: jnp.ndarray) -> jnp.ndarray:
    """(6, Z, Y, X, 3) -> (6, Z, Y, X, 24) with the 8 trilinear corner
    texels as channels [c000 c100 c010 c110 c001 c101 c011 c111]
    (x fastest), edge-clamped — ONE gather returns the footprint."""
    a = jnp.asarray(ambient)
    p = jnp.pad(a, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)), mode="edge")
    parts = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                parts.append(p[:, dz:dz + a.shape[1], dy:dy + a.shape[2],
                               dx:dx + a.shape[3]])
    return jnp.concatenate(parts, axis=-1)


def _trilerp_packed(packed_face, lx, ly, lz, resolution):
    """Trilinear fetch from one oct-packed face grid: one gather/pixel.

    packed_face: (Z, Y, X, 24); lx/ly/lz in [0, 1] texture space.
    LinearClampSampler semantics (texel centers, clamp to edge).
    """
    rx, ry, rz = resolution
    x = lx * rx - 0.5
    y = ly * ry - 0.5
    z = lz * rz - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, rx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, ry - 1).astype(jnp.int32)
    z0 = jnp.clip(jnp.floor(z), 0, rz - 1).astype(jnp.int32)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None, None, None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None, None]
    fz = jnp.clip(z - z0, 0.0, 1.0)[..., None]
    oct = packed_face[z0, y0, x0]                # (..., 24) ONE gather
    c = oct.reshape(oct.shape[:-1] + (2, 2, 2, 3))   # (..., dz, dy, dx, 3)
    cx = c[..., 0, :] * (1 - fx) + c[..., 1, :] * fx        # over dx
    cy = cx[..., 0, :] * (1 - fy) + cx[..., 1, :] * fy      # over dy
    return cy[..., 0, :] * (1 - fz) + cy[..., 1, :] * fz    # over dz


def sample_volumetric_diffuse(volumes, world_pos, normal, fallback_cube):
    """compute_volumetric_diffuse (volumetric_diffuse.h:87-153):
    guard-band-weighted ambient-cube irradiance from every volume, with
    the 0.01-weight sky fallback, normalized by total weight.

    volumes: list of DiffuseVolume (static count; unrolled).
    fallback_cube: (6, 3) sky ambient cube (update_fallback_volume).
    Returns (..., 3) irradiance (the lambertian 1/PI is already baked
    into the probes, per the comment at volumetric_diffuse.h:151).
    """
    n2 = normal * normal
    neg = (normal < 0.0).astype(jnp.int32)               # face select
    fb = jnp.asarray(fallback_cube)
    # fallback: coords = axis*2 + (n<0): faces order +X,-X,+Y,-Y,+Z,-Z
    result = (n2[..., 0:1] * fb[neg[..., 0] * 1 + 0]
              + n2[..., 1:2] * fb[neg[..., 1] * 1 + 2]
              + n2[..., 2:3] * fb[neg[..., 2] * 1 + 4]) * 0.01
    weight = jnp.full(world_pos.shape[:-1], 0.01, jnp.float32)

    wp1 = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])],
                          axis=-1)
    for vol in volumes:
        w2t = jnp.asarray(vol.world_to_tex)
        local = wp1 @ w2t.T                              # (..., 3)
        # weight_term (volumetric_diffuse.h:40-44)
        dist = jnp.abs(local - 0.5).max(-1)
        w = jnp.clip((0.5 - vol.guard_band_factor * dist)
                     * vol.guard_band_sharpen, 0.0, 1.0)
        lx, ly, lz = local[..., 0], local[..., 1], local[..., 2]
        contrib = jnp.zeros_like(result)
        for axis in range(3):
            # face = 2*axis + (normal[axis] < 0); one-hot select over
            # the two signed faces (2 gathers) beats a dynamic
            # face-indexed gather only for face counts this small.
            pos_f = _trilerp_packed(vol.packed[2 * axis], lx, ly, lz,
                                    vol.resolution)
            neg_f = _trilerp_packed(vol.packed[2 * axis + 1], lx, ly, lz,
                                    vol.resolution)
            face_val = jnp.where((normal[..., axis] < 0.0)[..., None],
                                 neg_f, pos_f)
            contrib = contrib + n2[..., axis:axis + 1] * face_val
        result = result + contrib * w[..., None]
        weight = weight + w
    return result / jnp.maximum(weight, 1e-4)[..., None]


def fallback_cube_from_sky(sample_sky_fn, res: int = 16) -> jnp.ndarray:
    """update_fallback_volume / volumetric_light_compute_fallback.comp:
    ambient cube of the sky alone.  sample_sky_fn(dirs (N,3)) -> (N,3)."""
    dirs, area = face_solid_angle_weights(res)
    nrm = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    colors = sample_sky_fn(jnp.asarray(nrm.reshape(-1, 3)))
    colors = jnp.asarray(colors).reshape(6, res, res, 3)
    return ambient_cube_integral(colors, dirs, area)


def bake_volume(render_face_fn, node_world, resolution,
                face_res: int = 16, guard_band_factor: float = 0.9,
                guard_band_sharpen: float = 16.0) -> DiffuseVolume:
    """Bake a DiffuseVolume by rendering the scene from every probe.

    render_face_fn(pos (3,), face_idx) -> (face_res, face_res, 3)
    linear HDR radiance (the engine's own forward path — the analogue of
    create_probe_gbuffer + light_probe_buffer, volumetric_diffuse.cpp).
    """
    w2t, t2w = volume_transforms(node_world)
    pos = probe_positions(t2w, resolution)               # (Z, Y, X, 3)
    rx, ry, rz = resolution
    dirs, area = face_solid_angle_weights(face_res)
    cubes = np.zeros((rz, ry, rx, 6, 3), np.float32)
    for z in range(rz):
        for y in range(ry):
            for x in range(rx):
                faces = jnp.stack([
                    jnp.asarray(render_face_fn(pos[z, y, x], f))
                    for f in range(6)])
                cubes[z, y, x] = np.asarray(
                    ambient_cube_integral(faces, dirs, area))
    ambient = jnp.asarray(cubes.transpose(3, 0, 1, 2, 4))  # (6,Z,Y,X,3)
    return DiffuseVolume(world_to_tex=w2t, tex_to_world=t2w,
                         resolution=tuple(resolution), ambient=ambient,
                         packed=oct_pack_grid(ambient),
                         guard_band_factor=guard_band_factor,
                         guard_band_sharpen=guard_band_sharpen)
