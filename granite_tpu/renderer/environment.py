"""Environment lighting: skybox + IBL (reference: renderer/mesh_util
SkyboxMesh/SkyCylinder, tools/convert_{cube,equirect}_to_environment,
tools/brdf_lut_generate, lighting_resources.h environment sampling).

TPU-native form:
  * the environment is an equirect radiance map stored as a mip strip
    (specular prefilter approximated by the mip pyramid, the same
    trick the reference's convolution tool bakes offline);
  * diffuse irradiance is projected to 9 spherical-harmonic coefficients
    at load (one vectorized pass) and evaluated per pixel at shading —
    cheaper and smoother than the reference's cubemap convolution;
  * the skybox "mesh" disappears: background pixels evaluate the sky
    directly from the per-pixel view ray (no geometry, no depth tricks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def procedural_sky_equirect(height: int = 128,
                            sun_dir=(0.35, 0.9, 0.25),
                            sun_color=(3.0, 2.8, 2.5),
                            zenith=(0.20, 0.35, 0.65),
                            horizon=(0.55, 0.62, 0.72),
                            ground=(0.22, 0.2, 0.18)) -> np.ndarray:
    """A simple physically-plausible gradient sky with a sun disk.
    Returns (H, 2H, 3) float32 linear radiance, equirect mapping
    (u = azimuth/2pi, v = polar/pi, +Y up)."""
    w = 2 * height
    v = (np.arange(height) + 0.5) / height
    u = (np.arange(w) + 0.5) / w
    theta = v * np.pi                       # 0 = +Y (up)
    phi = u * 2 * np.pi
    st = np.sin(theta)[:, None]
    y = np.cos(theta)[:, None] * np.ones((1, w))
    x = st * np.cos(phi)[None, :]
    z = st * np.sin(phi)[None, :]
    sd = np.asarray(sun_dir, np.float32)
    sd = sd / np.linalg.norm(sd)
    cos_sun = x * sd[0] + y * sd[1] + z * sd[2]

    from ..ops.fastmath import pow07
    t = pow07(np.clip(y, 0.0, 1.0), np)
    sky = (np.asarray(horizon, np.float32)[None, None]
           * (1 - t[..., None])
           + np.asarray(zenith, np.float32)[None, None] * t[..., None])
    g = np.clip(-y, 0.0, 1.0)[..., None]
    img = sky * (1 - g) + np.asarray(ground, np.float32)[None, None] * g
    sun = np.clip((cos_sun - 0.9995) / 0.0005, 0.0, 1.0)[..., None]
    halo = (np.clip(cos_sun, 0, 1) ** 64)[..., None]
    img = img + np.asarray(sun_color, np.float32) * (40.0 * sun + 0.2 * halo)
    return img.astype(np.float32)


def project_sh9(env: np.ndarray) -> np.ndarray:
    """Project an equirect radiance map onto 9 SH coefficients (3 bands).
    Returns (9, 3) float32 — the irradiance-convolved coefficients
    (A_l factors folded in) so evaluation is a plain dot product."""
    h, w = env.shape[:2]
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    theta = v * np.pi
    phi = u * 2 * np.pi
    st = np.sin(theta)[:, None]
    y = np.broadcast_to(np.cos(theta)[:, None], (h, w))
    x = st * np.cos(phi)[None, :]
    z = st * np.sin(phi)[None, :]
    d_omega = (np.pi / h) * (2 * np.pi / w) * st    # solid angle per texel

    Y = [0.282095 * np.ones_like(x),
         0.488603 * y, 0.488603 * z, 0.488603 * x,
         1.092548 * x * y, 1.092548 * y * z,
         0.315392 * (3 * y * y - 1.0),
         1.092548 * x * z, 0.546274 * (x * x - z * z)]
    A = [3.141593, 2.094395, 2.094395, 2.094395,
         0.785398, 0.785398, 0.785398, 0.785398, 0.785398]
    sh = np.zeros((9, 3), np.float32)
    for i in range(9):
        wgt = (Y[i] * d_omega)[..., None]
        sh[i] = (env * wgt).sum(axis=(0, 1)) * (A[i] / np.pi)
    return sh


def eval_sh9(sh, n):
    """Evaluate SH irradiance at unit normals n (..., 3) -> (..., 3)."""
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    basis = jnp.stack([
        0.282095 * jnp.ones_like(x),
        0.488603 * y, 0.488603 * z, 0.488603 * x,
        1.092548 * x * y, 1.092548 * y * z,
        0.315392 * (3 * y * y - 1.0),
        1.092548 * x * z, 0.546274 * (x * x - z * z)], axis=-1)
    return jnp.einsum("...i,ij->...j", basis, sh)


def _equirect_dirs(h: int, w: int):
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    theta = v * np.pi
    phi = u * 2 * np.pi
    st = np.sin(theta)[:, None]
    y = np.broadcast_to(np.cos(theta)[:, None], (h, w)).copy()
    x = st * np.cos(phi)[None, :]
    z = st * np.sin(phi)[None, :]
    return np.stack([x, y, z], -1).astype(np.float32)


def _sample_equirect_np(env: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Bilinear equirect lookup by direction (numpy, bake-time)."""
    h, w = env.shape[:2]
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    n = np.sqrt(np.maximum(x * x + y * y + z * z, 1e-20))
    theta = np.arccos(np.clip(y / n, -1, 1))
    phi = np.arctan2(z, x)
    u = np.where(phi < 0, phi + 2 * np.pi, phi) / (2 * np.pi)
    v = theta / np.pi
    fx = u * w - 0.5
    fy = np.clip(v * h - 0.5, 0, h - 1)
    x0 = np.floor(fx).astype(int)
    y0 = np.floor(fy).astype(int)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]
    x1 = (x0 + 1) % w
    x0 = x0 % w
    y1 = np.minimum(y0 + 1, h - 1)
    t = env[y0, x0] * (1 - ax) + env[y0, x1] * ax
    b = env[y1, x0] * (1 - ax) + env[y1, x1] * ax
    return t * (1 - ay) + b * ay


def prefilter_ggx_equirect(env: np.ndarray, base_size: int,
                           levels: int, samples: int = 64) -> list:
    """GGX-prefiltered specular chain (the split-sum bake of
    tools/convert_equirect_to_environment.cpp --reflection): level l is
    the environment convolved with the GGX lobe at roughness
    l / (levels - 1), importance-sampled with a Hammersley sequence.
    Returns [(S>>l, S>>l, 3) float32] equirect levels (square, resampled
    by the caller's strip builder)."""
    out = []
    i = np.arange(samples)
    # Hammersley (radical inverse base 2)
    bits = i.astype(np.uint32)
    bits = ((bits << 16) | (bits >> 16)) & 0xFFFFFFFF
    bits = (((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1))
    bits = (((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2))
    bits = (((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4))
    bits = (((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8))
    xi = np.stack([i / samples, bits * 2.3283064365386963e-10], -1)
    for l in range(levels):
        s = max(base_size >> l, 1)
        rough = l / max(levels - 1, 1)
        a = max(rough * rough, 1e-3)
        N = _equirect_dirs(s, s)
        up = np.where(np.abs(N[..., 1:2]) < 0.999,
                      np.array([0, 1, 0], np.float32),
                      np.array([1, 0, 0], np.float32))
        T = np.cross(up, N)
        T /= np.linalg.norm(T, axis=-1, keepdims=True)
        B = np.cross(N, T)
        acc = np.zeros((s, s, 3), np.float32)
        wsum = np.zeros((s, s, 1), np.float32)
        for k in range(samples):
            phi = 2 * np.pi * xi[k, 0]
            ct = np.sqrt((1 - xi[k, 1]) / (1 + (a * a - 1) * xi[k, 1]))
            st = np.sqrt(max(1 - ct * ct, 0.0))
            Hl = np.array([st * np.cos(phi), st * np.sin(phi), ct],
                          np.float32)
            H = Hl[0] * T + Hl[1] * B + Hl[2] * N
            noh = (N * H).sum(-1, keepdims=True)
            L = 2 * noh * H - N                      # V = N
            nol = np.clip((N * L).sum(-1, keepdims=True), 0, None)
            acc += _sample_equirect_np(env, L) * nol
            wsum += nol
        out.append((acc / np.maximum(wsum, 1e-6)).astype(np.float32))
    return out


ENV_BAKE_MAGIC = "GENV1"


def save_baked_environment(path: str, env: np.ndarray, base_size: int = 64,
                           levels: int | None = None,
                           samples: int = 64) -> dict:
    """Offline convolver output: GGX reflection chain + SH irradiance
    (+ a small cosine-convolved irradiance map) in one .npz."""
    levels = levels or int(np.log2(base_size)) + 1
    refl = prefilter_ggx_equirect(env, base_size, levels, samples)
    sh = project_sh9(env)
    # irradiance equirect (tool --irradiance): evaluate the SH per texel
    dirs = _equirect_dirs(32, 64)
    irr = np.maximum(np.asarray(eval_sh9(jnp.asarray(sh),
                                         jnp.asarray(dirs))), 0.0)
    baked = {"magic": ENV_BAKE_MAGIC, "sh": sh,
             "irradiance": np.asarray(irr, np.float32),
             "num_levels": levels}
    baked.update({f"reflection_{l}": refl[l] for l in range(levels)})
    np.savez(path, **baked)
    return baked


def load_baked_environment(path: str) -> dict:
    z = np.load(path, allow_pickle=False)
    assert str(z["magic"]) == ENV_BAKE_MAGIC, "not a GENV1 bake"
    n = int(z["num_levels"])
    return {"sh": z["sh"], "irradiance": z["irradiance"],
            "reflection": [z[f"reflection_{l}"] for l in range(n)]}


class Environment:
    """Sky + IBL bundle handed to the shading kernels."""

    def __init__(self, equirect: np.ndarray, intensity: float = 1.0,
                 sky_params: dict | None = None, baked: dict | None = None):
        """sky_params: when the equirect came from
        procedural_sky_equirect, its parameters — enables the ANALYTIC
        sky path (closed-form evaluation per pixel, zero gathers; the
        TPU-native specialization of the reference's skybox texture).

        baked: output of load_baked_environment — uses the offline
        GGX-prefiltered reflection chain instead of box mips."""
        from ..ops.texture import (
            build_packed_lod_strip_from_levels_np,
            build_packed_lod_strip_np,
        )
        h, w = equirect.shape[:2]
        # Resample equirect (H, 2H) -> square pow2 (S, S); stored as a
        # quad-packed gutter strip (ops/texture.py) so every bilinear env
        # fetch is ONE single-index gather (f32: HDR radiance, small).
        s = 1
        while s < max(h, w):
            s *= 2
        from ..assets.texture_array import _resize_bilinear
        if baked is not None:
            levels = [np.concatenate([lv, np.ones_like(lv[..., :1])], -1)
                      for lv in baked["reflection"]]
            s = levels[0].shape[0]
            strip = build_packed_lod_strip_from_levels_np(
                levels, dtype="float32")
            self.sh = jnp.asarray(np.asarray(baked["sh"], np.float32)
                                  * intensity)
        else:
            sq = _resize_bilinear(
                np.concatenate([equirect,
                                np.ones_like(equirect[..., :1])], axis=-1),
                s, s)
            strip = build_packed_lod_strip_np(sq.astype(np.float32),
                                               dtype="float32")
            self.sh = jnp.asarray(project_sh9(equirect) * intensity)
        self.strips = jnp.asarray(strip[None])   # (1, HS-1, S, 20)
        self.intensity = intensity
        self.num_levels = int(np.log2(s)) + 1
        self.sky_params = sky_params
        # Tile-rect form of the same content (ops/tile_sampler): the
        # per-pixel specular IBL fetch becomes a rect DMA + one-hot MXU
        # matmul instead of a ~4 ns/index XLA gather.  Reflection dirs
        # vary fast across a screen tile, so footprints are wide and the
        # planner self-selects coarse prefiltered levels — exactly the
        # right content for a prefiltered chain.
        self.tiled = None
        if s <= 512:
            from ..ops.tile_sampler import build_tiled_strips_np
            if baked is not None:
                # extend a short prefiltered chain to the full pyramid
                # (box mips of the roughest level) so every strip level
                # row is populated
                chain = list(levels)
                lv = chain[-1]
                while lv.shape[0] > 1:
                    n2 = lv.shape[0] // 2
                    lv = lv.reshape(n2, 2, n2, 2, lv.shape[-1]) \
                        .mean(axis=(1, 3)).astype(np.float32)
                    chain.append(lv)
                self.tiled = build_tiled_strips_np(
                    [chain[0]], levels_list=[chain])
            else:
                self.tiled = build_tiled_strips_np([sq.astype(np.float32)])

    def device_params(self) -> dict:
        return {"env_strips": self.strips, "env_sh": self.sh}


def sample_environment(strips, dirs, lod):
    """Sample the equirect env by direction (..., 3) at a given lod.

    An integer (Python) lod takes the single-level bilinear path — one
    single-index gather; used for the sky background (always level 0)."""
    from ..ops.fastmath import equirect_uv
    from ..ops.texture import sample_packed_level, sample_packed_lod
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    # Polynomial acos/atan2 (ops/fastmath): libm transcendentals at
    # pixel rate cost more than the texture gather they feed (~13 ms
    # at half-res 1080p, measured round 2); the ~1e-4 rad error is
    # ~0.005 texels at 256^2.
    u, v = equirect_uv(x, y, z)
    # Clamp v away from the poles: the sampler wraps both axes (repeat),
    # which is right for azimuth but would pull the opposite pole row in.
    s = strips.shape[2]
    v = jnp.clip(v, 0.5 / s, 1.0 - 0.5 / s)
    if isinstance(lod, int):
        # Single-level bilinear (sky background): quad channels only.
        return sample_packed_level(strips, jnp.int32(0), u, v,
                                   jnp.int32(lod), 4, wrap=0)[..., :3]
    # Approximate trilinear via the baked parent tap — ONE gather
    # instead of sample_packed_trilinear's two (the 5C LOD strip).
    return sample_packed_lod(strips, jnp.int32(0), u, v, lod,
                             4, wrap=0)[..., :3]


def sample_environment_tiled(tiled, dirs, lod, covered=None):
    """sample_environment through the tile-rect Pallas sampler
    (ops/tile_sampler): same equirect mapping + quad/parent trilinear,
    but the fetch is rect DMA + one-hot matmul instead of a per-pixel
    gather.  covered: optional (H, W) bool — uncovered pixels skip the
    fetch (and do not inflate tile rects)."""
    from ..ops.fastmath import equirect_uv
    from ..ops.tile_sampler import sample_tiled
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    u, v = equirect_uv(x, y, z)
    s = tiled.size
    v = jnp.clip(v, 0.5 / s, 1.0 - 0.5 / s)
    if covered is None:
        bundle = jnp.zeros(u.shape, jnp.int32)
    else:
        bundle = jnp.where(covered, 0, -1).astype(jnp.int32)
    out = sample_tiled(tiled, u, v, jnp.asarray(lod, jnp.float32),
                       bundle)
    return out[..., :3]


def analytic_sky(dirs, sun_dir=(0.35, 0.9, 0.25),
                 sun_color=(3.0, 2.8, 2.5), zenith=(0.20, 0.35, 0.65),
                 horizon=(0.55, 0.62, 0.72), ground=(0.22, 0.2, 0.18)):
    """Closed-form procedural sky (the continuous twin of
    procedural_sky_equirect) — background pixels cost pure VPU math
    instead of a per-pixel texture gather."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    n = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    xn, yn, zn = x / n, y / n, z / n
    sd = np.asarray(sun_dir, np.float32)
    sd = sd / np.linalg.norm(sd)
    cos_sun = xn * sd[0] + yn * sd[1] + zn * sd[2]
    from ..ops.fastmath import pow07
    t = pow07(jnp.clip(yn, 0.0, 1.0))
    sky = (jnp.asarray(horizon, jnp.float32) * (1 - t[..., None])
           + jnp.asarray(zenith, jnp.float32) * t[..., None])
    g = jnp.clip(-yn, 0.0, 1.0)[..., None]
    img = sky * (1 - g) + jnp.asarray(ground, jnp.float32) * g
    sun = jnp.clip((cos_sun - 0.9995) / 0.0005, 0.0, 1.0)[..., None]
    halo = (jnp.clip(cos_sun, 0, 1) ** 64)[..., None]
    return img + jnp.asarray(sun_color, jnp.float32) \
        * (40.0 * sun + 0.2 * halo)
