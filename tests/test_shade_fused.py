"""Parity lock: the fused Pallas shade kernel (ops/shade_fused.py) vs
the classic XLA shade_surface path (renderer/scene_renderer.py).

The kernel transcribes lighting.h compute_lighting + clusterer.h
compute_cluster_light + the IBL combine 1:1; these tests run both paths
on the same synthetic G-buffer and require near-bitwise agreement
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from granite_tpu.math.muglm import look_at_matrix, perspective
from granite_tpu.ops.clusterer import (
    bin_lights_tiles, bin_lights_z, pack_lights,
)
from granite_tpu.ops.shadow import directional_shadow_matrix
from granite_tpu.renderer.scene_renderer import (
    shade_surface, shade_surface_fused,
)

H, W = 96, 160
Z_NEAR, Z_FAR = 0.1, 100.0


def _camera():
    eye = np.array([0.0, 2.0, 6.0], np.float32)
    view = look_at_matrix(eye, np.array([0.0, 0.5, 0.0], np.float32),
                          np.array([0.0, 1.0, 0.0], np.float32))
    proj = perspective(np.pi / 3, W / H, Z_NEAR, Z_FAR)
    vp = proj @ view
    return eye, view, vp, np.linalg.inv(vp).astype(np.float32)


def _surf(rng):
    """Synthetic G-buffer with world positions actually inside the view
    frustum (so the cluster z/tile masks exercise real bins)."""
    eye, view, vp, ivp = _camera()
    # Unproject every pixel at a random per-pixel depth.
    xs = (np.arange(W, dtype=np.float32)[None, :] + 0.5) / W * 2 - 1
    ys = (np.arange(H, dtype=np.float32)[:, None] + 0.5) / H * 2 - 1
    depth = rng.uniform(0.15, 0.95, (H, W)).astype(np.float32)
    ndc = np.stack([np.broadcast_to(xs, (H, W)),
                    np.broadcast_to(ys, (H, W)),
                    depth, np.ones((H, W), np.float32)], axis=-1)
    wp = ndc @ ivp.T
    pos = (wp[..., :3] / wp[..., 3:4]).astype(np.float32)
    n = rng.normal(size=(H, W, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    covered = (rng.uniform(size=(H, W)) < 0.8)
    surf = {
        "base_color": jnp.asarray(
            rng.uniform(0.05, 1.0, (H, W, 3)).astype(np.float32)),
        "normal": jnp.asarray(n),
        "metallic": jnp.asarray(
            rng.uniform(0.0, 1.0, (H, W)).astype(np.float32)),
        "roughness": jnp.asarray(
            rng.uniform(0.05, 1.0, (H, W)).astype(np.float32)),
        "pos": jnp.asarray(pos),
        "emissive": jnp.asarray(
            (rng.uniform(0.0, 0.2, (H, W, 3)) ** 2).astype(np.float32)),
        "covered": jnp.asarray(covered),
    }
    params = {
        "camera_pos": jnp.asarray(eye),
        "sun_dir": jnp.asarray(
            np.array([0.3, 0.8, 0.5], np.float32)
            / np.linalg.norm([0.3, 0.8, 0.5])),
        "sun_color": jnp.asarray(np.array([2.0, 1.9, 1.7], np.float32)),
        "view": jnp.asarray(view),
        "inv_view_proj": jnp.asarray(ivp),
    }
    return surf, params, view, vp


def _lights(view, vp, n=11, capacity=32):
    rng = np.random.default_rng(7)
    pos = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    pos[:, 2] = rng.uniform(-4, 4, n)
    col = rng.uniform(0.5, 6.0, (n, 3)).astype(np.float32)
    radii = rng.uniform(1.0, 6.0, n).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    inner = rng.uniform(0.2, 0.5, n).astype(np.float32)
    outer = inner + 0.3
    is_spot = (rng.uniform(size=n) < 0.5).astype(np.float32)
    lights = pack_lights(pos, col, radii, dirs, inner, outer, is_spot,
                         capacity=capacity)
    z_masks = bin_lights_z(lights, jnp.asarray(view), 32, Z_NEAR, Z_FAR)
    tile_masks = bin_lights_tiles(lights, jnp.asarray(vp), W, H, tile=64)
    return lights, z_masks, tile_masks


def _compare(a, b, tol=3e-4):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape
    scale = max(1.0, float(np.abs(a).max()))
    diff = np.abs(a - b).max() / scale
    assert diff < tol, f"fused vs classic max rel diff {diff}"


def test_fused_shade_sun_ambient():
    rng = np.random.default_rng(3)
    surf, params, view, vp = _surf(rng)
    kw = dict(width=W, height=H,
              background=jnp.asarray(np.array([0.1, 0.2, 0.3],
                                              np.float32)))
    ref = shade_surface(surf, params, **kw)
    out = shade_surface_fused(surf, params, interpret=True, **kw)
    _compare(ref, out)


def test_fused_shade_shadow_lights_ao():
    rng = np.random.default_rng(5)
    surf, params, view, vp = _surf(rng)
    lights, z_masks, tile_masks = _lights(view, vp)
    # A real shadow map: random depths so some pixels land shadowed.
    smap = jnp.asarray(rng.uniform(0.0, 1.0, (128, 128)).astype(np.float32))
    uv_mat = jnp.asarray(directional_shadow_matrix(
        np.asarray(params["sun_dir"]),
        np.full(3, -8.0, np.float32), np.full(3, 8.0, np.float32)))
    ao = jnp.asarray(rng.uniform(0.3, 1.0, (H, W)).astype(np.float32))
    kw = dict(shadow_map=smap, shadow_uv_mat=uv_mat, lights=lights,
              z_masks=z_masks, tile_masks=tile_masks, width=W, height=H,
              background=jnp.asarray(np.zeros(3, np.float32)),
              z_near=Z_NEAR, z_far=Z_FAR, ao=ao)
    ref = shade_surface(surf, params, **kw)
    out = shade_surface_fused(surf, params, interpret=True, **kw)
    _compare(ref, out)
    # the clustered lights must actually contribute in this setup
    base = shade_surface(surf, params, **{**kw, "lights": None,
                                          "z_masks": None,
                                          "tile_masks": None})
    assert float(np.abs(np.asarray(ref) - np.asarray(base)).max()) > 1e-3


def test_fused_shade_env_ibl():
    from granite_tpu.renderer.environment import (
        Environment, procedural_sky_equirect,
    )
    rng = np.random.default_rng(11)
    surf, params, view, vp = _surf(rng)
    lights, z_masks, tile_masks = _lights(view, vp, n=5)
    environment = Environment(procedural_sky_equirect(32))
    env = {"strips": environment.strips, "sh": environment.sh,
           "levels": environment.num_levels, "sky_params": None}
    kw = dict(lights=lights, z_masks=z_masks, tile_masks=tile_masks,
              width=W, height=H, z_near=Z_NEAR, z_far=Z_FAR, env=env)
    ref = shade_surface(surf, params, **kw)
    out = shade_surface_fused(surf, params, interpret=True, **kw)
    _compare(ref, out)


def test_fused_shade_cluster_shadows():
    """Top-K shadow-atlas terms: the kernel resolves slot planes to
    per-light shadow multipliers (clusterer.hpp:52-58 path)."""
    from granite_tpu.ops.light_shadows import assign_slices, pack_atlas
    rng = np.random.default_rng(17)
    surf, params, view, vp = _surf(rng)
    lights, z_masks, tile_masks = _lights(view, vp, n=3)
    infos = [{"pos": np.asarray(lights.pos[i]),
              "dir": np.asarray(lights.dir[i]),
              "radius": 1.0 / float(lights.inv_radius[i]),
              "outer": 0.6,
              "is_spot": bool(lights.is_spot[i] > 0.5)}
             for i in range(3)]
    vps, slice_np, kind_np = assign_slices(infos)
    size = 32
    ns = vps.shape[0]
    atlas = jnp.asarray(
        rng.uniform(0.0, 1.0, (ns, size, size)).astype(np.float32))
    cs = {"atlas_flat": pack_atlas(atlas), "vps_np": vps, "size": size,
          "num_lights": 3, "light_slice_np": slice_np,
          "light_kind_np": kind_np,
          "light_pos_np": np.asarray(lights.pos[:3]), "k": 2,
          "bias": 2e-3}
    kw = dict(lights=lights, z_masks=z_masks, tile_masks=tile_masks,
              width=W, height=H, z_near=Z_NEAR, z_far=Z_FAR,
              background=jnp.asarray(np.zeros(3, np.float32)),
              cluster_shadows=cs)
    ref = shade_surface(surf, params, **kw)
    out = shade_surface_fused(surf, params, interpret=True, **kw)
    _compare(ref, out)


def test_fused_shade_pcf_wide_vsm():
    rng = np.random.default_rng(13)
    surf, params, view, vp = _surf(rng)
    uv_mat = jnp.asarray(directional_shadow_matrix(
        np.asarray(params["sun_dir"]),
        np.full(3, -8.0, np.float32), np.full(3, 8.0, np.float32)))
    # VSM moments map (S, S, 2).
    d = rng.uniform(0.0, 1.0, (64, 64)).astype(np.float32)
    vsm = jnp.asarray(np.stack([d, d * d + 1e-4], axis=-1))
    kw = dict(shadow_map=vsm, shadow_uv_mat=uv_mat, width=W, height=H,
              background=jnp.asarray(np.zeros(3, np.float32)))
    ref = shade_surface(surf, params, **kw)
    out = shade_surface_fused(surf, params, interpret=True, **kw)
    _compare(ref, out)
