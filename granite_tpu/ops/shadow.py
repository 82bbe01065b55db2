"""Directional shadow mapping + PCF filters.

Reference: assets/shaders/lights/pcf.h — the default path is a single
hardware 2x2 bilinear-compare tap (textureProjLod with a shadow sampler);
SHADOW_MAP_PCF_KERNEL_WIDE enables a 6x6 windowed kernel built from 3x3
textureGathers with weights exp2(-0.375 x^2) * (1 - x^2/9).
Both are reproduced here as vectorized gather+compare ops.

Depth convention: shadow maps are rendered with the same reverse-Z
projections as the main view (muglm ortho, reverse-Z); the shadow compare
is GEQUAL — a receiver is LIT when its depth-from-light z_ref >= stored
occluder depth (larger = closer to the light).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..math.muglm import ortho, look_at_matrix


def directional_shadow_matrix(light_dir, scene_min, scene_max,
                              up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Fit an ortho reverse-Z light frustum around the scene AABB.

    light_dir points FROM surface TOWARD the light.  Returns the 4x4
    light view-proj (world -> light clip).  (Analogue of the shadow-map
    setup in renderer/lights/lights.cpp for a single cascade.)
    """
    light_dir = np.asarray(light_dir, np.float32)
    light_dir = light_dir / np.linalg.norm(light_dir)
    center = 0.5 * (np.asarray(scene_min) + np.asarray(scene_max))
    radius = 0.5 * float(np.linalg.norm(
        np.asarray(scene_max) - np.asarray(scene_min)))
    if abs(np.dot(light_dir, np.asarray(up, np.float32))) > 0.99:
        up = (0.0, 0.0, 1.0)
    eye = center + light_dir * radius * 1.5
    view = look_at_matrix(eye, center, up)
    proj = ortho(-radius, radius, -radius, radius, 0.5 * radius, 2.5 * radius)
    return (proj @ view).astype(np.float32)


def shadow_uv_transform(light_vp: np.ndarray) -> np.ndarray:
    """World -> shadow-map texture space (uv in [0,1], z = light depth).

    Folds the NDC->UV remap into the matrix like the reference's
    SHADOW_TRANSFORMS (lighting_resources.h:105): uv = xy*0.5+0.5."""
    remap = np.array([[0.5, 0, 0, 0.5],
                      [0, 0.5, 0, 0.5],
                      [0, 0, 1.0, 0.0],
                      [0, 0, 0, 1.0]], np.float32)
    return (remap @ light_vp).astype(np.float32)


def _compare(ref_z, stored, bias):
    # GEQUAL on reverse-Z: lit if receiver depth >= occluder depth - bias.
    return (ref_z >= stored - bias).astype(jnp.float32)


def pcf_2x2(shadow_map, u, v, ref_z, bias: float = 1e-3):
    """Hardware-style bilinear 2x2 percentage-closer compare
    (the default SAMPLE_PCF_KERNEL path, pcf.h textureProjLod).

    Quad-packs the map with VPU shifts and fetches the 2x2 footprint in
    ONE single-index gather (ops/texture.py gather economics)."""
    from .texture import quad_pack2d
    h, w = shadow_map.shape[:2]
    packed = quad_pack2d(shadow_map[..., None])      # (H, W, 4)
    x = u * w - 0.5
    y = v * h - 0.5
    # Clamped start + adjusted frac == per-texel clamp of the old path
    # (the packed +1 taps are edge copies at the border).
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    fx = jnp.clip(x - x0.astype(x.dtype), 0.0, 1.0)
    fy = jnp.clip(y - y0.astype(y.dtype), 0.0, 1.0)
    c = _compare(ref_z[..., None], packed[y0, x0], bias)   # (..., 4)
    top = c[..., 0] * (1 - fx) + c[..., 1] * fx
    bot = c[..., 2] * (1 - fx) + c[..., 3] * fx
    term = top * (1 - fy) + bot * fy
    # Outside the light frustum -> fully lit (white border sampler).
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (ref_z <= 1.0)
    return jnp.where(inside, term, 1.0)


def _pcf_kernel_weight(x):
    """pcf.h shadow_map_pcf_kernel: exp2(-0.375 x^2) * (1 - x^2 / 9)."""
    x2 = x * x
    return jnp.exp2(-0.375 * x2) * (1.0 - x2 / 9.0)


def pcf_wide(shadow_map, u, v, ref_z, bias: float = 1e-3):
    """6x6 windowed PCF (SHADOW_MAP_PCF_KERNEL_WIDE, pcf.h:10-74).

    Taps the 6x6 texel neighborhood around the sample point with the
    reference's windowing weights; fully vectorized (36 gathers fused by
    XLA into one loop nest).
    """
    from .texture import quad_pack2d
    h, w = shadow_map.shape[:2]
    packed = quad_pack2d(shadow_map[..., None])      # (H, W, 4)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    # Nine quad fetches at even offsets cover the 6x6 tap window (9
    # gathers instead of 36; border blocks clamp the whole 2x2 instead
    # of per tap — identical away from the outer shadow-map texels,
    # which the frustum-fit matrices never map receivers to).
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    acc = 0.0
    total_w = 0.0
    for by in (-2, 0, 2):
        yb = jnp.clip(y0i + by, 0, h - 1)
        for bx in (-2, 0, 2):
            xb = jnp.clip(x0i + bx, 0, w - 1)
            quad = packed[yb, xb]                    # (..., 4)
            c = _compare(ref_z[..., None], quad, bias)
            for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0),
                                          (1, 1))):
                wgt = (_pcf_kernel_weight(by + dy - fy)
                       * _pcf_kernel_weight(bx + dx - fx))
                acc = acc + wgt * c[..., k]
                total_w = total_w + wgt
    term = acc / total_w
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (ref_z <= 1.0)
    return jnp.where(inside, term, 1.0)


def sample_directional_shadow(shadow_map, shadow_uv_mat, world_pos,
                              wide: bool = False, bias: float = 1e-3):
    """get_directional_shadow_term (lighting_resources.h:120, single
    cascade): project world position into the shadow map and PCF."""
    m = shadow_uv_mat
    uvw = (world_pos @ m[:3, :3].T) + m[:3, 3]
    u, v, z = uvw[..., 0], uvw[..., 1], uvw[..., 2]
    if wide:
        return pcf_wide(shadow_map, u, v, z, bias)
    return pcf_2x2(shadow_map, u, v, z, bias)


# ---------------------------------------------------------------------------
# Variance shadow maps (assets/shaders/lights/vsm.h + resolve_vsm.frag:
# moments (z, z^2) blurred, Chebyshev upper bound with light-leak clamp).
# Our maps are reverse-Z (larger = closer to the light), so the receiver
# is potentially occluded when its depth is SMALLER than the mean.
# ---------------------------------------------------------------------------

def vsm_moments(depth, blur: bool = True):
    """(S, S) depth -> (S, S, 2) blurred moments (the VSM resolve+blur
    passes; 5-tap binomial approximating the reference's blur.frag)."""
    import jax.numpy as jnp
    m = jnp.stack([depth, depth * depth], axis=-1)
    if not blur:
        return m
    k = jnp.asarray(np.array([1, 4, 6, 4, 1], np.float32) / 16.0)

    def blur_axis(x, axis):
        x = jnp.moveaxis(x, axis, 0)
        n = x.shape[0]
        pad = jnp.concatenate([x[:1], x[:1], x, x[-1:], x[-1:]])
        out = sum(k[j] * pad[j:j + n] for j in range(5))
        return jnp.moveaxis(out, 0, axis)

    return blur_axis(blur_axis(m, 0), 1)


def _vsm_term(depth, m1, m2):
    import jax.numpy as jnp
    variance = jnp.maximum(m2 - m1 * m1, 1e-5)
    d = m1 - depth                       # reverse-Z: occluded if closer-0
    term = variance / (variance + d * d)
    term = jnp.clip((term - 0.25) / 0.75, 0.0, 1.0)  # light-leak clamp
    return jnp.where(depth < m1, term, 1.0)


def sample_vsm_shadow(moments, shadow_uv_mat, world_pos):
    """Directional VSM term: bilinear moment fetch + Chebyshev."""
    import jax.numpy as jnp
    from .hdr import _sample_bilinear_uv
    m = shadow_uv_mat
    uvw = (world_pos @ m[:3, :3].T) + m[:3, 3]
    u, v, z = uvw[..., 0], uvw[..., 1], uvw[..., 2]
    mm = _sample_bilinear_uv(moments, u, v)
    term = _vsm_term(z, mm[..., 0], mm[..., 1])
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (z <= 1.0)
    return jnp.where(inside, term, 1.0)


# ---------------------------------------------------------------------------
# Cascaded shadow maps (SHADOW_NUM_CASCADES=4 in directional.frag:8;
# cascade selection in lighting_resources.h compute_shadow_cascade with a
# log depth split + cross-fade band).
# ---------------------------------------------------------------------------

def cascade_matrices(light_dir, camera_pos, camera_front, scene_min,
                     scene_max, num_cascades: int = 4,
                     first_radius: float = 8.0,
                     up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Fit one ortho frustum per cascade around view-distance bands.

    Cascade c covers camera distance up to first_radius * 2^c (the log
    split of the reference's cascade_log_bias scheme); each is centered
    ahead of the camera and clamped to the scene bounds for the depth
    range.  Returns (C, 4, 4) light view-proj matrices.
    """
    light_dir = np.asarray(light_dir, np.float32)
    light_dir = light_dir / np.linalg.norm(light_dir)
    camera_pos = np.asarray(camera_pos, np.float32)
    camera_front = np.asarray(camera_front, np.float32)
    scene_r = 0.5 * float(np.linalg.norm(
        np.asarray(scene_max) - np.asarray(scene_min)))
    if abs(np.dot(light_dir, np.asarray(up, np.float32))) > 0.99:
        up = (0.0, 0.0, 1.0)
    mats = []
    for c in range(num_cascades):
        radius = first_radius * (2.0 ** c)
        center = camera_pos + camera_front * (0.5 * radius)
        eye = center + light_dir * (scene_r + radius)
        view = look_at_matrix(eye, center, up)
        proj = ortho(-radius, radius, -radius, radius,
                     0.5 * radius, 2.0 * (scene_r + radius))
        mats.append((proj @ view).astype(np.float32))
    return np.stack(mats)


def sample_cascaded_shadow(shadow_maps, cascade_uv_mats, world_pos,
                           wide: bool = False, bias: float = 1e-3):
    """Cascade selection + PCF + cross-fade (compute_shadow_cascade).

    shadow_maps: (C, S, S); cascade_uv_mats: (C, 4, 4) world->uvz.
    Selection: the first cascade whose UV footprint contains the point
    with margin; a 10% border band cross-fades to the next cascade.
    """
    import jax
    import jax.numpy as jnp
    C = shadow_maps.shape[0]
    terms = []
    inside = []
    for c in range(C):
        m = cascade_uv_mats[c]
        uvw = (world_pos @ m[:3, :3].T) + m[:3, 3]
        u, v, z = uvw[..., 0], uvw[..., 1], uvw[..., 2]
        t = pcf_wide(shadow_maps[c], u, v, z, bias) if wide else \
            pcf_2x2(shadow_maps[c], u, v, z, bias)
        terms.append(t)
        margin = jnp.maximum(jnp.maximum(jnp.abs(u - 0.5),
                                         jnp.abs(v - 0.5)) * 2.0, 0.0)
        inside.append(margin)       # < 1 means inside, smaller = deeper
    term = jnp.ones_like(terms[0])
    # Blend far-to-near so nearer cascades override.
    for c in reversed(range(C)):
        w = jnp.clip((1.0 - inside[c]) / 0.1, 0.0, 1.0)  # fade band 10%
        term = term + (terms[c] - term) * w
    return term


def sample_vsm_shadow_tiled(moments, shadow_uv_mat, world_pos, covered,
                            strips=None):
    """Directional VSM via the tile-rect Pallas sampler.

    Same math as sample_vsm_shadow (vsm.h Chebyshev), but the moment
    fetch runs through ops/tile_sampler (rect DMA + weighted one-hot
    MXU matmul) instead of a ~16 ms per-pixel XLA gather: the moments
    become a clamp-wrapped f32 mip strip (linear moment filtering is
    exactly what VSM licenses), each screen tile DMAs the moment rect
    its footprint needs, picking a prefiltered level when the footprint
    exceeds the rect window (silhouette tiles).

    covered: (H, W) bool — pixels with valid world_pos; others skip the
    fetch (term 1.0) and do not inflate the tile rects.
    """
    import jax.numpy as jnp
    from .tile_sampler import build_tiled_strip_raw, sample_tiled
    m = shadow_uv_mat
    uvw = (world_pos @ m[:3, :3].T) + m[:3, 3]
    u, v, z = uvw[..., 0], uvw[..., 1], uvw[..., 2]
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (z <= 1.0)
    if strips is None:
        strips = build_tiled_strip_raw(moments, wrap=1)
    bundle = jnp.where(covered & inside, 0, -1).astype(jnp.int32)
    # The moment fetch runs at HALF RES: the kernel's cost is linear in
    # pixels x rect rows, and the VSM term is low-frequency by
    # construction (the moments are pre-blurred), so a bilinear
    # upsample of the Chebyshev term is visually exact away from
    # extreme penumbra gradients.
    H, W = u.shape
    if H % 2 == 0 and W % 2 == 0 and H >= 64:
        uh, vh, zh = u[::2, ::2], v[::2, ::2], z[::2, ::2]
        bh = bundle[::2, ::2]
        mm = sample_tiled(strips, uh, vh, jnp.zeros_like(uh), bh)
        term_h = _vsm_term(zh, mm[..., 0], mm[..., 1])
        from .hdr import resize_bilinear
        term = resize_bilinear(term_h[..., None], H, W)[..., 0]
    else:
        mm = sample_tiled(strips, u, v, jnp.zeros_like(u), bundle)
        term = _vsm_term(z, mm[..., 0], mm[..., 1])
    return jnp.where(inside, term, 1.0)
