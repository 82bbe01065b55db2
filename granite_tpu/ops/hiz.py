"""Hierarchical-Z pyramid + occlusion culling.

Reference: assets/shaders/post/hiz.comp (single-pass-downsample HiZ via
renderer/post/spd.cpp) and the two-phase GPU occlusion culler
(renderer/scene_renderer.hpp:132 CullingPhase, meshlet_cull.comp).

Reverse-Z conventions: depth 1 = near, 0 = far/background.  Each HiZ
level stores the MIN depth (farthest point) of its footprint, so a
conservative visibility test is: object VISIBLE if its nearest depth
(max z) >= the min over its screen rect at a level where the rect spans
<= 2x2 texels.

The TPU form: the pyramid is jnp.min reduce-windows (one fused chain —
the whole SPD shader collapses); the per-object test is a vectorized
4-texel gather over all objects at once.  Two-phase flow: cull against
LAST frame's pyramid (carried as graph history) and re-test; this module
provides the kernels, the viewer wires the conservative single-phase
variant (occlusionCulling knob).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_hiz(depth: jax.Array, levels: int | None = None) -> list:
    """Min-depth pyramid: [ (H,W), (H/2,W/2), ... ].  Non-pow2 sizes pad
    with +inf-equivalent (1.0 is NEAR in reverse-Z, so pad with the
    existing edge via 'edge' to stay conservative: use min over the pad
    of the same values)."""
    out = [depth]
    cur = depth
    n = levels or 32
    while len(out) < n and min(cur.shape) > 1:
        h, w = cur.shape
        ph, pw = h % 2, w % 2
        if ph or pw:
            cur = jnp.pad(cur, ((0, ph), (0, pw)), mode="edge")
        h2, w2 = cur.shape[0] // 2, cur.shape[1] // 2
        cur = cur.reshape(h2, 2, w2, 2).min(axis=(1, 3))
        out.append(cur)
    return out


def occlusion_test(hiz: list, rect_min: jax.Array, rect_max: jax.Array,
                   max_z: jax.Array, width: int, height: int) -> jax.Array:
    """Conservative visibility of screen rects against the pyramid.

    rect_min/rect_max: (N, 2) pixel coords; max_z: (N,) nearest depth of
    each object (reverse-Z).  Returns (N,) bool visible.

    Level selection: smallest level where the rect spans <= 2 texels, so
    4 gathers cover it (the standard HiZ occlusion query shape).
    """
    span = jnp.maximum(rect_max - rect_min, 0.0)            # (N, 2) px
    max_span = jnp.maximum(span[:, 0], span[:, 1])
    level = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(max_span, 1.0))),
                     0, len(hiz) - 1).astype(jnp.int32)

    visible = jnp.zeros(rect_min.shape[0], bool)
    evaluated = jnp.zeros(rect_min.shape[0], bool)
    for lv, tex in enumerate(hiz):
        sel = level == lv
        scale = float(1 << lv)
        h, w = tex.shape
        x0 = jnp.clip((rect_min[:, 0] / scale).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip((rect_min[:, 1] / scale).astype(jnp.int32), 0, h - 1)
        x1 = jnp.clip((rect_max[:, 0] / scale).astype(jnp.int32), 0, w - 1)
        y1 = jnp.clip((rect_max[:, 1] / scale).astype(jnp.int32), 0, h - 1)
        m = jnp.minimum(jnp.minimum(tex[y0, x0], tex[y0, x1]),
                        jnp.minimum(tex[y1, x0], tex[y1, x1]))
        # Visible if the object's nearest point is at least as close as
        # the farthest stored depth (>=: background 0 keeps visible).
        vis_lv = max_z >= m
        visible = jnp.where(sel & ~evaluated, vis_lv, visible)
        evaluated = evaluated | sel
    return visible | ~evaluated


def project_aabbs(world_min: jax.Array, world_max: jax.Array,
                  view_proj: jax.Array, width: int, height: int):
    """Project world AABBs to conservative screen rects + nearest depth.

    Returns (rect_min (N,2), rect_max (N,2), max_z (N,), on_screen (N,)).
    Objects with any corner behind the near plane are treated as visible
    (the reference's cull shader does the same conservative bail)."""
    n = world_min.shape[0]
    corners = jnp.asarray(np.array(
        [[(i >> k) & 1 for k in range(3)] for i in range(8)], np.float32))
    pts = (world_min[:, None, :] * (1 - corners[None])
           + world_max[:, None, :] * corners[None])        # (N, 8, 3)
    hcl = pts @ view_proj[:3, :3].T + view_proj[:3, 3]
    wcl = pts @ view_proj[3, :3].T + view_proj[3, 3]
    behind = (wcl <= 1e-6).any(axis=1)
    w_safe = jnp.where(jnp.abs(wcl) < 1e-6, 1e-6, wcl)
    sx = (0.5 * hcl[..., 0] / w_safe + 0.5) * width
    sy = (0.5 * hcl[..., 1] / w_safe + 0.5) * height
    z = hcl[..., 2] / w_safe
    rect_min = jnp.stack([sx.min(1), sy.min(1)], -1)
    rect_max = jnp.stack([sx.max(1), sy.max(1)], -1)
    max_z = jnp.clip(z.max(1), 0.0, 1.0)
    return rect_min, rect_max, max_z, behind
