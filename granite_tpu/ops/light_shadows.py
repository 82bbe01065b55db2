"""Clustered point/spot light shadows — the shadow-atlas path.

Reference: renderer/lights/clusterer.hpp:52-58 (set_shadow_type, PCF
atlas), shadow_resolution = 512 (clusterer.hpp:128), spot shadows via one
perspective map, point shadows via 6 cube faces
(assets/shaders/lights/pcf.h sampling).

TPU-native design:
  * every shadowed light gets 1 (spot) or 6 (point) SLICES of a depth
    atlas; slices are rendered with the binned rasterizer and — unlike
    the reference, which re-renders per frame because GPU raster is
    cheap — CACHED across frames for static casters (the scene_viewer
    re-renders the atlas when lights or static geometry change);
  * the atlas is quad-packed (ops/texture.quad_pack2d) and flattened so
    a bilinear-compare fetch from ANY slice is ONE single-index gather;
  * shading picks the first K shadowed lights per pixel from the cluster
    tile masks (cheap ALU scan) and fetches K shadow terms total,
    instead of one full-screen gather per light — gathers cost ~22ms per
    2M indices on the v5e regardless of locality, so the gather count
    per pixel is the budget (CLAUDE.md gather economics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..math.muglm import look_at_matrix, perspective

# Slice uv-matrix layout: world -> (x, y, z, w) clip of the slice's
# light projection; uv = 0.5*xy/w + 0.5, depth = z/w (reverse-Z).

FACE_DIRS = np.array([
    [1, 0, 0], [-1, 0, 0],
    [0, 1, 0], [0, -1, 0],
    [0, 0, 1], [0, 0, -1]], np.float32)
FACE_UPS = np.array([
    [0, 1, 0], [0, 1, 0],
    [0, 0, 1], [0, 0, -1],
    [0, 1, 0], [0, 1, 0]], np.float32)


def spot_shadow_matrix(pos, direction, outer_cone: float,
                       radius: float) -> np.ndarray:
    """Perspective reverse-Z light VP for a spot light."""
    pos = np.asarray(pos, np.float32)
    d = np.asarray(direction, np.float32)
    d = d / max(np.linalg.norm(d), 1e-9)
    up = np.array([0, 1, 0], np.float32)
    if abs(float(d @ up)) > 0.99:
        up = np.array([0, 0, 1], np.float32)
    view = look_at_matrix(pos, pos + d, up)
    fov = min(max(2.0 * float(outer_cone), 0.1), 3.0)
    near = max(0.005 * radius, 1e-3)
    proj = perspective(fov, 1.0, near, radius)
    return (proj @ view).astype(np.float32)


def point_face_matrices(pos, radius: float) -> np.ndarray:
    """(6, 4, 4) reverse-Z 90-degree face VPs (cube shadow analogue)."""
    pos = np.asarray(pos, np.float32)
    near = max(0.005 * radius, 1e-3)
    proj = perspective(np.pi / 2, 1.0, near, radius)
    mats = []
    for f in range(6):
        view = look_at_matrix(pos, pos + FACE_DIRS[f], FACE_UPS[f])
        mats.append((proj @ view).astype(np.float32))
    return np.stack(mats)


def assign_slices(light_infos):
    """light_infos: list of dicts {pos, dir, radius, outer, is_spot}.
    Returns (vps (NS, 4, 4) np, light_slice (L,) int32, light_kind (L,)).
    light_slice[i] = first slice of light i (-1 if none);
    light_kind[i] = 0 spot (1 slice), 1 point (6 slices)."""
    vps = []
    slices = []
    kinds = []
    for li in light_infos:
        slices.append(len(vps))
        if li["is_spot"]:
            kinds.append(0)
            vps.append(spot_shadow_matrix(li["pos"], li["dir"],
                                          li["outer"], li["radius"]))
        else:
            kinds.append(1)
            vps.extend(point_face_matrices(li["pos"], li["radius"]))
    if not vps:
        vps = [np.eye(4, dtype=np.float32)]
    return (np.stack(vps).astype(np.float32),
            np.asarray(slices, np.int32), np.asarray(kinds, np.int32))


def pack_atlas(slices: jax.Array) -> jax.Array:
    """(NS, S, S) depth slices -> (NS*S*S, 4) quad-packed flat atlas.

    One gather at flat index ((slice*S + y)*S + x) returns the 2x2
    bilinear-compare footprint."""
    from .texture import quad_pack2d
    NS, S, _ = slices.shape
    packed = jax.vmap(lambda s: quad_pack2d(s[..., None]))(slices)
    return packed.reshape(NS * S * S, 4)


def pack_atlas_vsm(slices: jax.Array) -> jax.Array:
    """VSM variant (clusteredLightsShadowsVSM; clusterer.hpp
    ShadowType::VSM): (NS, S, S) depth slices -> blurred moment pairs,
    quad-packed to (NS*S*S, 8) — one gather returns the filterable 2x2
    (m1, m2) footprint."""
    from .shadow import vsm_moments
    from .texture import quad_pack2d
    NS, S, _ = slices.shape
    packed = jax.vmap(lambda s: quad_pack2d(vsm_moments(s)))(slices)
    return packed.reshape(NS * S * S, 8)


def _face_index(d):
    """Dominant-axis cube face: matches FACE_DIRS order."""
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    fx = jnp.where(d[..., 0] >= 0, 0, 1)
    fy = jnp.where(d[..., 1] >= 0, 2, 3)
    fz = jnp.where(d[..., 2] >= 0, 4, 5)
    f = jnp.where((ax >= ay) & (ax >= az), fx,
                  jnp.where(ay >= az, fy, fz))
    return f


def _light_sample_coords(world_pos, vps_np, slice0: int, kind: int,
                         light_pos_np, size: int):
    """Per-pixel flat atlas index + compare data for ONE light whose
    matrices are STATIC (host-known) — pure ALU, no gathers.

    Returns (flat_idx, z_ref, fx, fy, inside)."""
    S = size
    if kind == 1:
        # CLOSED-FORM cube-face projection.  Every face shares the one
        # perspective(pi/2, 1, near, radius) matrix, and each face view
        # is an axis permutation/sign of d = p - light_pos (FACE_DIRS/
        # FACE_UPS are unit axes, so look_at's rows are exact +-axes) —
        # algebraically identical to the 6 per-pixel matrix transforms
        # + select tree this replaces, at ~1/4 the VPU work (8 point
        # lights x 6 transforms dominated the clustered-shadow term's
        # ALU).  Derivation per face (camera x_c, y_c; z_c = -|d_major|):
        #   +X: ( dz, dy)  -X: (-dz, dy)
        #   +Y: ( dx, dz)  -Y: ( dx,-dz)
        #   +Z: (-dx, dy)  -Z: ( dx, dy)
        # u = 0.5*x_c/w + 0.5, v = 0.5*(-y_c)/w + 0.5 (Vulkan Y-flip),
        # z = -m22 + m23/w with w = -z_c = |d_major| = max component.
        d = world_pos - jnp.asarray(light_pos_np)
        face = _face_index(d)
        dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
        is_x = face < 2
        is_y = (face == 2) | (face == 3)
        neg = (face & 1) == 1                 # faces 1, 3, 5
        # x_c: +-dz on X faces, dx elsewhere except -dx on +Z (face 4).
        x_c = jnp.where(is_x, jnp.where(neg, -dz, dz),
                        jnp.where(face == 4, -dx, dx))
        # y_c: +-dz on Y faces, dy elsewhere.
        y_c = jnp.where(is_y, jnp.where(neg, -dz, dz), dy)
        w = jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)),
                        jnp.maximum(jnp.abs(dz), 1e-9))
        # Reverse-Z terms of the shared face projection P (muglm
        # perspective with zfar=radius): z = -m22 + m23 / w (z_c = -w).
        # Recovered host-side from face 0's VP = P @ V:
        # VP[2, :3] = -m22 * f  (f unit)  ->  m22 = |VP[2, :3]|;
        # VP[2, 3]  = m22 * (f . pos) + m23 = -VP[2, :3] . pos + m23.
        _row = np.asarray(vps_np[slice0])[2]
        m22 = float(np.linalg.norm(_row[:3]))
        m23 = float(_row[3] + _row[:3]
                    @ np.asarray(light_pos_np, np.float32))
        inv_w = 1.0 / w
        u = 0.5 * x_c * inv_w + 0.5
        v = -0.5 * y_c * inv_w + 0.5
        z = -m22 + m23 * inv_w
        slice_id = slice0 + face
        x = u * S - 0.5
        y = v * S - 0.5
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, S - 1)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, S - 1)
        fx = jnp.clip(x - x0.astype(x.dtype), 0.0, 1.0)
        fy = jnp.clip(y - y0.astype(y.dtype), 0.0, 1.0)
        flat = (slice_id * S + y0) * S + x0
        inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) \
            & (z >= 0.0) & (z <= 1.0)
        return flat, z, fx, fy, inside
    else:
        m = jnp.asarray(vps_np[slice0])
        xyzw = world_pos @ m[:, :3].T + m[:, 3]
        slice_id = slice0
    w = jnp.maximum(xyzw[..., 3], 1e-9)
    u = 0.5 * xyzw[..., 0] / w + 0.5
    v = 0.5 * xyzw[..., 1] / w + 0.5
    z = xyzw[..., 2] / w
    x = u * S - 0.5
    y = v * S - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, S - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, S - 1)
    fx = jnp.clip(x - x0.astype(x.dtype), 0.0, 1.0)
    fy = jnp.clip(y - y0.astype(y.dtype), 0.0, 1.0)
    flat = (slice_id * S + y0) * S + x0
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (z >= 0.0) \
        & (z <= 1.0)
    return flat, z, fx, fy, inside


def topk_shadow_terms(atlas_flat, vps_np, size: int, num_lights: int,
                      light_slice_np, light_kind_np, light_pos_np,
                      pixel_masks, world_pos, k: int = 4,
                      bias: float = 2e-3, half_res: bool = False):
    """Per-pixel shadow terms of the first K cluster-active shadowed
    lights: K atlas gathers TOTAL, independent of the light count.

    The per-light projection math runs for every light (static matrices,
    pure VPU) and only the flat atlas index + compare data are selected
    into the K slots; the expensive per-pixel gathers happen once per
    slot.  pixel_masks: (..., words) uint32 cluster masks (z & tile
    ANDed).  Returns (slot_light (K, ...) int32 [-1 = empty],
    terms (K, ...) float32).

    half_res: evaluate at every-other-pixel and repeat-upsample 2x2.
    Both the K gathers AND the per-light projection/select ALU scale
    with pixel count (gathers ~4 ns/index on the v5e regardless of
    locality — CLAUDE.md gather economics), so this quarters the whole
    term's cost; the atlas sample is already bilinear, so the upsample
    costs one 2-px quantization of shadow-edge positions (same trade
    the tiled-VSM sun term makes).
    """
    if half_res and world_pos.ndim == 3:
        H, W = world_pos.shape[0], world_pos.shape[1]
        slots, terms = topk_shadow_terms(
            atlas_flat, vps_np, size, num_lights, light_slice_np,
            light_kind_np, light_pos_np, pixel_masks[::2, ::2],
            world_pos[::2, ::2], k=k, bias=bias)
        slots = jnp.repeat(jnp.repeat(slots, 2, axis=1), 2, axis=2)
        terms = jnp.repeat(jnp.repeat(terms, 2, axis=1), 2, axis=2)
        return slots[:, :H, :W], terms[:, :H, :W]
    shape = world_pos.shape[:-1]
    minus1 = jnp.full(shape, -1, jnp.int32)
    slot_light = [minus1 for _ in range(k)]
    zero = jnp.zeros(shape, jnp.float32)
    slot_flat = [jnp.zeros(shape, jnp.int32) for _ in range(k)]
    slot_z = [zero for _ in range(k)]
    slot_fx = [zero for _ in range(k)]
    slot_fy = [zero for _ in range(k)]
    slot_in = [jnp.zeros(shape, bool) for _ in range(k)]
    taken = jnp.zeros(shape, jnp.int32)
    for i in range(num_lights):
        if light_slice_np[i] < 0:
            continue
        word = i // 32
        bit = jnp.uint32(1) << jnp.uint32(i % 32)
        active = (pixel_masks[..., word] & bit) != 0
        flat, z, fx, fy, inside = _light_sample_coords(
            world_pos, vps_np, int(light_slice_np[i]),
            int(light_kind_np[i]), light_pos_np[i], size)
        for s in range(k):
            place = active & (taken == s)
            slot_light[s] = jnp.where(place, i, slot_light[s])
            slot_flat[s] = jnp.where(place, flat, slot_flat[s])
            slot_z[s] = jnp.where(place, z, slot_z[s])
            slot_fx[s] = jnp.where(place, fx, slot_fx[s])
            slot_fy[s] = jnp.where(place, fy, slot_fy[s])
            slot_in[s] = jnp.where(place, inside, slot_in[s])
        taken = taken + active.astype(jnp.int32)

    vsm = atlas_flat.shape[-1] == 8
    terms = []
    for s in range(k):
        quad = atlas_flat[slot_flat[s]]              # ONE gather per slot
        fx, fy = slot_fx[s], slot_fy[s]
        if vsm:
            # Filterable moments: bilinear (m1, m2) then Chebyshev
            # (vsm.h; channels [m1 m2] x [t00 t10 t01 t11]).
            from .shadow import _vsm_term
            q = quad.reshape(quad.shape[:-1] + (4, 2))
            top = q[..., 0, :] * (1 - fx[..., None]) \
                + q[..., 1, :] * fx[..., None]
            bot = q[..., 2, :] * (1 - fx[..., None]) \
                + q[..., 3, :] * fx[..., None]
            mm = top * (1 - fy[..., None]) + bot * fy[..., None]
            term = _vsm_term(slot_z[s], mm[..., 0], mm[..., 1])
        else:
            c = (slot_z[s][..., None] >= quad - bias).astype(jnp.float32)
            top = c[..., 0] * (1 - fx) + c[..., 1] * fx
            bot = c[..., 2] * (1 - fx) + c[..., 3] * fx
            term = top * (1 - fy) + bot * fy
        term = jnp.where(slot_in[s], term, 1.0)
        terms.append(jnp.where(slot_light[s] >= 0, term, 1.0))
    return jnp.stack(slot_light), jnp.stack(terms)
