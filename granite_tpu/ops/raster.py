"""Clip-less homogeneous triangle rasterizer → visibility buffer.

This replaces the reference's fixed-function Vulkan raster pipeline
(vertex shaders assets/shaders/static_mesh.vert + HW rasterizer) with a
TPU-native design:

  * **2D-homogeneous rasterization** (Olano-Greer): edge functions are built
    from clip-space vertices via the adjugate of the 3x3 matrix of
    (x_s, y_s, w) rows, so NO near-plane clipping is ever needed — triangles
    crossing w=0 rasterize their correct visible region.  This keeps the
    whole pipeline branch-free and fixed-shape, which is what XLA wants.
  * **Visibility-buffer output**: the raster pass produces only per-pixel
    (depth, triangle id).  Attribute interpolation and shading happen in a
    later deferred gather pass (`interpolate`), which turns per-pixel work
    into big regular vectorized ops — the TPU analogue of the reference's
    G-buffer pass (deferred.frag) fed by HW interpolators.
  * Reverse-Z (near=1, far=0) with GREATER depth test, matching muglm's
    projections (math/muglm/muglm.cpp:319 "Inverse Z"); clear depth is 0.
  * D3D/Vulkan **top-left fill rule** with exact shared-edge complementarity:
    the adjugate computes the shared edge of two adjacent triangles as
    cross(a, b) and cross(b, a) — exact float negations — so every boundary
    pixel is covered exactly once.

Pixel centers are at (x + 0.5, y + 0.5), matching Vulkan.

Two execution paths:
  * `rasterize` — chunked lax.scan over triangles, evaluating C triangles
    against all pixels at once.  Simple, fully jnp, used for small scenes
    and as the golden reference for the binned Pallas path.
  * `rasterize_binned` (ops/raster_binned.py) — sort-based tile binning +
    per-tile Pallas kernel for big scenes (the cudaraster-on-TPU path).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

CULL_NONE = 0
CULL_BACK = 1
CULL_FRONT = 2


class TriangleSetup(NamedTuple):
    """Vectorized triangle setup, one row per input triangle.

    Two sets of per-triangle data, both in TRIANGLE-RELATIVE coordinates
    for float conditioning (the fixed-point-relative-to-tile trick of HW
    rasterizers):

    COVERAGE — `edge` (T, 3, 5): oriented edge functions (A, B, C, ex, ey);
      E_i(p) = A*(px-ex) + B*(py-ey) + C, interior has all E_i >= 0 with
      the top-left rule on == 0.  For w>0 triangles each edge is built from
      its two vertices in CANONICAL order (smaller global vertex index
      first, relative to that vertex, C = 0) and then orientation-flipped
      (an exact float negation) — so two triangles sharing an edge compute
      bitwise-complementary tests and every boundary pixel is covered
      exactly once, no cracks, no double-shade.  Near-plane-crossing
      triangles fall back to homogeneous adjugate rows (clip-less
      rasterization, Olano-Greer).

    INTERPOLATION — `adj` (T, 3, 3) sign-normalized adjugate rows
      (lam_i = adj[i] @ (px-ox, py-oy, 1), perspective-correct barycentrics
      after normalization) and `zplane` (T, 3) with z(s) = zplane @ s.

    valid:  (T,) bool — passes facing/degeneracy culls.
    bbox:   (T, 4) int32 pixel [x0, y0, x1, y1) conservative bounds;
            full-screen for near-plane-crossing triangles.
    """
    adj: jax.Array
    zplane: jax.Array
    offset: jax.Array
    edge: jax.Array
    valid: jax.Array
    bbox: jax.Array


def setup_triangles(clip: jax.Array, indices: jax.Array, width: int,
                    height: int, cull_mode: int = CULL_BACK,
                    front_face_ccw: bool = True) -> TriangleSetup:
    """Build edge/depth planes for all triangles at once.

    clip:    (V, 4) clip-space positions (post view-proj, pre divide).
    indices: (T, 3) int32 vertex indices.
    """
    tri = clip[indices]                       # (T, 3, 4) gather
    x, y, z, w = tri[..., 0], tri[..., 1], tri[..., 2], tri[..., 3]

    # Fold the viewport transform into homogeneous coords:
    #   px = ((x/w)*0.5 + 0.5) * width  =>  sx = (0.5*x + 0.5*w) * width
    sx = (0.5 * x + 0.5 * w) * width
    sy = (0.5 * y + 0.5 * w) * height

    # Translate each triangle to its projected centroid (rounded) before
    # building edge equations: homogeneous translation by (ox, oy) is
    # sx' = sx - ox*w.  This is what keeps slivers numerically sane.
    w_ok = w > 0
    any_w_pos = w_ok.any(axis=1)
    w_div = jnp.where(jnp.abs(w) < 1e-20, 1e-20, w)
    proj_x = jnp.where(w_ok, sx / w_div, 0.0)
    proj_y = jnp.where(w_ok, sy / w_div, 0.0)
    n_ok = jnp.maximum(w_ok.sum(axis=1), 1)
    ox = jnp.round(proj_x.sum(axis=1) / n_ok)
    oy = jnp.round(proj_y.sum(axis=1) / n_ok)
    sx = sx - ox[:, None] * w
    sy = sy - oy[:, None] * w
    m = jnp.stack([sx, sy, w], axis=-1)       # (T, 3, 3) rows = vertices

    # Adjugate rows: adj[i] = cross(m[j], m[k]) for (i,j,k) cyclic.
    a0 = jnp.cross(m[:, 1], m[:, 2])
    a1 = jnp.cross(m[:, 2], m[:, 0])
    a2 = jnp.cross(m[:, 0], m[:, 1])
    adj = jnp.stack([a0, a1, a2], axis=1)     # (T, 3, 3)
    det = jnp.einsum("ti,ti->t", m[:, 0], a0)  # det(M)

    # Facing: with Y-down screen coords and CCW front faces (Vulkan default
    # VK_FRONT_FACE_COUNTER_CLOCKWISE), front-facing det < 0.  (A CCW
    # triangle in Y-up NDC becomes CW in Y-down pixel space.)
    front_det_negative = front_face_ccw
    is_front = (det < 0) if front_det_negative else (det > 0)
    if cull_mode == CULL_BACK:
        facing_ok = is_front
    elif cull_mode == CULL_FRONT:
        facing_ok = ~is_front
    else:
        facing_ok = det != 0

    # Orient edge functions so interior is positive regardless of winding.
    sgn = jnp.where(det < 0, -1.0, 1.0)[:, None, None]
    adj = adj * sgn

    valid = facing_ok & (det != 0) & any_w_pos

    # z_ndc plane: z/w is linear in screen space with coeffs z_vec @ adj / det
    # (adj already sign-flipped; fold the same sign into det).
    det_s = jnp.abs(det)
    zplane = jnp.einsum("tv,tvi->ti", z, adj) / det_s[:, None]

    # --- canonical per-edge coverage functions (watertight, see class doc).
    crosses = (w <= 0).any(axis=1)
    edge_rows = []
    orient_ok = jnp.ones(indices.shape[0], bool)
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        swap = indices[:, j] > indices[:, k]
        pxj = jnp.where(swap, proj_x[:, k], proj_x[:, j])
        pyj = jnp.where(swap, proj_y[:, k], proj_y[:, j])
        qxj = jnp.where(swap, proj_x[:, j], proj_x[:, k])
        qyj = jnp.where(swap, proj_y[:, j], proj_y[:, k])
        A = pyj - qyj                 # = -(q.y - p.y)
        B = qxj - pxj
        ev = A * (proj_x[:, i] - pxj) + B * (proj_y[:, i] - pyj)
        orient = jnp.sign(ev)
        orient_ok = orient_ok & (crosses | (ev != 0))
        Ao = orient * A
        Bo = orient * B
        # near-crossing fallback: homogeneous adjugate row.
        row = jnp.stack([
            jnp.where(crosses, adj[:, i, 0], Ao),
            jnp.where(crosses, adj[:, i, 1], Bo),
            jnp.where(crosses, adj[:, i, 2], 0.0),
            jnp.where(crosses, ox, pxj),
            jnp.where(crosses, oy, pyj),
        ], axis=-1)
        edge_rows.append(row)
    edge = jnp.stack(edge_rows, axis=1)          # (T, 3, 5)
    valid = valid & orient_ok

    # Conservative integer pixel bbox (absolute coords).
    # Near-plane-crossing tris: full screen.
    x0 = jnp.clip(jnp.floor(proj_x.min(axis=1) - 0.5), 0,
                  width).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(proj_y.min(axis=1) - 0.5), 0,
                  height).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(proj_x.max(axis=1) + 0.5), 0,
                  width).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(proj_y.max(axis=1) + 0.5), 0,
                  height).astype(jnp.int32)
    x0 = jnp.where(crosses, 0, x0)
    y0 = jnp.where(crosses, 0, y0)
    x1 = jnp.where(crosses, width, x1)
    y1 = jnp.where(crosses, height, y1)
    # Empty bbox for fully off-screen (unless near-crossing).
    valid = valid & (x1 > x0) & (y1 > y0)
    bbox = jnp.stack([x0, y0, x1, y1], axis=-1)
    return TriangleSetup(adj=adj, zplane=zplane,
                         offset=jnp.stack([ox, oy], axis=-1),
                         edge=edge, valid=valid, bbox=bbox)


def _edge_inside(lam, a, b):
    """Coverage with the top-left rule.

    lam: (..., 3) oriented edge values; a/b: matching (..., 3) oriented
    edge coefficients.  Top edge: horizontal with interior below
    (a == 0, b > 0 in y-down); left edge: interior to the right (a > 0).
    Those edges include == 0; others exclude it.
    """
    top_left = (a > 0) | ((a == 0) & (b > 0))
    ok = jnp.where(top_left, lam >= 0, lam > 0)
    return ok.all(axis=-1)


def coverage(setup_edge, px, py):
    """Evaluate oriented edge functions -> inside mask.

    setup_edge: (..., 3, 5) rows (A, B, C, ex, ey); px/py broadcastable
    pixel-center coords (...,).  Returns bool (...,).
    """
    A = setup_edge[..., 0]
    B = setup_edge[..., 1]
    C = setup_edge[..., 2]
    ex = setup_edge[..., 3]
    ey = setup_edge[..., 4]
    lam = A * (px[..., None] - ex) + B * (py[..., None] - ey) + C
    return _edge_inside(lam, A, B)


def pixel_centers(width: int, height: int):
    """(H, W) grids of pixel-center coordinates."""
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]
    return jnp.broadcast_to(px, (height, width)), \
        jnp.broadcast_to(py, (height, width))


def rasterize(setup: TriangleSetup, width: int, height: int,
              chunk: int = 8) -> tuple[jax.Array, jax.Array]:
    """Brute-force chunked rasterization of all triangles.

    Returns (depth (H, W) float32 reverse-Z, tri (H, W) int32, -1 = none).
    Scans triangle chunks; per chunk evaluates edge functions for all pixels
    (a (chunk, H, W) elementwise workload — VPU-shaped) and merges the
    closest hit into the carried visibility buffer.
    """
    T = setup.adj.shape[0]
    pad = (-T) % chunk
    edg = jnp.pad(setup.edge, ((0, pad), (0, 0), (0, 0)))
    zpl = jnp.pad(setup.zplane, ((0, pad), (0, 0)))
    off = jnp.pad(setup.offset, ((0, pad), (0, 0)))
    val = jnp.pad(setup.valid, (0, pad))
    n_chunks = (T + pad) // chunk

    px, py = pixel_centers(width, height)

    def body(carry, inp):
        depth, tri = carry
        c_edg, c_zpl, c_off, c_val, c_base = inp
        rx = px[None] - c_off[:, 0, None, None]      # (chunk, H, W)
        ry = py[None] - c_off[:, 1, None, None]
        # coverage from oriented edge rows: (chunk, 3, H, W)
        lam = (c_edg[:, :, 0, None, None]
               * (px[None, None] - c_edg[:, :, 3, None, None])
               + c_edg[:, :, 1, None, None]
               * (py[None, None] - c_edg[:, :, 4, None, None])
               + c_edg[:, :, 2, None, None])
        cover = _edge_inside(jnp.moveaxis(lam, 1, -1),
                             c_edg[:, None, None, :, 0],
                             c_edg[:, None, None, :, 1])      # (chunk, H, W)
        z = (c_zpl[:, 0, None, None] * rx
             + c_zpl[:, 1, None, None] * ry
             + c_zpl[:, 2, None, None])                        # (chunk, H, W)
        cover &= (z >= 0.0) & (z <= 1.0) & c_val[:, None, None]
        zc = jnp.where(cover, z, -1.0)
        # Closest hit within the chunk (reverse-Z: larger is closer).
        best = jnp.argmax(zc, axis=0)                          # (H, W)
        best_z = jnp.take_along_axis(zc, best[None], axis=0)[0]
        hit = best_z > depth
        depth = jnp.where(hit, best_z, depth)
        tri = jnp.where(hit, c_base + best.astype(jnp.int32), tri)
        return (depth, tri), None

    depth0 = jnp.zeros((height, width), jnp.float32)
    tri0 = jnp.full((height, width), -1, jnp.int32)
    chunks = (edg.reshape(n_chunks, chunk, 3, 5),
              zpl.reshape(n_chunks, chunk, 3),
              off.reshape(n_chunks, chunk, 2),
              val.reshape(n_chunks, chunk),
              jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
    (depth, tri), _ = jax.lax.scan(body, (depth0, tri0), chunks)
    # Pixels whose winning depth is the clear value but tri >= 0 cannot
    # happen (hit requires z > 0 strictly except z==0 exactly at far plane;
    # accept that edge case as a miss).
    return depth, tri


# ---------------------------------------------------------------------------
# Deferred attribute interpolation from the visibility buffer.
# ---------------------------------------------------------------------------

def barycentrics(setup: TriangleSetup, tri: jax.Array, px: jax.Array,
                 py: jax.Array):
    """Per-pixel perspective-correct barycentrics (+ their inputs).

    tri: (H, W) int32 visibility buffer (-1 = background; clamped gather,
    callers mask with tri >= 0).
    Returns (bary (H, W, 3), lam_sum) — bary already normalized.
    """
    t = jnp.maximum(tri, 0)
    adj = setup.adj[t]                                   # (H, W, 3, 3)
    off = setup.offset[t]                                # (H, W, 2)
    rx = (px - off[..., 0])[..., None]
    ry = (py - off[..., 1])[..., None]
    lam = adj[..., 0] * rx + adj[..., 1] * ry + adj[..., 2]   # (H, W, 3)
    s = lam.sum(-1)
    s = jnp.where(jnp.abs(s) < 1e-20, 1e-20, s)
    return lam / s[..., None], s


def interpolate(attrs: jax.Array, indices: jax.Array, tri: jax.Array,
                bary: jax.Array) -> jax.Array:
    """Gather + interpolate vertex attributes at every pixel.

    attrs: (V, C) vertex attributes; indices: (T, 3); tri: (H, W);
    bary: (H, W, 3).  Returns (H, W, C).
    """
    t = jnp.maximum(tri, 0)
    vid = indices[t]                                     # (H, W, 3)
    av = attrs[vid]                                      # (H, W, 3, C)
    return (av * bary[..., None]).sum(-2)


def interpolate_with_derivs(attrs: jax.Array, indices: jax.Array,
                            tri: jax.Array, setup: TriangleSetup,
                            px: jax.Array, py: jax.Array):
    """Interpolate + analytic screen-space derivatives (for mip selection).

    u(s) = N(s)/D(s) with N = sum lam_i u_i, D = sum lam_i; both linear in
    screen space, so du/dx = (N_x D - N D_x) / D^2 exactly — no finite
    differences, no edge artifacts (this is what HW ddx/ddy approximates).
    Returns (value, du_dx, du_dy), each (H, W, C).
    """
    t = jnp.maximum(tri, 0)
    adj = setup.adj[t]                                   # (H, W, 3, 3)
    off = setup.offset[t]
    vid = indices[t]
    av = attrs[vid]                                      # (H, W, 3, C)
    lam = (adj[..., 0] * (px - off[..., 0])[..., None]
           + adj[..., 1] * (py - off[..., 1])[..., None]
           + adj[..., 2])
    D = lam.sum(-1)
    Dx = adj[..., 0].sum(-1)
    Dy = adj[..., 1].sum(-1)
    N = (av * lam[..., None]).sum(-2)                    # (H, W, C)
    Nx = (av * adj[..., 0][..., None]).sum(-2)
    Ny = (av * adj[..., 1][..., None]).sum(-2)
    D = jnp.where(jnp.abs(D) < 1e-20, 1e-20, D)[..., None]
    val = N / D
    ddx = (Nx - val * Dx[..., None]) / D
    ddy = (Ny - val * Dy[..., None]) / D
    return val, ddx, ddy
