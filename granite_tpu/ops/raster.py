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

    TPU layout note: all math runs on flat (T,) component arrays.  Arrays
    with a tiny minor dimension ((T, 3) etc.) are padded to 128 lanes on
    TPU and would run the VPU at ~2% utilization; the component form is
    fully packed.  One gather + transpose at entry, a few transposes to
    assemble the output structs at exit.
    """
    tri = clip[indices]                       # (T, 3, 4) gather
    comp = tri.reshape(-1, 12).T              # (12, T): per-component rows
    xs = [comp[0], comp[4], comp[8]]
    ys = [comp[1], comp[5], comp[9]]
    zs = [comp[2], comp[6], comp[10]]
    ws = [comp[3], comp[7], comp[11]]

    # Fold the viewport transform into homogeneous coords:
    #   px = ((x/w)*0.5 + 0.5) * width  =>  sx = (0.5*x + 0.5*w) * width
    sx = [(0.5 * xs[i] + 0.5 * ws[i]) * width for i in range(3)]
    sy = [(0.5 * ys[i] + 0.5 * ws[i]) * height for i in range(3)]

    # Translate each triangle to its projected centroid (rounded) before
    # building edge equations: homogeneous translation by (ox, oy) is
    # sx' = sx - ox*w.  This keeps slivers numerically sane.
    w_ok = [w > 0 for w in ws]
    any_w_pos = w_ok[0] | w_ok[1] | w_ok[2]
    px = []
    py = []
    for i in range(3):
        wd = jnp.where(jnp.abs(ws[i]) < 1e-20, 1e-20, ws[i])
        px.append(jnp.where(w_ok[i], sx[i] / wd, 0.0))
        py.append(jnp.where(w_ok[i], sy[i] / wd, 0.0))
    n_ok = jnp.maximum(sum(w.astype(jnp.int32) for w in w_ok), 1)
    ox = jnp.round((px[0] + px[1] + px[2]) / n_ok)
    oy = jnp.round((py[0] + py[1] + py[2]) / n_ok)
    sx = [sx[i] - ox * ws[i] for i in range(3)]
    sy = [sy[i] - oy * ws[i] for i in range(3)]

    # Adjugate rows: adj[i] = cross(m[j], m[k]) for (i,j,k) cyclic, with
    # m[i] = (sx_i, sy_i, w_i).  Componentwise cross products.
    adj_rows = []
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        ax = sy[j] * ws[k] - ws[j] * sy[k]
        ay = ws[j] * sx[k] - sx[j] * ws[k]
        az = sx[j] * sy[k] - sy[j] * sx[k]
        adj_rows.append([ax, ay, az])
    det = (sx[0] * adj_rows[0][0] + sy[0] * adj_rows[0][1]
           + ws[0] * adj_rows[0][2])

    # Facing: with Y-down screen coords and CCW front faces (Vulkan default
    # VK_FRONT_FACE_COUNTER_CLOCKWISE), front-facing det < 0.  (A CCW
    # triangle in Y-up NDC becomes CW in Y-down pixel space.)
    is_front = (det < 0) if front_face_ccw else (det > 0)
    if cull_mode == CULL_BACK:
        facing_ok = is_front
    elif cull_mode == CULL_FRONT:
        facing_ok = ~is_front
    else:
        facing_ok = det != 0

    # Orient edge functions so interior is positive regardless of winding.
    sgn = jnp.where(det < 0, -1.0, 1.0)
    adj_rows = [[c * sgn for c in row] for row in adj_rows]

    valid = facing_ok & (det != 0) & any_w_pos

    # z_ndc plane: z/w is linear in screen space with coeffs z_vec @ adj
    # / det (adj already sign-flipped; fold the same sign into det).
    inv_det = 1.0 / jnp.where(det == 0, 1.0, jnp.abs(det))
    zpl = [(zs[0] * adj_rows[0][c] + zs[1] * adj_rows[1][c]
            + zs[2] * adj_rows[2][c]) * inv_det for c in range(3)]

    # --- canonical per-edge coverage functions (watertight, see class doc).
    crosses = ~(w_ok[0] & w_ok[1] & w_ok[2])
    idx_t = indices.T                          # (3, T)
    edge_comp = []                             # 15 rows of (T,)
    orient_ok = None
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        swap = idx_t[j] > idx_t[k]
        pxj = jnp.where(swap, px[k], px[j])
        pyj = jnp.where(swap, py[k], py[j])
        qxj = jnp.where(swap, px[j], px[k])
        qyj = jnp.where(swap, py[j], py[k])
        A = pyj - qyj                 # = -(q.y - p.y)
        B = qxj - pxj
        ev = A * (px[i] - pxj) + B * (py[i] - pyj)
        orient = jnp.sign(ev)
        ok = crosses | (ev != 0)
        orient_ok = ok if orient_ok is None else (orient_ok & ok)
        edge_comp.append(jnp.where(crosses, adj_rows[i][0], orient * A))
        edge_comp.append(jnp.where(crosses, adj_rows[i][1], orient * B))
        edge_comp.append(jnp.where(crosses, adj_rows[i][2], 0.0))
        edge_comp.append(jnp.where(crosses, ox, pxj))
        edge_comp.append(jnp.where(crosses, oy, pyj))
    valid = valid & orient_ok

    # Conservative integer pixel bbox (absolute coords).
    # Near-plane-crossing tris: full screen.
    pxmin = jnp.minimum(jnp.minimum(px[0], px[1]), px[2])
    pxmax = jnp.maximum(jnp.maximum(px[0], px[1]), px[2])
    pymin = jnp.minimum(jnp.minimum(py[0], py[1]), py[2])
    pymax = jnp.maximum(jnp.maximum(py[0], py[1]), py[2])
    x0 = jnp.clip(jnp.floor(pxmin - 0.5), 0, width).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(pymin - 0.5), 0, height).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(pxmax + 0.5), 0, width).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(pymax + 0.5), 0, height).astype(jnp.int32)
    x0 = jnp.where(crosses, 0, x0)
    y0 = jnp.where(crosses, 0, y0)
    x1 = jnp.where(crosses, width, x1)
    y1 = jnp.where(crosses, height, y1)
    # Empty bbox for fully off-screen (unless near-crossing).
    valid = valid & (x1 > x0) & (y1 > y0)

    # Assemble output structs: (rows, T) stacks -> transpose once.
    T_ = indices.shape[0]
    adj = jnp.stack([c for row in adj_rows for c in row]) \
        .T.reshape(T_, 3, 3)
    zplane = jnp.stack(zpl).T
    edge = jnp.stack(edge_comp).T.reshape(T_, 3, 5)
    offset = jnp.stack([ox, oy]).T
    bbox = jnp.stack([x0, y0, x1, y1]).T
    return TriangleSetup(adj=adj, zplane=zplane, offset=offset,
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
