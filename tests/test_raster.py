"""Rasterizer correctness (analogue of reference tests/triangle.cpp and the
meshopt_sandbox-style round-trip tests): coverage, reverse-Z depth order,
watertight shared edges, near-plane crossing, perspective-correct interp."""

import numpy as np
import jax.numpy as jnp

from granite_tpu.math import perspective, look_at_matrix
from granite_tpu.ops.raster import (
    CULL_NONE, CULL_BACK, setup_triangles, rasterize, pixel_centers,
    barycentrics, interpolate, interpolate_with_derivs,
)

W, H = 64, 64


def ndc_tri(verts2d, z=0.5):
    """Build clip-space vertices from NDC xy (w=1)."""
    v = np.array([[x, y, z, 1.0] for x, y in verts2d], np.float32)
    return jnp.asarray(v)


def test_single_triangle_coverage():
    # Big triangle covering lower-left half-ish of NDC.
    clip = ndc_tri([(-0.9, -0.9), (0.9, -0.9), (-0.9, 0.9)])
    idx = jnp.array([[0, 1, 2]], jnp.int32)
    setup = setup_triangles(clip, idx, W, H, cull_mode=CULL_NONE)
    depth, tri = rasterize(setup, W, H)
    cov = np.asarray(tri >= 0)
    assert 0.25 < cov.mean() < 0.45        # ~area/2 of a 0.9-extent tri
    assert np.allclose(np.asarray(depth)[cov], 0.5, atol=1e-5)
    # Pixel at NDC center of triangle is covered.
    assert cov[H // 2 - 5, W // 2 - 5]
    assert not cov[5, W - 5]               # opposite corner empty


def test_depth_order_reverse_z():
    # Two overlapping triangles; the one with LARGER z_ndc is closer.
    near = ndc_tri([(-0.5, -0.5), (0.5, -0.5), (0.0, 0.5)], z=0.8)
    far = ndc_tri([(-0.5, -0.5), (0.5, -0.5), (0.0, 0.5)], z=0.2)
    clip = jnp.concatenate([far, near])
    idx = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    setup = setup_triangles(clip, idx, W, H, cull_mode=CULL_NONE)
    depth, tri = rasterize(setup, W, H)
    cov = np.asarray(tri)
    assert (cov[cov >= 0] == 1).all()      # near triangle (id 1) wins
    assert np.allclose(np.asarray(depth)[cov >= 0], 0.8)


def test_watertight_shared_edge():
    # Quad split into two triangles along a diagonal: every covered pixel
    # must be covered exactly once (top-left rule complementarity).
    quad = ndc_tri([(-0.8, -0.8), (0.8, -0.8), (0.8, 0.8), (-0.8, 0.8)])
    idx = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    setup = setup_triangles(quad, idx, W, H, cull_mode=CULL_NONE)
    _, tri_both = rasterize(setup, W, H)
    # Rasterize each alone and check the union is a partition.
    s0 = setup_triangles(quad, idx[:1], W, H, cull_mode=CULL_NONE)
    s1 = setup_triangles(quad, idx[1:], W, H, cull_mode=CULL_NONE)
    _, t0 = rasterize(s0, W, H)
    _, t1 = rasterize(s1, W, H)
    c0 = np.asarray(t0 >= 0)
    c1 = np.asarray(t1 >= 0)
    assert not np.any(c0 & c1), "shared-edge pixels double covered"
    assert np.array_equal(c0 | c1, np.asarray(tri_both >= 0))
    # The quad interior is a solid block with no seam holes: every row
    # between the quad's pixel bounds is fully covered.
    both = c0 | c1
    ys, xs = np.nonzero(both)
    for y in range(ys.min() + 1, ys.max()):
        row = both[y]
        xs_row = np.nonzero(row)[0]
        assert np.all(row[xs_row.min():xs_row.max() + 1]), f"hole in row {y}"


def test_backface_cull():
    clip = ndc_tri([(-0.5, -0.5), (0.5, -0.5), (0.0, 0.5)])
    idx_ccw = jnp.array([[0, 1, 2]], jnp.int32)
    idx_cw = jnp.array([[0, 2, 1]], jnp.int32)
    # With CULL_BACK exactly one of the two windings survives.
    s_a = setup_triangles(clip, idx_ccw, W, H, cull_mode=CULL_BACK)
    s_b = setup_triangles(clip, idx_cw, W, H, cull_mode=CULL_BACK)
    vis_a = bool(np.asarray(rasterize(s_a, W, H)[1] >= 0).any())
    vis_b = bool(np.asarray(rasterize(s_b, W, H)[1] >= 0).any())
    assert vis_a != vis_b


def test_perspective_triangle_no_clip():
    # Triangle crossing the near plane: homogeneous raster must draw the
    # visible part and no phantom (w<0 mirror) pixels.
    proj = perspective(np.pi / 2, 1.0, 0.1, 100.0)
    view = look_at_matrix([0, 0, 0], [0, 0, -1], [0, 1, 0])
    vp = jnp.asarray(proj @ view)
    # One vertex behind the camera (z=+1), two in front.
    world = np.array([
        [0.0, 0.0, 1.0, 1.0],    # behind the eye
        [-2.0, -0.5, -3.0, 1.0],
        [2.0, -0.5, -3.0, 1.0],
    ], np.float32)
    clip = (vp @ world.T).T
    idx = jnp.array([[0, 1, 2]], jnp.int32)
    setup = setup_triangles(jnp.asarray(clip), idx, W, H,
                            cull_mode=CULL_NONE)
    depth, tri = rasterize(setup, W, H)
    cov = np.asarray(tri >= 0)
    assert cov.any(), "near-crossing triangle lost entirely"
    d = np.asarray(depth)
    assert np.all(d[cov] >= 0.0) and np.all(d[cov] <= 1.0)
    # The visible region is in front of the camera only: the two front
    # vertices are below the axis (y_world < 0) -> with Vulkan Y-flip they
    # map to the LOWER half of the image (+y down covered region reaches
    # the bottom edge, the top edge stays empty).
    assert cov[H - 1].any()
    assert not cov[0].any()


def test_interpolation_perspective_correct():
    # A quad in perspective: interpolating world-space X must reproduce the
    # true hyperbolic screen distribution (perspective-correct).
    proj = perspective(np.pi / 2, 1.0, 0.1, 100.0)
    world = np.array([
        [-1.0, -1.0, -1.0, 1.0],
        [1.0, -1.0, -4.0, 1.0],     # far edge
        [1.0, 1.0, -4.0, 1.0],
        [-1.0, 1.0, -1.0, 1.0],
    ], np.float32)
    clip = jnp.asarray((proj @ world.T).T)
    idx = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    setup = setup_triangles(clip, idx, W, H, cull_mode=CULL_NONE)
    depth, tri = rasterize(setup, W, H)
    px, py = pixel_centers(W, H)
    bary, _ = barycentrics(setup, tri, px, py)
    attrs = jnp.asarray(world[:, :3])
    vals = interpolate(attrs, idx, tri, bary)
    cov = np.asarray(tri >= 0)
    v = np.asarray(vals)
    # Check a handful of covered pixels by re-projecting: projecting the
    # interpolated world position must land back on the pixel center.
    ys, xs = np.nonzero(cov)
    sel = np.linspace(0, len(ys) - 1, 20).astype(int)
    for y, x in zip(ys[sel], xs[sel]):
        p = np.append(v[y, x], 1.0)
        h = proj @ p
        sx = (h[0] / h[3] * 0.5 + 0.5) * W
        sy = (h[1] / h[3] * 0.5 + 0.5) * H
        assert abs(sx - (x + 0.5)) < 1e-2, (sx, x)
        assert abs(sy - (y + 0.5)) < 1e-2, (sy, y)


def test_analytic_derivatives():
    # Flat quad facing the camera: du/dx of world X must equal world-units
    # per pixel, constant across the surface.
    proj = perspective(np.pi / 2, 1.0, 0.1, 100.0)
    world = np.array([
        [-1.0, -1.0, -2.0, 1.0],
        [1.0, -1.0, -2.0, 1.0],
        [1.0, 1.0, -2.0, 1.0],
        [-1.0, 1.0, -2.0, 1.0],
    ], np.float32)
    clip = jnp.asarray((proj @ world.T).T)
    idx = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    setup = setup_triangles(clip, idx, W, H, cull_mode=CULL_NONE)
    depth, tri = rasterize(setup, W, H)
    px, py = pixel_centers(W, H)
    attrs = jnp.asarray(world[:, :3])
    val, ddx, ddy = interpolate_with_derivs(attrs, idx, tri, setup, px, py)
    cov = np.asarray(tri >= 0)
    # At z=-2 with fov 90 and viewport W: NDC spans 4 world units over W px.
    expect = 4.0 / W
    gx = np.asarray(ddx)[..., 0][cov]
    assert np.allclose(gx, expect, atol=1e-4)
    gy = np.asarray(ddy)[..., 1][cov]
    assert np.allclose(np.abs(gy), expect, atol=1e-4)  # Y-flip -> sign
