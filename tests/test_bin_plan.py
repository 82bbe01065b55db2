"""Cached binning plan (ops/raster_binned.BinPlan) vs per-frame binning.

The plan freezes the sort permutation / bin ranges / static payload
lanes across frames of a slowly moving camera (the TPU answer to the
reference's per-frame draw sort, render_queue.cpp:41-58).  These tests
drive a camera orbit through the planned path with the plan carried
frame to frame and assert:
  * every frame's fused-raster planes match a fresh per-frame binning
    exactly (the fast path rebuilds per-frame lanes; static lanes ride
    the carried payload);
  * the re-bin cond fires on frame 0 (empty plan), stays off under
    in-cover drift, and fires again on a big camera jump;
  * per-frame object-mask HIDES ride the fast path (kill-masked rows),
    while newly-VISIBLE objects force a re-bin (member check).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from granite_tpu.ops import raster as R
from granite_tpu.ops.raster_binned import (
    BinPlan, bin_plan_shapes, bin_triangles_planned,
)
from granite_tpu.ops.raster_fused import (
    build_resolve_extra, fold_adjugate, rasterize_resolve,
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
                     metallic_factor=0.8),
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
    packed = pack_scene(info, texture_size=16)
    n = packed.num_nodes
    world = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i, nd in enumerate(info.nodes):
        world[i, 0, 0], world[i, 1, 1], world[i, 2, 2] = nd.scale
        world[i, :3, 3] = nd.translation
    nm = np.linalg.inv(world[:, :3, :3]).transpose(0, 2, 1)
    return packed, jnp.asarray(world), jnp.asarray(nm.astype(np.float32))


def _vp(yaw: float):
    proj = perspective(1.0, W / H, 0.1)
    eye = np.array([4.0, 3.0, 6.0])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    eye = rot @ eye
    view = look_at_matrix(eye, [0, 0.5, 0], [0, 1, 0])
    return jnp.asarray((proj @ view).astype(np.float32))


def _frame(packed, world, nm, yaw, tri_mask=None):
    clip, wpos, wnrm, wtan = transform_vertices(packed, world, nm,
                                                _vp(yaw))
    setup = R.setup_triangles(clip, packed.indices, W, H)
    if tri_mask is not None:
        setup = setup._replace(valid=setup.valid & tri_mask)
    extra = build_resolve_extra(packed, wpos, wnrm, wtan)
    return clip, setup, extra


def _empty_plan(T):
    return BinPlan(**{k: jnp.zeros(s, d) for k, (s, d) in
                      bin_plan_shapes(T, W, H).items()})


def _payload(setup, extra):
    from granite_tpu.ops.raster_fused import EXTRA_COLS
    T_ = setup.adj.shape[0]
    adj9 = fold_adjugate(setup).reshape(T_, 9)
    p = jnp.concatenate([adj9, extra], axis=1)
    if p.shape[1] < EXTRA_COLS:
        p = jnp.concatenate(
            [p, jnp.zeros((T_, EXTRA_COLS - p.shape[1]), jnp.float32)],
            axis=1)
    return p


def test_planned_matches_fresh_over_orbit():
    packed, world, nm = _scene()
    T = packed.indices.shape[0]
    plan = _empty_plan(T)
    step = 0.01           # ~2.5 px/frame at this focal length
    rebins = []
    for i in range(5):
        yaw = i * step
        clip, setup, extra = _frame(packed, world, nm, yaw)

        def future_clip():
            c, *_ = transform_vertices(packed, world, nm,
                                       _vp(yaw + 2 * step))
            return c

        def future_fn():
            s = R.setup_triangles(future_clip(), packed.indices, W, H)
            return s.valid, s.bbox

        # stats probe with the PRE-update plan (same decision the
        # rasterize_resolve call below makes)
        *_ignored, stats = bin_triangles_planned(
            setup, W, H, plan, future_fn, extra=_payload(setup, extra))
        rebins.append(int(stats["bin_rebin"]))

        planes_p, plan = rasterize_resolve(
            setup, extra, W, H, interpret=True,
            plan=plan, future_fn=future_fn)
        planes_r = rasterize_resolve(setup, extra, W, H, interpret=True)
        assert np.array_equal(np.asarray(planes_p), np.asarray(planes_r)), \
            f"frame {i}: planned != fresh"
    assert rebins[0] == 1, rebins
    assert 0 in rebins[1:], f"fast path never used: {rebins}"

    # big jump -> cover check must force a re-bin
    clip, setup, extra = _frame(packed, world, nm, 0.8)
    pk, st, hr, hs, plan, stats = bin_triangles_planned(
        setup, W, H, plan, None, extra=_payload(setup, extra))
    assert int(stats["bin_rebin"]) == 1


def test_mask_hide_rides_fast_path_unhide_rebins():
    packed, world, nm = _scene()
    T = packed.indices.shape[0]
    tri_obj = np.asarray(packed.tri_object)
    ball_obj = int(tri_obj.max())          # last object = ball
    hide = jnp.asarray(tri_obj != ball_obj)

    plan = _empty_plan(T)
    # frame 0: all visible -> rebin builds the plan
    clip, setup, extra = _frame(packed, world, nm, 0.0)
    pk, st, hr, hs, plan, stats = bin_triangles_planned(
        setup, W, H, plan, None, extra=_payload(setup, extra))
    assert int(stats["bin_rebin"]) == 1

    # frame 1: ball hidden — fewer valid tris never violates (rows are
    # kill-masked), so the fast path must serve it with the right image
    clip, setup_h, extra_h = _frame(packed, world, nm, 0.0,
                                    tri_mask=hide)
    pk, st, hr, hs, plan2, stats = bin_triangles_planned(
        setup_h, W, H, plan, None, extra=_payload(setup_h, extra_h))
    assert int(stats["bin_rebin"]) == 0
    planes_p, _ = rasterize_resolve(setup_h, extra_h, W, H,
                                    interpret=True, plan=plan)
    planes_r = rasterize_resolve(setup_h, extra_h, W, H, interpret=True)
    assert np.array_equal(np.asarray(planes_p), np.asarray(planes_r))

    # rebuild the plan FROM the hidden frame, then unhide -> the ball's
    # tris have member==0 -> re-bin fires and the image is right
    plan_h = _empty_plan(T)
    pk, st, hr, hs, plan_h, stats = bin_triangles_planned(
        setup_h, W, H, plan_h, None, extra=_payload(setup_h, extra_h))
    clip, setup_f, extra_f = _frame(packed, world, nm, 0.0)
    pk, st, hr, hs, plan_h, stats = bin_triangles_planned(
        setup_f, W, H, plan_h, None, extra=_payload(setup_f, extra_f))
    assert int(stats["bin_rebin"]) == 1
    planes_p, _ = rasterize_resolve(setup_f, extra_f, W, H,
                                    interpret=True, plan=_empty_plan(T))
    planes_r = rasterize_resolve(setup_f, extra_f, W, H, interpret=True)
    assert np.array_equal(np.asarray(planes_p), np.asarray(planes_r))
