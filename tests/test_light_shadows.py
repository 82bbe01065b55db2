"""Clustered point/spot light shadows (ops/light_shadows.py; reference
renderer/lights/clusterer.hpp:52-58 shadow atlas)."""

import numpy as np
import pytest
import jax.numpy as jnp

from granite_tpu.ops.light_shadows import (
    assign_slices, pack_atlas, topk_shadow_terms,
)
from granite_tpu.renderer.scene_renderer import pack_scene, \
    render_shadow_map
from granite_tpu.scene.mesh_util import cube_mesh, plane_mesh
from granite_tpu.scene.scene_formats import (
    MaterialData, NodeData, SceneInfo,
)


def _world_of(info):
    """Root-only TRS -> world matrices (no hierarchy in these scenes)."""
    mats = []
    for nd in info.nodes:
        m = np.eye(4, dtype=np.float32)
        m[0, 0], m[1, 1], m[2, 2] = nd.scale
        m[:3, 3] = nd.translation
        mats.append(m)
    return np.stack(mats)


def _blocker_scene():
    """A 1x1 blocker cube at y=2 above a 10x10 floor at y=0."""
    info = SceneInfo()
    info.materials.append(MaterialData())
    floor = plane_mesh(material=0)     # unit plane at y=0, +y normal
    cube = cube_mesh(material=0)
    info.meshes = [floor, cube]
    info.nodes = [
        NodeData(name="floor", meshes=[0],
                 scale=np.array([5.0, 1.0, 5.0], np.float32)),
        NodeData(name="blocker", meshes=[1],
                 translation=np.array([0.0, 2.0, 0.0], np.float32),
                 scale=np.array([0.5, 0.5, 0.5], np.float32)),
    ]
    info.roots = [0, 1]
    return info


@pytest.mark.slow
def test_point_light_shadow_atlas_blocks():
    """Floor directly under the blocker is shadowed; far floor is lit."""
    info = _blocker_scene()
    packed = pack_scene(info)
    world = jnp.asarray(_world_of(info))

    light_pos = np.array([0.0, 5.0, 0.0], np.float32)
    infos = [{"pos": light_pos, "dir": np.array([0, -1, 0], np.float32),
              "radius": 20.0, "outer": 0.5, "is_spot": False}]
    vps, slice_np, kind_np = assign_slices(infos)
    size = 64
    mask = jnp.ones(packed.num_objects, bool)
    slices = [render_shadow_map(packed, world, vps[f], size, mask)
              for f in range(6)]
    atlas_flat = pack_atlas(jnp.stack(slices))

    # Sample points on the floor (y=0): under the blocker and far away.
    pts = np.array([[0.0, 0.01, 0.0],      # under blocker -> shadowed
                    [3.0, 0.01, 3.0],      # away -> lit
                    [-3.0, 0.01, 2.0]], np.float32)
    world_pos = jnp.asarray(pts[None])     # (1, 3pts, 3)
    masks = jnp.full((1, 3, 1), 0xFFFFFFFF, jnp.uint32)
    slots, terms = topk_shadow_terms(
        atlas_flat, vps, size, 1, slice_np, kind_np,
        np.stack([light_pos]), masks, world_pos, k=2)
    terms = np.asarray(terms[0])[0]
    assert terms[0] < 0.3, terms           # occluded
    assert terms[1] > 0.7, terms           # lit
    assert terms[2] > 0.7, terms


@pytest.mark.slow
def test_spot_light_shadow_and_cone():
    info = _blocker_scene()
    packed = pack_scene(info)
    world = jnp.asarray(_world_of(info))

    light_pos = np.array([0.0, 6.0, 0.0], np.float32)
    infos = [{"pos": light_pos, "dir": np.array([0, -1, 0], np.float32),
              "radius": 20.0, "outer": 0.9, "is_spot": True}]
    vps, slice_np, kind_np = assign_slices(infos)
    assert vps.shape[0] == 1               # one slice for a spot
    size = 64
    mask = jnp.ones(packed.num_objects, bool)
    atlas_flat = pack_atlas(jnp.stack(
        [render_shadow_map(packed, world, vps[0], size, mask)]))
    pts = np.array([[0.0, 0.01, 0.0],      # under blocker
                    [2.5, 0.01, 2.5]], np.float32)
    masks = jnp.full((1, 2, 1), 0xFFFFFFFF, jnp.uint32)
    slots, terms = topk_shadow_terms(
        atlas_flat, vps, size, 1, slice_np, kind_np,
        np.stack([light_pos]), masks, jnp.asarray(pts[None]), k=2)
    terms = np.asarray(terms[0])[0]
    assert terms[0] < 0.3, terms
    assert terms[1] > 0.7, terms


def test_topk_slots_ignore_shadowless_lights():
    vps = np.eye(4, dtype=np.float32)[None]
    atlas_flat = jnp.ones((4 * 4 * 4, 4), jnp.float32) * 0.0
    slice_np = np.array([-1], np.int32)    # light has no shadow slice
    kind_np = np.array([0], np.int32)
    masks = jnp.full((2, 2, 1), 0xFFFFFFFF, jnp.uint32)
    wp = jnp.zeros((2, 2, 3), jnp.float32)
    slots, terms = topk_shadow_terms(
        atlas_flat, vps, 4, 1, slice_np, kind_np,
        np.zeros((1, 3), np.float32), masks, wp, k=2)
    assert (np.asarray(slots) == -1).all()
    assert np.allclose(np.asarray(terms), 1.0)


def test_topk_half_res_matches_full_on_even_pixels():
    """clusteredLightsShadowsHalfRes: per-pixel topk is an independent
    map, so the half-res path must EXACTLY equal the full-res result on
    even pixels (the repeat-upsample sources), stay within the 2-px
    quantization everywhere, and handle odd sizes."""
    S = 32
    infos = [{"pos": np.array([0.0, 2.0, 0.0], np.float32),
              "dir": np.array([0.0, -1.0, 0.0], np.float32),
              "radius": 10.0, "outer": 0.7, "is_spot": True}]
    vps, slice_np, kind_np = assign_slices(infos)
    depth = np.zeros((1, S, S), np.float32)
    depth[0, :, :S // 2] = 0.9                  # near occluder, left half
    atlas = pack_atlas(jnp.asarray(depth))
    pos_np = np.stack([infos[0]["pos"]])

    H, W = 17, 23                               # odd on purpose
    # World-pos grid on the floor plane under the spot.
    xs = np.linspace(-1.5, 1.5, W, dtype=np.float32)
    zs = np.linspace(-1.5, 1.5, H, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs)
    wp = jnp.asarray(np.stack([gx, np.zeros_like(gx), gz], -1))
    masks = jnp.full((H, W, 1), 1, jnp.uint32)

    full = topk_shadow_terms(atlas, vps, S, 1, slice_np, kind_np,
                             pos_np, masks, wp, k=2)
    half = topk_shadow_terms(atlas, vps, S, 1, slice_np, kind_np,
                             pos_np, masks, wp, k=2, half_res=True)
    for f, h in zip(full, half):
        f, h = np.asarray(f), np.asarray(h)
        assert h.shape == f.shape
        np.testing.assert_array_equal(h[:, ::2, ::2], f[:, ::2, ::2])
    # Terms stay close globally (only shadow-edge pixels may move).
    dterm = np.abs(np.asarray(full[1]) - np.asarray(half[1]))
    assert (dterm > 0.25).mean() < 0.15, dterm.mean()


def test_vsm_atlas_matches_pcf_occlusion():
    """clusteredLightsShadowsVSM: the VSM atlas (filterable moments +
    Chebyshev) agrees with the PCF atlas on fully-lit and fully-occluded
    pixels."""
    import numpy as np
    import jax.numpy as jnp
    from granite_tpu.ops.light_shadows import (
        assign_slices, pack_atlas, pack_atlas_vsm, topk_shadow_terms,
    )
    S = 32
    infos = [{"pos": np.array([0.0, 2.0, 0.0], np.float32),
              "dir": np.array([0.0, -1.0, 0.0], np.float32),
              "radius": 10.0, "outer": 0.7, "is_spot": True}]
    vps, slice_np, kind_np = assign_slices(infos)
    # Synthetic slice: left half holds a NEAR occluder (reverse-Z: big),
    # right half empty (0).
    depth = np.zeros((1, S, S), np.float32)
    depth[0, :, :S // 2] = 0.9
    masks = jnp.full((2, 1, 1), 1, jnp.uint32)       # light 0 active
    # Two world points: one under the occluder (shadowed), one lit.
    # Build from light space: inverse-project uv (.25,.5) and (.75,.5)
    # at a FAR depth (reverse-Z small).
    inv = np.linalg.inv(vps[0])

    def world_at(u, v, z):
        ndc = np.array([2 * u - 1, 2 * v - 1, z, 1.0], np.float32)
        p = inv @ ndc
        return p[:3] / p[3]
    pts = jnp.asarray(np.stack([world_at(0.25, 0.5, 0.05),
                                world_at(0.75, 0.5, 0.05)])[None])
    pos_np = np.stack([infos[0]["pos"]])
    for packer in (pack_atlas, pack_atlas_vsm):
        atlas = packer(jnp.asarray(depth))
        slots, terms = topk_shadow_terms(
            atlas, vps, S, 1, slice_np, kind_np, pos_np,
            masks.transpose(1, 2, 0), pts, k=1)
        t = np.asarray(terms[0][0])
        assert t[0] < 0.2, (packer.__name__, t)     # occluded
        assert t[1] > 0.9, (packer.__name__, t)     # lit
