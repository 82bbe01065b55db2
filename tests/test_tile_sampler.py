"""Tile-rect sampler (ops/tile_sampler) vs the classic XLA gather path.

Wherever a tile's rect level equals floor(lod), sample_tiled must match
ops/texture.sample_packed_lod bit-for-bit up to bf16 texel storage.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from granite_tpu.ops import texture as T
from granite_tpu.ops import tile_sampler as TS


def _smooth_images(B, S, C, seed=0):
    rng = np.random.RandomState(seed)
    imgs = []
    for b in range(B):
        base = rng.rand(S // 8, S // 8, C).astype(np.float32)
        img = np.kron(base, np.ones((8, 8, 1), np.float32))
        imgs.append(img)
    return imgs


def _classic(images, bundle, u, v, lod, C):
    packed = jnp.stack([
        jnp.asarray(T.build_packed_lod_strip_np(im, dtype="float32"))
        for im in images])
    b = jnp.maximum(bundle, 0)
    return T.sample_packed_lod(packed, b, u, v, lod, C)


def _grid(H, W, u_range, v_range):
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    u = u_range[0] + (u_range[1] - u_range[0]) * xs / W
    v = v_range[0] + (v_range[1] - v_range[0]) * ys / H
    return jnp.asarray(u), jnp.asarray(v)


@pytest.mark.slow
def test_single_bundle_matches_classic():
    S, C = 64, 4
    images = _smooth_images(1, S, C)
    strips = TS.build_tiled_strips_np(images)
    H, W = 32, 128
    u, v = _grid(H, W, (0.1, 0.6), (0.2, 0.7))   # span < 64 texels
    lod = jnp.full((H, W), 0.3)
    bundle = jnp.zeros((H, W), jnp.int32)
    got = TS.sample_tiled(strips, u, v, lod, bundle, interpret=True)
    want = _classic(images, bundle, u, v, lod, C)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-2), \
        np.abs(np.asarray(got) - np.asarray(want)).max()


def test_wrap_seam_tile():
    S, C = 64, 4
    images = _smooth_images(1, S, C, seed=1)
    strips = TS.build_tiled_strips_np(images)
    H, W = 32, 128
    # u crosses the repeat seam inside the tile
    u, v = _grid(H, W, (0.8, 1.3), (-0.1, 0.4))
    lod = jnp.full((H, W), 0.0)
    bundle = jnp.zeros((H, W), jnp.int32)
    got = TS.sample_tiled(strips, u, v, lod, bundle, interpret=True)
    want = _classic(images, bundle, u, v, lod, C)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-2), \
        np.abs(np.asarray(got) - np.asarray(want)).max()


def test_two_bundles_one_tile():
    S, C = 64, 4
    images = _smooth_images(2, S, C, seed=2)
    strips = TS.build_tiled_strips_np(images)
    H, W = 32, 128
    u, v = _grid(H, W, (0.05, 0.5), (0.05, 0.5))
    lod = jnp.full((H, W), 1.4)
    bundle = jnp.asarray((np.mgrid[0:H, 0:W][1] >= W // 2)
                         .astype(np.int32))
    got = TS.sample_tiled(strips, u, v, lod, bundle, interpret=True)
    want0 = _classic([images[0]] * 2, bundle, u, v, lod, C)
    want1 = _classic([images[1]] * 2, bundle, u, v, lod, C)
    want = np.where(np.asarray(bundle)[..., None] == 0,
                    np.asarray(want0), np.asarray(want1))
    assert np.allclose(np.asarray(got), want, atol=2e-2), \
        np.abs(np.asarray(got) - want).max()


def test_third_bundle_coarse_fallback_and_uncovered():
    S, C = 64, 4
    images = _smooth_images(3, S, C, seed=3)
    strips = TS.build_tiled_strips_np(images)
    H, W = 32, 128
    u, v = _grid(H, W, (0.1, 0.55), (0.1, 0.55))
    lod = jnp.full((H, W), 0.25)
    col = np.mgrid[0:H, 0:W][1]
    bn = np.where(col < 50, 0, np.where(col < 100, 1, 2)).astype(np.int32)
    bn[:, 120:] = -1                       # uncovered pixels
    bundle = jnp.asarray(bn)
    got = np.asarray(
        TS.sample_tiled(strips, u, v, lod, bundle, interpret=True))
    # slot pixels exact; coarse-fallback pixels sample the coarse level
    cl = strips.coarse_level
    want_full = np.asarray(_classic(images[2:3], jnp.zeros_like(bundle),
                                    u, v,
                                    jnp.clip(lod, cl, cl + 1.0), C))
    w0 = np.asarray(_classic(images[0:1], jnp.zeros_like(bundle),
                             u, v, lod, C))
    w1 = np.asarray(_classic(images[1:2], jnp.zeros_like(bundle),
                             u, v, lod, C))
    assert np.allclose(got[:, :50], w0[:, :50], atol=2e-2)
    assert np.allclose(got[:, 50:100], w1[:, 50:100], atol=2e-2)
    assert np.allclose(got[:, 100:120], want_full[:, 100:120], atol=2e-2)
    assert np.all(got[:, 120:] == 0.0)     # uncovered -> zero


def test_mixed_lod_tile_never_aliases():
    """A tile with a wide lod spread: rect level is floor(min lod); the
    coarser pixels must land between their own level and level+1 bounds
    isn't guaranteed (parent clamp), but the result must stay within the
    global min/max of the texture (no garbage/overflow)."""
    S, C = 128, 4
    images = _smooth_images(1, S, C, seed=4)
    strips = TS.build_tiled_strips_np(images)
    H, W = 32, 128
    u, v = _grid(H, W, (0.0, 0.4), (0.0, 0.4))
    lod = jnp.asarray(
        np.linspace(0.0, 4.0, H)[:, None].repeat(W, 1).astype(np.float32))
    bundle = jnp.zeros((H, W), jnp.int32)
    got = np.asarray(
        TS.sample_tiled(strips, u, v, lod, bundle, interpret=True))
    assert np.isfinite(got).all()
    assert got.min() >= images[0].min() - 1e-2
    assert got.max() <= images[0].max() + 1e-2


@pytest.mark.slow
def test_vsm_tiled_matches_classic():
    """The tiled VSM path evaluates the Chebyshev term at half res
    (blurred moments -> the term is low-frequency); against a classic
    reference computed the same way the fetch is exact at level 0, and
    the full-res classic stays close on realistic (smooth) depth."""
    import jax.numpy as jnp
    from granite_tpu.ops.hdr import resize_bilinear
    from granite_tpu.ops.shadow import (
        _vsm_term, directional_shadow_matrix, sample_vsm_shadow,
        sample_vsm_shadow_tiled, shadow_uv_transform, vsm_moments,
    )
    from granite_tpu.ops.hdr import _sample_bilinear_uv
    rng = np.random.RandomState(0)
    S = 128
    depth = rng.rand(S, S).astype(np.float32)
    for _ in range(4):     # smooth, like a real scene depth map
        depth = (depth + np.roll(depth, 1, 0) + np.roll(depth, 1, 1)
                 + np.roll(depth, -1, 0) + np.roll(depth, -1, 1)) / 5
    moments = vsm_moments(jnp.asarray(depth))
    mat = shadow_uv_transform(directional_shadow_matrix(
        (0.3, 0.9, 0.2), (-5, -5, -5), (5, 5, 5)))
    H, W = 64, 256
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    covered = jnp.ones((H, W), bool)

    def run(span):
        pos = np.stack(
            [xs / W * span - span / 2, np.zeros_like(xs),
             ys / H * span - span / 2], axis=-1).astype(np.float32)
        got = np.asarray(sample_vsm_shadow_tiled(
            moments, jnp.asarray(mat), jnp.asarray(pos), covered))
        # classic reference with the same half-res-term evaluation
        mj = jnp.asarray(mat)
        pj = jnp.asarray(pos)
        uvw = (pj @ mj[:3, :3].T) + mj[:3, 3]
        u, v, z = uvw[..., 0], uvw[..., 1], uvw[..., 2]
        mm = _sample_bilinear_uv(moments, u[::2, ::2], v[::2, ::2])
        th = _vsm_term(z[::2, ::2], mm[..., 0], mm[..., 1])
        want_h = np.asarray(
            resize_bilinear(th[..., None], H, W)[..., 0])
        want_full = np.asarray(sample_vsm_shadow(moments, mj, pj))
        return (np.abs(got - want_h),
                np.abs(got - want_full).max())

    d_same, d_full = run(1.0)
    assert d_same.max() < 1e-4         # fetch path exact at level 0
    assert d_full < 0.15               # half-res term ~ full-res term
    # span 8 on this tiny 64-px viewport makes ONE half-res tile span
    # most of the map -> a much coarser prefilter level than any real
    # viewport would pick; bound the mean, not the max.
    d_same8, _ = run(8.0)
    assert d_same8.mean() < 6e-2


def test_env_tiled_matches_classic():
    """sample_environment_tiled (specular IBL through the tile-rect
    sampler) tracks the classic one-gather env path up to bf16 texel
    storage wherever the rect level matches floor(lod)."""
    from granite_tpu.renderer.environment import (
        Environment, procedural_sky_equirect, sample_environment,
        sample_environment_tiled,
    )
    env = Environment(procedural_sky_equirect(32))
    assert env.tiled is not None
    H, W = 32, 128
    rng = np.random.RandomState(5)
    d = rng.randn(8, 8, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(np.kron(d, np.ones((4, 16, 1), np.float32))
                       .reshape(H, W, 3))
    lod = jnp.full((H, W), 1.3, jnp.float32)
    got = np.asarray(sample_environment_tiled(env.tiled, dirs, lod))
    want = np.asarray(sample_environment(env.strips, dirs, lod))
    # block-constant dirs -> small footprints -> exact level everywhere;
    # sun-disk radiance reaches ~120, so tolerance is relative
    denom = np.maximum(np.abs(want), 1.0)
    assert (np.abs(got - want) / denom).max() < 2e-2

    # masking half the tile shrinks the planned footprint (possibly to a
    # finer level), so compare against the classic reference, not bit-
    # equality with the unmasked run
    covered = jnp.asarray(np.mgrid[0:H, 0:W][1] < 64)
    got_c = np.asarray(sample_environment_tiled(env.tiled, dirs, lod,
                                                covered=covered))
    assert (np.abs(got_c[:, :64] - want[:, :64])
            / denom[:, :64]).max() < 2e-2
    assert np.all(got_c[:, 64:] == 0.0)
