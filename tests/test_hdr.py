"""HDR chain numeric gates (bloom threshold/luminance/tonemap vs the
reference formulas — the FFT-SNR-style validation of SURVEY.md §4.4)."""

import numpy as np
import jax.numpy as jnp

from granite_tpu.ops.hdr import (
    average_log_luminance, bloom_downsample, bloom_threshold,
    bloom_upsample, resize_bilinear, tonemap, tonemap_filmic,
)


def test_threshold_formula():
    hdr = jnp.full((8, 8, 3), 16.0)      # bright pixel block
    out = bloom_threshold(hdr, avg_linear_lum=1.0, out_h=4, out_w=4)
    # lum = 16+1e-4; color/lum = 1; thresh = lum - 8 -> ~8.
    assert np.allclose(np.asarray(out[..., :3]), 8.0001, atol=1e-3)
    assert np.allclose(np.asarray(out[..., 3]), np.log2(16.0001), atol=1e-4)
    # Dim input thresholds to zero.
    dim = bloom_threshold(jnp.full((8, 8, 3), 0.5), 1.0, 4, 4)
    assert np.all(np.asarray(dim[..., :3]) == 0.0)


def test_luminance_smoothing_and_clamp():
    thresh = jnp.zeros((4, 4, 4)).at[..., 3].set(1.0)  # loglum = 1
    new = average_log_luminance(thresh, old_log_lum=jnp.float32(0.0),
                                frame_time=1.0)
    # lerp = 1-0.5^1 = 0.5 -> halfway to 1.
    assert abs(float(new) - 0.5) < 1e-6
    # Clamp to [-3, 2].
    big = jnp.zeros((4, 4, 4)).at[..., 3].set(50.0)
    new = average_log_luminance(big, jnp.float32(2.0), frame_time=100.0)
    assert float(new) <= 2.0 + 1e-6


def test_bloom_kernels_preserve_dc():
    # Constant image must stay constant through down/upsample (weights
    # sum to 1).
    img = jnp.full((16, 16, 4), 3.0)
    down = bloom_downsample(img, 8, 8)
    assert np.allclose(np.asarray(down), 3.0, atol=1e-5)
    up = bloom_upsample(down, 16, 16)
    assert np.allclose(np.asarray(up), 3.0, atol=1e-5)
    # Feedback lerp: frame_time -> infinity converges to current value.
    fed = bloom_downsample(img, 8, 8, history=jnp.zeros((8, 8, 4)),
                           frame_time=1000.0)
    assert np.allclose(np.asarray(fed), 3.0, atol=1e-4)


def test_tonemap_filmic_properties():
    # Monotone, zero at zero, white point maps to 1.
    xs = jnp.linspace(0.0, 11.2, 64)
    ys = np.asarray(tonemap_filmic(xs))
    assert ys[0] <= 1e-6
    assert np.all(np.diff(ys) > 0)
    assert abs(ys[-1] - 1.0) < 1e-5


def test_tonemap_exposure():
    hdr = jnp.full((4, 4, 3), 1.0)
    dark = tonemap(hdr, None, avg_log_lum=jnp.float32(2.0))   # exposure /4
    bright = tonemap(hdr, None, avg_log_lum=jnp.float32(-2.0))  # x4
    assert float(dark.mean()) < float(bright.mean())


def test_resize_bilinear_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(8, 8, 3)
                      .astype(np.float32))
    same = resize_bilinear(img, 8, 8)
    assert np.allclose(np.asarray(same), np.asarray(img), atol=1e-6)


def test_fast_paths_match_gather_taps():
    # The conv/shift fast paths must reproduce the gather-tap reference
    # (same math, reassociated).
    from granite_tpu.ops.hdr import _taps, _DOWN_TAPS, _UP_TAPS
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(32, 64, 4).astype(np.float32))
    fast = bloom_downsample(img, 16, 32)
    ref = _taps(img, 16, 32, _DOWN_TAPS)
    assert np.allclose(np.asarray(fast), np.asarray(ref), atol=2e-5)

    small = jnp.asarray(rng.rand(16, 32, 4).astype(np.float32))
    fast_up = bloom_upsample(small, 32, 64)
    ref_up = _taps(small, 32, 64, _UP_TAPS)
    assert np.allclose(np.asarray(fast_up), np.asarray(ref_up), atol=2e-5)


def test_resize_fast_paths():
    from granite_tpu.ops.hdr import _sample_bilinear_uv
    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.rand(16, 24, 3).astype(np.float32))
    # 2:1 down == box == bilinear at exact half.
    down = resize_bilinear(img, 8, 12)
    u = (jnp.arange(12, dtype=jnp.float32) + 0.5) / 12
    v = (jnp.arange(8, dtype=jnp.float32) + 0.5) / 8
    uu, vv = jnp.meshgrid(u, v)
    ref = _sample_bilinear_uv(img, uu, vv)
    assert np.allclose(np.asarray(down), np.asarray(ref), atol=2e-6)
    # integer upsample x4 matches the gather bilinear.
    up = resize_bilinear(img, 64, 96)
    u = (jnp.arange(96, dtype=jnp.float32) + 0.5) / 96
    v = (jnp.arange(64, dtype=jnp.float32) + 0.5) / 64
    uu, vv = jnp.meshgrid(u, v)
    ref = _sample_bilinear_uv(img, uu, vv)
    assert np.allclose(np.asarray(up), np.asarray(ref), atol=2e-6)


def test_environment_sh_and_sky():
    import numpy as np
    from granite_tpu.renderer.environment import (
        Environment, eval_sh9, procedural_sky_equirect, sample_environment,
        project_sh9,
    )
    sky = procedural_sky_equirect(32, sun_dir=(0, 1, 0))
    assert sky.shape == (32, 64, 3) and np.isfinite(sky).all()
    sh = project_sh9(sky)
    # Up-facing irradiance must exceed down-facing (sun + zenith above).
    up = np.asarray(eval_sh9(jnp.asarray(sh), jnp.array([[0.0, 1.0, 0.0]])))
    down = np.asarray(eval_sh9(jnp.asarray(sh),
                               jnp.array([[0.0, -1.0, 0.0]])))
    assert up[0].mean() > down[0].mean()
    env = Environment(sky)
    # Sampling straight up hits the sun-bright zenith region.
    up_rgb = np.asarray(sample_environment(
        env.strips, jnp.array([[0.0, 1.0, 0.0]]), jnp.float32(0.0)))
    side_rgb = np.asarray(sample_environment(
        env.strips, jnp.array([[1.0, 0.05, 0.0]]), jnp.float32(0.0)))
    assert up_rgb.mean() > side_rgb.mean()
