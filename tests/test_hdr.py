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
