"""End-to-end lock of the fusedShade viewer knob: the full deferred
frame rendered through the fused Pallas shade kernel must match the
classic path (interpret mode on CPU; tolerance absorbs only f32
reassociation)."""

import numpy as np
import pytest

from golden_utils import render_config


@pytest.mark.slow
def test_fused_shade_full_frame_matches_classic():
    cfg = {"renderer": "deferred", "hdrBloom": True,
           "shadowMapResolution": 64,
           "clusteredLightsShadowsResolution": 64}
    ref = np.asarray(render_config({**cfg, "fusedShade": False}),
                     np.float32)
    out = np.asarray(render_config({**cfg, "fusedShade": True}),
                     np.float32)
    mse = float(np.mean((ref[..., :3] - out[..., :3]) ** 2))
    psnr = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > 55.0, f"fused vs classic frame PSNR {psnr:.1f} dB"
