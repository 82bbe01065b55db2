"""Volumetric fog tests (lights/volumetric_fog.cpp behavioral port)."""

import numpy as np
import pytest
import jax.numpy as jnp

from granite_tpu.math.muglm import perspective
from granite_tpu.ops.volumetric_fog import (
    apply_fog, fog_accumulate, fog_light_density, slice_z_log2_scale,
    texture_z_to_world, world_to_texture_z,
)


def test_slice_mapping_roundtrip():
    s = slice_z_log2_scale(80.0)
    tz = jnp.linspace(0.0, 1.0, 16)
    wz = texture_z_to_world(tz, s)
    assert abs(float(wz[-1]) - 80.0) < 1e-3          # full range
    back = world_to_texture_z(wz, s)
    assert np.allclose(np.asarray(back), np.asarray(tz), atol=1e-5)


def test_accumulate_matches_serial_recurrence():
    rng = np.random.RandomState(1)
    ld = rng.rand(8, 4, 4, 4).astype(np.float32) * 0.3
    out = np.asarray(fog_accumulate(jnp.asarray(ld)))
    # Serial reference of fog_accumulate.comp (same smoothing taps via
    # the op itself at D slices of a single column is hard; instead
    # verify the prefix-sum identity on the SMOOTHED volume by checking
    # monotonic transmittance and inscatter growth).
    assert (np.diff(out[..., 3], axis=0) <= 1e-6).all()   # T decreasing
    assert (np.diff(out[..., 0], axis=0) >= -1e-6).all()  # light grows
    assert (out[..., 3] <= 1.0 + 1e-6).all()


@pytest.mark.slow
def test_fog_volume_and_apply():
    proj = perspective(np.pi / 3, 1.0, 0.1)
    ivp = jnp.asarray(np.linalg.inv(proj).astype(np.float32))
    ld = fog_light_density(
        ivp, proj, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]),
        jnp.asarray([1.0, 1.0, 1.0]), grid=(16, 8, 8))
    assert ld.shape == (16, 8, 8, 4)
    assert (np.asarray(ld[..., 3]) > 0).all()        # albedo positive
    vol = fog_accumulate(ld)
    color = jnp.ones((32, 32, 3), jnp.float32)
    near = apply_fog(color, jnp.full((32, 32), 0.5, jnp.float32), vol)
    far = apply_fog(color, jnp.full((32, 32), 60.0, jnp.float32), vol)
    # Far surfaces are more fogged: lower transmitted contrast vs near.
    assert float(np.asarray(far).mean()) != float(np.asarray(near).mean())
    # Transmittance falls with distance -> far pixels lose more of the
    # white base color than they gain inscatter (sun-lit thin fog).
    s = slice_z_log2_scale(80.0)
    t_near = float(np.asarray(vol[..., 3]).mean(axis=(1, 2))[2])
    t_far = float(np.asarray(vol[..., 3]).mean(axis=(1, 2))[-1])
    assert t_far < t_near


def test_fog_regions_density():
    """FOG_REGIONS density (fog_light_density.comp:20-60): fade-edged
    unit boxes, optional density grid, sum over regions."""
    import numpy as np
    from granite_tpu.ops.volumetric_fog import region_fog_density
    w2t = np.zeros((3, 4), np.float32)     # world == texture space box
    w2t[0, 0] = w2t[1, 1] = w2t[2, 2] = 1.0
    pos = jnp.asarray([[0.5, 0.5, 0.5],    # center -> fade 1
                       [0.97, 0.5, 0.5],   # in the fade band
                       [2.0, 0.5, 0.5]])   # outside -> 0
    d = np.asarray(region_fog_density(pos, [(w2t, None)]))
    assert abs(d[0] - 1.0) < 1e-5
    assert 0.0 < d[1] < 1.0
    assert d[2] == 0.0
    # density grid modulates (bottom half 0, top half 2)
    vol = np.zeros((2, 2, 2), np.float32)
    vol[1] = 2.0                           # z (depth axis) upper half
    dv = np.asarray(region_fog_density(pos[:1], [(w2t, vol)]))
    assert abs(dv[0] - 1.0) < 1e-5         # trilerp at center = 1.0
    # two overlapping regions sum
    d2 = np.asarray(region_fog_density(pos[:1], [(w2t, None),
                                                 (w2t, None)]))
    assert abs(d2[0] - 2.0) < 1e-5


@pytest.mark.slow
def test_viewer_fog_regions_knob():
    import json
    import tempfile
    import types
    from granite_tpu.app.scene_viewer import SceneViewerApplication

    def render(regions: bool):
        cfg = {"renderer": "forward", "hdrBloom": False,
               "shadowMapResolution": 32, "clusteredLightsShadows": False,
               "volumetricFog": True, "volumetricFogRegions": regions}
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            json.dump(cfg, f)
            path = f.name
        app = SceneViewerApplication(types.SimpleNamespace(
            scene=None, config=path, camera_index=-1, bench_scene=False))
        app.swapchain_updated(96, 54)
        return np.asarray(app.render_frame(1 / 60, 0.0)).astype(
            np.float32)

    uniform = render(False)
    regioned = render(True)
    assert uniform.shape == regioned.shape
    # Region-bounded fog differs from uniform fog somewhere on screen.
    assert np.abs(uniform[..., :3] - regioned[..., :3]).max() > 2
