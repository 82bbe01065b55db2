"""Volumetric diffuse GI tests (renderer/lights/volumetric_diffuse.cpp +
assets/shaders/lights/volumetric_diffuse.h behavior)."""

import json
import tempfile
import types

import jax.numpy as jnp
import numpy as np
import pytest

from granite_tpu.renderer.volumetric_diffuse import (
    DiffuseVolume, ambient_cube_integral, bake_volume,
    face_solid_angle_weights, fallback_cube_from_sky, oct_pack_grid,
    probe_positions, sample_volumetric_diffuse, volume_transforms,
)


def test_solid_angles_cover_sphere():
    """The per-texel estimate 4/(res^2 l^3) sums to ~4*pi over the cube."""
    dirs, area = face_solid_angle_weights(32)
    total = 6 * area.sum()
    assert abs(total / (4 * np.pi) - 1.0) < 0.01


def test_ambient_cube_constant_environment():
    """A constant-radiance environment integrates to (almost) the same
    constant on every face: integral of L*cos/pi over the hemisphere = L."""
    faces = jnp.full((6, 32, 32, 3), 2.0, jnp.float32)
    cube = np.asarray(ambient_cube_integral(faces))
    assert cube.shape == (6, 3)
    assert np.allclose(cube, 2.0, rtol=0.02)


def test_ambient_cube_directional():
    """Light only on the +Y face: the +Y ambient entry dominates, the
    -Y entry is ~0 (cosine-clamped hemisphere)."""
    faces = np.zeros((6, 16, 16, 3), np.float32)
    faces[2] = 1.0                       # +Y face
    cube = np.asarray(ambient_cube_integral(jnp.asarray(faces)))
    assert cube[2, 0] > 0.2              # +Y sees it
    assert cube[3, 0] < 1e-4             # -Y hemisphere excludes it
    assert cube[0, 0] > 0.0              # side faces see some


def _unit_volume(ambient):
    w2t, t2w = volume_transforms(np.eye(4, dtype=np.float32))
    a = jnp.asarray(ambient)
    return DiffuseVolume(world_to_tex=w2t, tex_to_world=t2w,
                         resolution=(ambient.shape[3], ambient.shape[2],
                                     ambient.shape[1]),
                         ambient=a, packed=oct_pack_grid(a))


def test_sampling_face_select_and_fallback():
    """normal^2-weighted signed-face blend (volumetric_diffuse.h:62-77)
    + 0.01 fallback weight normalization (:95, :152)."""
    amb = np.zeros((6, 2, 2, 2, 3), np.float32)
    amb[0] = [1, 0, 0]     # +X red
    amb[1] = [0, 1, 0]     # -X green
    amb[2] = [0, 0, 1]     # +Y blue
    vol = _unit_volume(amb)
    fallback = jnp.zeros((6, 3), jnp.float32)
    pos = jnp.zeros((1, 1, 3), jnp.float32)   # volume center, w=1

    def sample(n):
        nrm = jnp.asarray(np.asarray(n, np.float32).reshape(1, 1, 3))
        return np.asarray(sample_volumetric_diffuse(
            [vol], pos, nrm, fallback))[0, 0]

    r = sample([1, 0, 0])
    assert np.allclose(r, [1 / 1.01, 0, 0], atol=1e-3)     # w=1 vs 0.01
    g = sample([-1, 0, 0])
    assert np.allclose(g, [0, 1 / 1.01, 0], atol=1e-3)
    mixed = sample(np.array([1, 1, 0]) / np.sqrt(2))
    assert abs(mixed[0] - 0.5 / 1.01) < 1e-3               # nx^2 = 0.5
    assert abs(mixed[2] - 0.5 / 1.01) < 1e-3               # +Y blue

    # Far outside the volume: guard band weight 0 -> pure fallback (0).
    far = np.asarray(sample_volumetric_diffuse(
        [vol], jnp.full((1, 1, 3), 50.0), jnp.asarray([[[1.0, 0, 0]]]),
        fallback))
    assert np.allclose(far, 0.0)


def test_guard_band_weight_falls_off():
    amb = np.ones((6, 2, 2, 2, 3), np.float32)
    vol = _unit_volume(amb)
    fallback = jnp.zeros((6, 3), jnp.float32)
    n = jnp.asarray([[[0.0, 1.0, 0.0]]])
    center = np.asarray(sample_volumetric_diffuse(
        [vol], jnp.zeros((1, 1, 3)), n, fallback))[0, 0, 0]
    edge = np.asarray(sample_volumetric_diffuse(
        [vol], jnp.asarray([[[0.49, 0.0, 0.0]]]), n, fallback))[0, 0, 0]
    assert center > 0.98                 # full weight vs 0.01 fallback
    assert edge < center                 # guard band blends out


def test_bake_volume_synthetic():
    """Baking against a synthetic renderer (white above, black below)
    yields ambient cubes lit from +Y."""
    def render_face(pos, face):
        img = np.zeros((8, 8, 3), np.float32)
        if face == 2:                    # +Y
            img[:] = 1.0
        return jnp.asarray(img)

    vol = bake_volume(render_face, np.eye(4, dtype=np.float32), (2, 2, 2),
                      face_res=8)
    amb = np.asarray(vol.ambient)
    assert amb.shape == (6, 2, 2, 2, 3)
    assert (amb[2] > 0.2).all()          # +Y entries bright
    assert (amb[3] < 1e-4).all()         # -Y dark
    w2t, t2w = volume_transforms(np.eye(4, dtype=np.float32))
    pp = probe_positions(t2w, (2, 2, 2))
    assert pp.shape == (2, 2, 2, 3)
    assert np.allclose(pp[0, 0, 0], [-0.25, -0.25, -0.25])


@pytest.mark.slow
def test_viewer_volumetric_diffuse_knob():
    """volumetricDiffuse knob: bakes a volume over the procedural scene
    and shades with it (replaces the SH ambient)."""
    from granite_tpu.app.scene_viewer import SceneViewerApplication

    cfg = {"renderer": "forward", "hdrBloom": False,
           "shadowMapResolution": 32, "clusteredLightsShadows": False,
           "volumetricDiffuse": True, "volumetricDiffuseResolution": 2,
           "volumetricDiffuseFaceResolution": 8}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name
    app = SceneViewerApplication(types.SimpleNamespace(
        scene=None, config=path, camera_index=-1, bench_scene=False))
    app.swapchain_updated(96, 54)
    assert app._vol_diffuse is not None
    assert len(app._vol_diffuse["volumes"]) == 1
    out = np.asarray(app.render_frame(1 / 60, 0.0))
    assert out.shape == (54, 96, 4)
    assert (out[..., :3] > 0).any()
