"""Offline IBL convolver tests
(tools/convert_equirect_to_environment.cpp analogue)."""

import numpy as np
import jax.numpy as jnp

from granite_tpu.renderer.environment import (
    Environment, load_baked_environment, prefilter_ggx_equirect,
    procedural_sky_equirect, sample_environment, save_baked_environment,
)


def test_ggx_prefilter_constant_env_invariant():
    """Convolving a constant environment returns the constant at every
    roughness level (energy-preserving weights)."""
    env = np.full((16, 32, 3), 0.7, np.float32)
    levels = prefilter_ggx_equirect(env, 16, 4, samples=32)
    assert len(levels) == 4
    for l, lv in enumerate(levels):
        assert lv.shape == (16 >> l, 16 >> l, 3)
        assert np.allclose(lv, 0.7, atol=1e-3), l


def test_ggx_prefilter_blurs_with_roughness():
    """A point-light environment spreads wider at higher roughness: the
    max response falls, the energy spreads."""
    env = np.zeros((32, 64, 3), np.float32)
    env[4, 16] = 50.0                       # bright texel
    levels = prefilter_ggx_equirect(env, 32, 4, samples=128)
    peak0 = levels[0].max()
    peak3 = levels[3].max()
    assert peak3 < peak0                     # blurrier


def test_bake_roundtrip_and_runtime_use(tmp_path):
    sky = procedural_sky_equirect(32)
    path = str(tmp_path / "env.genv.npz")
    save_baked_environment(path, sky, base_size=32, samples=16)
    baked = load_baked_environment(path)
    assert baked["sh"].shape == (9, 3)
    assert baked["irradiance"].shape == (32, 64, 3)
    assert len(baked["reflection"]) == 6

    env = Environment(sky, baked=baked)
    assert env.num_levels == 6
    dirs = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    # level 0 sharp sample vs high-lod sample both finite + positive
    s0 = np.asarray(sample_environment(env.strips, dirs, 0))
    s3 = np.asarray(sample_environment(env.strips, dirs,
                                       jnp.full(2, 3.0)))
    assert np.isfinite(s0).all() and np.isfinite(s3).all()
    assert (s0 >= 0).all()
    # rough lod is smoother: up vs side differ less than at lod 0
    d0 = np.abs(s0[0] - s0[1]).sum()
    d3 = np.abs(s3[0] - s3[1]).sum()
    assert d3 <= d0 + 1e-4


def test_cli_tool(tmp_path):
    import subprocess
    import sys
    sky = procedural_sky_equirect(16)
    src = str(tmp_path / "sky.npy")
    np.save(src, sky)
    out = str(tmp_path / "out.genv.npz")
    r = subprocess.run(
        [sys.executable, "tools/convert_equirect_to_environment.py", src,
         "--output", out, "--size", "16", "--samples", "8"],
        capture_output=True, text=True,
        env={"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/bin:/bin:/opt/venv/bin"})
    assert r.returncode == 0, r.stderr
    baked = load_baked_environment(out)
    assert len(baked["reflection"]) == 5
