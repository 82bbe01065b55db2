"""GTX pipeline + IBL baker tools (tools/gtx_cat, texture_viewer,
image_packer, brdf_lut_generate, convert_cube_to_environment —
reference tools/ equivalents)."""

import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")


def run(tool, *args):
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", tool), *args],
        capture_output=True, text=True, env=ENV, cwd=ROOT)


def test_pack_cat_view_roundtrip(tmp_path):
    from granite_tpu.utils.image_io import save_png
    rng = np.random.RandomState(7)
    img = np.zeros((32, 32, 4), np.uint8)
    img[..., 0] = np.linspace(0, 255, 32)[None, :]
    img[..., 1] = np.linspace(255, 0, 32)[:, None]
    img[..., 2] = 128
    img[..., 3] = 255
    src = str(tmp_path / "in.png")
    save_png(src, img)
    gtpx = str(tmp_path / "out.gtpx")
    r = run("image_packer.py", src, "--output", gtpx, "--format", "bc1",
            "--mips")
    assert r.returncode == 0, r.stderr
    r = run("gtx_cat.py", gtpx)
    assert r.returncode == 0 and "bc1 32x32 levels=6" in r.stdout, \
        r.stdout + r.stderr
    assert "WARNING" not in r.stdout
    out = str(tmp_path / "back.png")
    r = run("texture_viewer.py", gtpx, "--output", out, "--level", "0")
    assert r.returncode == 0, r.stderr
    from granite_tpu.utils.image_io import load_image
    back = load_image(out)
    err = np.abs(back[..., :3].astype(int) - img[..., :3].astype(int))
    assert err.mean() < 12      # BC1-grade

    # level 2 decodes too
    r = run("texture_viewer.py", gtpx, "--output",
            str(tmp_path / "l2.png"), "--level", "2")
    assert r.returncode == 0, r.stderr


def test_brdf_lut_properties(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from brdf_lut_generate import integrate_brdf
    lut = integrate_brdf(16, 64)
    assert lut.shape == (16, 16, 2)
    assert np.isfinite(lut).all()
    assert (lut >= 0).all() and (lut[..., 0] <= 4.0).all()
    # split-sum energy: smooth surfaces integrate to ~1 at every NoV
    total = lut[..., 0] + lut[..., 1]
    assert np.allclose(total[0], 1.0, atol=2e-2)   # rough ~ 0 row
    # bias grows toward grazing (fresnel term)
    assert lut[2, 1, 1] > lut[2, -1, 1] * 0.5


def test_cube_to_environment(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from convert_cube_to_environment import cube_sample_dirs, sample_cube
    # constant-color faces -> equirect picks the right face color
    colors = np.eye(3, dtype=np.float32)
    faces = [np.full((8, 8, 3), c, np.float32) for c in
             [colors[0], colors[0] * 0.5, colors[1], colors[1] * 0.5,
              colors[2], colors[2] * 0.5]]
    dirs = cube_sample_dirs(16)
    eq = sample_cube(faces, dirs)
    # +Y pole (v=0) is face 2 => green
    assert np.allclose(eq[0, 0], [0, 1, 0], atol=1e-5)
    # +X direction: u=0 row at equator => red
    assert np.allclose(eq[8, 0], [1, 0, 0], atol=1e-5)
    # +Z at u=0.25 equator => blue
    assert np.allclose(eq[8, 8], [0, 0, 1], atol=1e-5)

    # end-to-end CLI writes a loadable .genv.npz
    from granite_tpu.utils.image_io import save_png
    paths = []
    for i, f in enumerate(faces):
        p = str(tmp_path / f"f{i}.npy")
        np.save(p, f)
        paths.append(p)
    out = str(tmp_path / "env.genv.npz")
    r = run("convert_cube_to_environment.py", *paths, "--output", out,
            "--size", "16", "--equirect-height", "16", "--samples", "8")
    assert r.returncode == 0, r.stderr
    from granite_tpu.renderer.environment import load_baked_environment
    baked = load_baked_environment(out)
    assert len(baked["reflection"]) >= 1
