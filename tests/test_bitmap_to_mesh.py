"""bitmap-to-mesh tests (tools/bitmap_to_mesh.cpp behavior:
watertight extrusion of a bitmap's opaque pixels)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from tools.bitmap_to_mesh import bitmap_to_meshdata, greedy_rects  # noqa


def _edge_counts(indices):
    from collections import Counter
    c = Counter()
    for a, b, d in indices:
        for e in ((a, b), (b, d), (d, a)):
            c[tuple(sorted(e))] += 1
    return c


def _bitmap(mask):
    h, w = mask.shape
    img = np.zeros((h, w, 4), np.uint8)
    img[..., :3] = 200
    img[..., 3] = np.where(mask, 255, 0)
    return img


def test_greedy_rects_cover_exactly():
    mask = np.zeros((6, 6), bool)
    mask[1:5, 1:3] = True
    mask[2, 4] = True
    rects = greedy_rects(mask)
    cover = np.zeros_like(mask, dtype=int)
    for (y, x, h, w) in rects:
        cover[y:y + h, x:x + w] += 1
    assert (cover == mask.astype(int)).all()


def test_extrusion_watertight_greedy_and_perpixel():
    mask = np.zeros((5, 7), bool)
    mask[1:4, 1:6] = True
    mask[2, 3] = False                  # a hole
    for per_pixel in (False, True):
        md = bitmap_to_meshdata(_bitmap(mask), per_pixel=per_pixel)
        # Watertight manifold: every edge borders exactly 2 triangles.
        counts = _edge_counts(md.indices)
        bad = [e for e, n in counts.items() if n != 2]
        assert not bad, (per_pixel, bad[:5], len(bad))
        # Non-degenerate volume: front and back faces both exist.
        z = md.positions[:, 2]
        assert z.max() > 0 > z.min()


def test_cli_exports_gltf(tmp_path):
    import subprocess
    mask = np.zeros((4, 4), bool)
    mask[1:3, 1:3] = True
    from granite_tpu.utils.image_io import save_png
    src = str(tmp_path / "bm.png")
    save_png(src, _bitmap(mask))
    out = str(tmp_path / "bm.gltf")
    r = subprocess.run(
        [sys.executable, "tools/bitmap_to_mesh.py", src, "--output", out],
        capture_output=True, text=True,
        env={"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/bin:/bin:/opt/venv/bin"})
    assert r.returncode == 0, r.stderr
    # Round-trips through the glTF parser.
    from granite_tpu.scene.gltf import GLTFParser
    info = GLTFParser(out).get_scene()
    assert len(info.meshes) == 1
    assert len(info.meshes[0].indices) > 0
