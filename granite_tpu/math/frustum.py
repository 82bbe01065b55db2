"""View frustum extraction and vectorized culling.

Reference: math/frustum.{hpp,cpp} builds 6 planes from inv(view_proj);
math/simd.hpp:34 SIMD::frustum_cull tests AABBs 4-wide with SSE/NEON.
Here the cull is one vectorized op over ALL AABBs at once — the TPU/SoA
analogue of the reference's per-object SIMD loop (scene.cpp:95).

Clip-space conventions (see math/muglm.py): -w<=x<=w, -w<=y<=w and
reverse-Z 0<=z<=w.
"""

from __future__ import annotations

import numpy as np


def extract_planes(view_proj: np.ndarray) -> np.ndarray:
    """(6, 4) planes (a,b,c,d), inside when a*x+b*y+c*z+d >= 0."""
    m = np.asarray(view_proj, dtype=np.float32)
    rows = [m[3] + m[0],   # x >= -w
            m[3] - m[0],   # x <=  w
            m[3] + m[1],   # y >= -w
            m[3] - m[1],   # y <=  w
            m[2],          # z >= 0   (reverse-Z far plane at infinity-safe)
            m[3] - m[2]]   # z <=  w  (near plane)
    planes = np.stack(rows)
    norms = np.linalg.norm(planes[:, :3], axis=1, keepdims=True)
    return planes / np.maximum(norms, 1e-30)


class Frustum:
    def __init__(self, view_proj: np.ndarray):
        self.view_proj = np.asarray(view_proj, dtype=np.float32)
        self.planes = extract_planes(view_proj)
        self.inv_view_proj = np.linalg.inv(self.view_proj)

    def intersects(self, aabb) -> bool:
        return bool(frustum_cull(self.planes,
                                 aabb.minimum[None], aabb.maximum[None])[0])

    def intersects_sphere(self, center, radius: float) -> bool:
        c = np.append(np.asarray(center, np.float32), 1.0)
        return bool(np.all(self.planes @ c >= -radius))


def frustum_cull(planes, mins, maxs):
    """Vectorized AABB-vs-frustum test.

    planes: (6, 4); mins/maxs: (N, 3).  Returns (N,) bool visibility mask.
    Works with numpy or jax.numpy arrays (positive-vertex test).
    """
    xp = np if isinstance(mins, np.ndarray) else __import__("jax.numpy",
                                                            fromlist=["jnp"])
    n = planes[:, :3]                                   # (6, 3)
    d = planes[:, 3]                                    # (6,)
    # Positive vertex: per-plane select max where normal >= 0 else min.
    pv = xp.where(n[None, :, :] >= 0, maxs[:, None, :], mins[:, None, :])
    dist = (pv * n[None, :, :]).sum(-1) + d[None, :]     # (N, 6)
    return (dist >= 0).all(-1)
