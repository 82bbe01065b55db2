"""Axis-aligned bounding boxes (reference: math/aabb.{hpp,cpp}).

Host-side AABB with transform; vectorized variants for SoA scene arrays.
"""

from __future__ import annotations

import numpy as np


class AABB:
    def __init__(self, minimum, maximum):
        self.minimum = np.asarray(minimum, dtype=np.float32)
        self.maximum = np.asarray(maximum, dtype=np.float32)

    def get_center(self) -> np.ndarray:
        return 0.5 * (self.minimum + self.maximum)

    def get_radius(self) -> float:
        return 0.5 * float(np.linalg.norm(self.maximum - self.minimum))

    def get_corners(self) -> np.ndarray:
        """(8, 3) corner positions."""
        mn, mx = self.minimum, self.maximum
        sel = np.array([[(i >> k) & 1 for k in range(3)] for i in range(8)],
                       dtype=np.float32)
        return mn * (1.0 - sel) + mx * sel

    def transform(self, m: np.ndarray) -> "AABB":
        """AABB of the transformed corners (aabb.cpp AABB::transform)."""
        corners = self.get_corners()
        h = (m[:3, :3] @ corners.T).T + m[:3, 3]
        return AABB(h.min(axis=0), h.max(axis=0))

    def expand(self, other: "AABB") -> "AABB":
        return AABB(np.minimum(self.minimum, other.minimum),
                    np.maximum(self.maximum, other.maximum))

    def __repr__(self):
        return f"AABB({self.minimum.tolist()}, {self.maximum.tolist()})"


def transform_aabbs(world: np.ndarray, mins: np.ndarray,
                    maxs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized AABB transform for SoA scenes.

    world: (N, 4, 4) transforms; mins/maxs: (N, 3) local bounds.
    Returns (world_mins, world_maxs), each (N, 3).  Uses the center/extent
    absolute-matrix trick (equivalent to transforming all 8 corners).
    """
    c = 0.5 * (mins + maxs)
    e = 0.5 * (maxs - mins)
    rot = world[:, :3, :3]
    wc = np.einsum("nij,nj->ni", rot, c) + world[:, :3, 3]
    we = np.einsum("nij,nj->ni", np.abs(rot), e)
    return (wc - we).astype(np.float32), (wc + we).astype(np.float32)
