"""TRS composition/decomposition (reference: math/transforms.{hpp,cpp}).

Vectorized over SoA node arrays: the scene stores (translation, rotation
quat, scale) per node and composes local matrices in one shot.
"""

from __future__ import annotations

import numpy as np

from .muglm import mat3_cast, quat_normalize


def compose_trs(translation, rotation, scale_v) -> np.ndarray:
    """Single-node local transform T * R * S (matches Node::Transform use)."""
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = mat3_cast(rotation) * np.asarray(scale_v, np.float32)[None, :]
    m[:3, 3] = translation
    return m


def compose_trs_batch(t: np.ndarray, r: np.ndarray, s: np.ndarray) -> np.ndarray:
    """(N,3),(N,4 wxyz),(N,3) -> (N,4,4) local matrices, fully vectorized."""
    r = r / np.maximum(np.linalg.norm(r, axis=-1, keepdims=True), 1e-30)
    w, x, y, z = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    rot = np.empty((len(r), 3, 3), dtype=np.float32)
    rot[:, 0, 0] = 1 - 2 * (yy + zz)
    rot[:, 0, 1] = 2 * (xy - wz)
    rot[:, 0, 2] = 2 * (xz + wy)
    rot[:, 1, 0] = 2 * (xy + wz)
    rot[:, 1, 1] = 1 - 2 * (xx + zz)
    rot[:, 1, 2] = 2 * (yz - wx)
    rot[:, 2, 0] = 2 * (xz - wy)
    rot[:, 2, 1] = 2 * (yz + wx)
    rot[:, 2, 2] = 1 - 2 * (xx + yy)
    m = np.zeros((len(r), 4, 4), dtype=np.float32)
    m[:, :3, :3] = rot * s[:, None, :]
    m[:, :3, 3] = t
    m[:, 3, 3] = 1.0
    return m


def decompose_trs(m: np.ndarray):
    """Matrix -> (translation, quat wxyz, scale); assumes no shear."""
    t = m[:3, 3].copy()
    basis = m[:3, :3]
    s = np.linalg.norm(basis, axis=0)
    if np.linalg.det(basis) < 0:
        s[0] = -s[0]
    rot = basis / s[None, :]
    from .muglm import _quat_from_mat3
    return t.astype(np.float32), quat_normalize(_quat_from_mat3(rot)), \
        s.astype(np.float32)
