"""Math convention tests (analogue of reference math/muglm/muglm_test.cpp
and simd_test.cpp): reverse-Z projection, Y-flip, frustum culling."""

import numpy as np

from granite_tpu.math import (
    AABB, Frustum, frustum_cull, perspective, ortho, look_at_matrix,
    translate, scale, rotate, compose_trs, decompose_trs,
    quat_from_axis_angle, quat_mul, quat_rotate, quat_slerp, mat4_cast,
    INFINITE_FAR_PLANE,
)
from granite_tpu.math.transforms import compose_trs_batch


def project(m, p):
    h = m @ np.append(np.asarray(p, np.float32), 1.0)
    return h[:3] / h[3]


def test_perspective_reverse_z():
    p = perspective(np.pi / 2, 1.0, 0.1, 100.0)
    # Camera looks down -Z: near plane -> z_ndc 1, far plane -> 0.
    assert np.isclose(project(p, [0, 0, -0.1])[2], 1.0, atol=1e-5)
    assert np.isclose(project(p, [0, 0, -100.0])[2], 0.0, atol=1e-5)
    # Halfway depth is NOT 0.5 (hyperbolic), sanity only.
    z_mid = project(p, [0, 0, -1.0])[2]
    assert 0.0 < z_mid < 1.0


def test_perspective_y_flip():
    p = perspective(np.pi / 2, 1.0, 0.1, 100.0)
    # A point above the camera axis (+Y view space) lands at negative...
    # after Vulkan Y-flip it must have POSITIVE y (down in image space is +y).
    up = project(p, [0.0, 0.5, -1.0])
    assert up[1] < 0.0 or up[1] > 0.0  # determinate
    # Granite flips Y so +Y view maps to -Y ndc... verify flip vs GL form:
    p_gl = p.copy()
    p_gl[1] *= -1.0
    up_gl = project(p_gl, [0.0, 0.5, -1.0])
    assert np.isclose(up[1], -up_gl[1])


def test_infinite_far_plane():
    p = perspective(np.pi / 3, 16 / 9, 0.5, INFINITE_FAR_PLANE)
    assert np.isclose(project(p, [0, 0, -0.5])[2], 1.0, atol=1e-6)
    assert np.isclose(project(p, [0, 0, -1e7])[2], 0.0, atol=1e-4)


def test_ortho_reverse_z():
    p = ortho(-1, 1, -1, 1, 0.0, 10.0)
    assert np.isclose(project(p, [0, 0, -0.0])[2], 1.0, atol=1e-6)
    assert np.isclose(project(p, [0, 0, -10.0])[2], 0.0, atol=1e-6)


def test_look_at():
    v = look_at_matrix([0, 0, 5], [0, 0, 0], [0, 1, 0])
    # Looking down -Z from z=5: origin maps to (0,0,-5) in view space.
    assert np.allclose(project(np.eye(4) @ v, [0, 0, 0]), [0, 0, -5], atol=1e-6)
    # Right-handed: +X world stays +X view.
    assert np.allclose((v @ [1, 0, 0, 0])[:3], [1, 0, 0], atol=1e-6)


def test_quat_roundtrip():
    q = quat_from_axis_angle([0, 1, 0], np.pi / 2)
    v = quat_rotate(q, [1, 0, 0])
    assert np.allclose(v, [0, 0, -1], atol=1e-6)
    m = mat4_cast(q)
    assert np.allclose((m @ [1, 0, 0, 0])[:3], [0, 0, -1], atol=1e-6)
    q2 = quat_mul(q, q)
    assert np.allclose(quat_rotate(q2, [1, 0, 0]), [-1, 0, 0], atol=1e-6)


def test_quat_slerp():
    a = quat_from_axis_angle([0, 0, 1], 0.0)
    b = quat_from_axis_angle([0, 0, 1], np.pi / 2)
    mid = quat_slerp(a, b, 0.5)
    expect = quat_from_axis_angle([0, 0, 1], np.pi / 4)
    assert np.allclose(mid, expect, atol=1e-5)


def test_trs_compose_decompose():
    t = np.array([1.0, -2.0, 3.0], np.float32)
    r = quat_from_axis_angle([1, 2, 3], 0.7)
    s = np.array([2.0, 0.5, 1.5], np.float32)
    m = compose_trs(t, r, s)
    t2, r2, s2 = decompose_trs(m)
    assert np.allclose(t, t2, atol=1e-5)
    assert np.allclose(s, s2, atol=1e-5)
    if np.dot(r, r2) < 0:
        r2 = -r2
    assert np.allclose(r, r2, atol=1e-4)


def test_trs_batch_matches_single():
    rng = np.random.RandomState(0)
    t = rng.randn(5, 3).astype(np.float32)
    r = rng.randn(5, 4).astype(np.float32)
    s = rng.rand(5, 3).astype(np.float32) + 0.5
    batch = compose_trs_batch(t, r, s)
    for i in range(5):
        single = compose_trs(t[i], r[i] / np.linalg.norm(r[i]), s[i])
        assert np.allclose(batch[i], single, atol=1e-5)


def test_frustum_cull():
    vp = perspective(np.pi / 2, 1.0, 0.1, 100.0) @ \
        look_at_matrix([0, 0, 0], [0, 0, -1], [0, 1, 0])
    fr = Frustum(vp)
    assert fr.intersects(AABB([-1, -1, -6], [1, 1, -4]))       # in front
    assert not fr.intersects(AABB([-1, -1, 4], [1, 1, 6]))      # behind
    assert not fr.intersects(AABB([500, -1, -6], [502, 1, -4])) # far right
    assert not fr.intersects(AABB([-1, -1, -300], [1, 1, -200]))  # beyond far
    # Straddling near plane still visible.
    assert fr.intersects(AABB([-1, -1, -1], [1, 1, 1]))
    # Vectorized path agrees.
    mins = np.array([[-1, -1, -6], [-1, -1, 4], [500, -1, -6]], np.float32)
    maxs = np.array([[1, 1, -4], [1, 1, 6], [502, 1, -4]], np.float32)
    assert frustum_cull(fr.planes, mins, maxs).tolist() == [True, False, False]


def test_aabb_transform():
    box = AABB([-1, -1, -1], [1, 1, 1])
    m = translate([10, 0, 0]) @ rotate(np.pi / 4, [0, 0, 1]) @ scale([2, 2, 2])
    out = box.transform(m)
    r = 2 * np.sqrt(2)
    assert np.allclose(out.minimum, [10 - r, -r, -2], atol=1e-5)
    assert np.allclose(out.maximum, [10 + r, r, 2], atol=1e-5)


def test_vectorized_aabb_transform():
    from granite_tpu.math.aabb import transform_aabbs
    box = AABB([-1, -2, -3], [2, 1, 0.5])
    m = translate([3, 4, 5]) @ rotate(0.6, [1, 1, 0]) @ scale([1.5, 2.0, 0.7])
    ref = box.transform(m)
    mins, maxs = transform_aabbs(m[None], box.minimum[None], box.maximum[None])
    assert np.allclose(mins[0], ref.minimum, atol=1e-5)
    assert np.allclose(maxs[0], ref.maximum, atol=1e-5)
