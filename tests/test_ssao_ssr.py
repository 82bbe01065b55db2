"""SSAO + SSR op tests (reference renderer/post/{ssao,ssr}.cpp)."""

import numpy as np
import jax.numpy as jnp

from granite_tpu.math.muglm import perspective
from granite_tpu.ops.ssao import linearize_reverse_z, ssao, upsample_ao
from granite_tpu.ops.ssr import ssr


def test_ssao_flat_plane_is_unoccluded():
    # Constant depth = flat wall facing the camera: zero occlusion.
    d = jnp.full((64, 64), 0.5, jnp.float32)
    ao = np.asarray(ssao(d, z_near=0.1, proj_scale=32.0))
    assert ao.shape == (32, 32)
    assert (ao > 0.95).all()


def test_ssao_step_darkens_concave_side():
    # A deep slot: near plateau left, far plateau right; the far side
    # next to the step sees the near wall above it -> occluded.
    zn = 0.1
    d = np.full((64, 64), zn / 2.0, np.float32)    # view z = 2
    d[:, :32] = zn / 1.0                           # view z = 1 (closer)
    ao = np.asarray(ssao(jnp.asarray(d), z_near=zn, radius_world=2.0,
                         proj_scale=64.0))
    # Far-side pixels near the edge are occluded by the near plateau.
    edge = ao[8:24, 17:20]
    far_open = ao[8:24, 28:31]
    assert edge.mean() < far_open.mean() - 0.05, \
        (edge.mean(), far_open.mean())
    # upsample shape
    up = upsample_ao(jnp.asarray(ao), 64, 64)
    assert up.shape == (64, 64)


def _mirror_floor_scene(W=128, H=128):
    """Camera at origin (view = identity, -Z forward): a bright wall at
    z = -6 (top of screen) and a mirror floor y = -1 (bottom)."""
    proj = perspective(np.pi / 2, 1.0, 0.1)       # infinite far reverse-Z
    zn = 0.1
    u = (np.arange(W) + 0.5) / W
    v = (np.arange(H) + 0.5) / H
    uu, vv = np.meshgrid(u, v)
    # view-space ray through each pixel (reverse the projection):
    # ndc -> view: x = ndc_x * (-z) * t, with proj[0,0]=1/t etc.
    ndc_x = 2 * uu - 1
    ndc_y = 2 * vv - 1
    t = np.tan(np.pi / 4)
    dirx = ndc_x * t
    diry = -ndc_y * t                 # muglm Y-flip
    dirz = -np.ones_like(dirx)
    # floor hit: y = -1 -> s = -1/diry (diry < 0)
    s_floor = np.where(diry < 0, -1.0 / np.minimum(diry, -1e-6), np.inf)
    # wall hit: z = -6 -> s = 6
    s_wall = np.full_like(s_floor, 6.0)
    s = np.minimum(s_floor, s_wall)
    hit_floor = s_floor < s_wall
    view_z = dirz * s                               # negative
    depth = zn / np.maximum(-view_z, 1e-6)
    normal = np.where(hit_floor[..., None],
                      np.array([0.0, 1.0, 0.0], np.float32),
                      np.array([0.0, 0.0, 1.0], np.float32))
    hdr = np.where(hit_floor[..., None],
                   np.array([0.05, 0.05, 0.05], np.float32),
                   np.array([5.0, 0.2, 0.2], np.float32))
    return (jnp.asarray(hdr.astype(np.float32)),
            jnp.asarray(depth.astype(np.float32)),
            jnp.asarray(normal.astype(np.float32)), proj, hit_floor)


def test_ssr_mirror_floor_reflects_wall():
    hdr, depth, normal, proj, hit_floor = _mirror_floor_scene()
    H, W = depth.shape
    base = jnp.full((H, W, 3), 0.8, jnp.float32)
    metallic = jnp.ones((H, W), jnp.float32)       # mirror
    rough = jnp.zeros((H, W), jnp.float32)
    view = jnp.eye(4)
    out = np.asarray(ssr(hdr, depth, normal, base, metallic, rough,
                         view, jnp.asarray(proj), W, H))
    inp = np.asarray(hdr)
    floor_rows = np.where(hit_floor.any(axis=1))[0]
    r0 = floor_rows.min() + 8
    gained = out[r0:r0 + 24, 32:96, 0] - inp[r0:r0 + 24, 32:96, 0]
    # Reflections of the red wall must add red on the mirror floor.
    assert gained.max() > 0.5, gained.max()
    # Rough surfaces are faded out.
    out_rough = np.asarray(ssr(hdr, depth, normal, base, metallic,
                               jnp.ones((H, W), jnp.float32), view,
                               jnp.asarray(proj), W, H))
    assert np.allclose(out_rough, inp, atol=1e-5)
