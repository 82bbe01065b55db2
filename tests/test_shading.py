"""Shading kernel tests: BRDF numeric gates (the FFT-SNR-test analogue for
lighting math), shadow PCF behavior, texture-array sampling."""

import numpy as np
import jax.numpy as jnp

from granite_tpu.ops.pbr import (
    PI, compute_f0, compute_lighting, d_ggx, fresnel, g_schlick,
)
from granite_tpu.ops.shadow import (
    directional_shadow_matrix, pcf_2x2, pcf_wide, sample_directional_shadow,
    shadow_uv_transform,
)
from granite_tpu.ops.srgb import linear_to_srgb, srgb_to_linear
from granite_tpu.ops.texture import (
    WRAP_CLAMP, WRAP_REPEAT, build_mip_strip, sample_array_level,
    sample_array_trilinear, num_mip_levels,
)


def test_srgb_roundtrip():
    x = jnp.linspace(0, 1, 256)
    y = srgb_to_linear(linear_to_srgb(x))
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-5)
    # Known values of the IEC curve.
    assert abs(float(linear_to_srgb(jnp.float32(0.5))) - 0.735357) < 1e-4
    assert abs(float(srgb_to_linear(jnp.float32(0.5))) - 0.214041) < 1e-4


def test_brdf_reference_values():
    # Hand-computed from the reference formulas (pbr.h).
    r = 0.5
    noh = 0.9
    m2 = (r * r) ** 2
    d_expect = m2 / (PI * ((noh * m2 - noh) * noh + 1.0) ** 2)
    assert abs(float(d_ggx(r, jnp.float32(noh))) - d_expect) < 1e-6
    k = (r + 1.0) ** 2 / 8.0
    g_expect = 0.25 / ((0.8 * (1 - k) + k) * (0.7 * (1 - k) + k))
    assert abs(float(g_schlick(r, jnp.float32(0.8), jnp.float32(0.7)))
               - g_expect) < 1e-6
    f0 = compute_f0(jnp.array([[1.0, 0.0, 0.0]]), jnp.array([0.5]))
    assert np.allclose(np.asarray(f0), [[0.52, 0.02, 0.02]], atol=1e-6)
    f = fresnel(jnp.array([[0.04, 0.04, 0.04]]), jnp.array([1.0]))
    assert np.allclose(np.asarray(f), 0.04, atol=1e-6)
    f_grazing = fresnel(jnp.array([[0.04, 0.04, 0.04]]), jnp.array([0.0]))
    assert np.allclose(np.asarray(f_grazing), 1.0, atol=1e-6)


def test_compute_lighting_energy():
    # Head-on white light on a diffuse white surface.
    base = jnp.ones((1, 1, 3))
    n = jnp.array([[[0.0, 0.0, 1.0]]])
    pos = jnp.zeros((1, 1, 3))
    out = compute_lighting(
        base, n, jnp.zeros((1, 1)), jnp.ones((1, 1)) * 0.5,
        jnp.ones((1, 1)), pos, jnp.array([0.0, 0.0, 5.0]),
        jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 1.0, 1.0]))
    v = np.asarray(out)[0, 0]
    assert np.all(v > 0.0) and np.all(v < 2.0)
    # In shadow only ambient remains: 0.05 * base.
    out_sh = compute_lighting(
        base, n, jnp.zeros((1, 1)), jnp.ones((1, 1)) * 0.5,
        jnp.ones((1, 1)), pos, jnp.array([0.0, 0.0, 5.0]),
        jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 1.0, 1.0]),
        shadow_term=jnp.zeros((1, 1)))
    assert np.allclose(np.asarray(out_sh)[0, 0], 0.05, atol=1e-3)


def test_shadow_map_blocks_light():
    # Occluder quad above a ground point: the point must be shadowed.
    light_dir = np.array([0.0, 1.0, 0.0], np.float32)   # light overhead
    mn = np.array([-2, -1, -2], np.float32)
    mx = np.array([2, 2, 2], np.float32)
    light_vp = directional_shadow_matrix(light_dir, mn, mx)
    uv_mat = shadow_uv_transform(light_vp)
    # Render a fake shadow map: occluder at y=1 covering x,z in [-1,1]/2.
    size = 64
    sm = np.zeros((size, size), np.float32)
    # depth of occluder at y=1 from the light:
    occ = (uv_mat @ np.array([0, 1, 0, 1], np.float32))
    uv_occ = occ[:2]
    z_occ = occ[2]
    ys, xs = np.mgrid[0:size, 0:size]
    u = (xs + 0.5) / size
    v = (ys + 0.5) / size
    # world xz of each shadow texel (ortho, axis-aligned here)
    inside = (np.abs(u - uv_occ[0]) < 0.2) & (np.abs(v - uv_occ[1]) < 0.2)
    sm[inside] = z_occ
    sm = jnp.asarray(sm)

    ground = jnp.array([[[0.0, 0.0, 0.0]]])     # under the occluder
    open_pt = jnp.array([[[1.9, 0.0, 1.9]]])    # away from it
    t_blocked = float(np.asarray(sample_directional_shadow(
        sm, jnp.asarray(uv_mat), ground))[0, 0])
    t_open = float(np.asarray(sample_directional_shadow(
        sm, jnp.asarray(uv_mat), open_pt))[0, 0])
    assert t_blocked < 0.05
    assert t_open > 0.95
    # wide kernel agrees in the interior
    t_blocked_w = float(np.asarray(sample_directional_shadow(
        sm, jnp.asarray(uv_mat), ground, wide=True))[0, 0])
    assert t_blocked_w < 0.1


def test_pcf_outside_frustum_is_lit():
    sm = jnp.zeros((8, 8), jnp.float32)
    t = pcf_2x2(sm, jnp.float32(-0.5), jnp.float32(0.5), jnp.float32(0.5))
    assert float(t) == 1.0
    t = pcf_wide(sm, jnp.float32(1.5), jnp.float32(0.5), jnp.float32(0.5))
    assert float(t) == 1.0


def test_mip_strip_sampling():
    s = 8
    img = jnp.asarray(np.arange(s * s, dtype=np.float32).reshape(s, s, 1))
    strip = build_mip_strip(img)
    assert strip.shape == (2 * s, s, 1)
    strips = strip[None]  # array of 1 texture
    # Level 0 texel centers reproduce exact values.
    u = jnp.float32((3 + 0.5) / s)
    v = jnp.float32((2 + 0.5) / s)
    val = sample_array_level(strips, jnp.int32(0), u, v, jnp.int32(0))
    assert abs(float(val[0]) - (2 * s + 3)) < 1e-4
    # Coarsest level equals the global mean.
    L = num_mip_levels(s, s)
    val = sample_array_level(strips, jnp.int32(0), jnp.float32(0.5),
                             jnp.float32(0.5), jnp.int32(L - 1))
    assert abs(float(val[0]) - (s * s - 1) / 2) < 0.51
    # Trilinear midway between levels is between the two bilinear values.
    a = sample_array_level(strips, jnp.int32(0), u, v, jnp.int32(0))
    b = sample_array_level(strips, jnp.int32(0), u, v, jnp.int32(1))
    mid = sample_array_trilinear(strips, jnp.int32(0), u, v,
                                 jnp.float32(0.5))
    lo, hi = sorted([float(a[0]), float(b[0])])
    assert lo - 1e-4 <= float(mid[0]) <= hi + 1e-4


def test_wrap_modes():
    s = 4
    img = jnp.asarray(np.arange(s * s, dtype=np.float32).reshape(s, s, 1))
    strips = build_mip_strip(img)[None]
    # u slightly negative: REPEAT wraps to the right edge, CLAMP stays left.
    u = jnp.float32(-0.01)
    v = jnp.float32(0.5 / s)
    rep = sample_array_level(strips, jnp.int32(0), u, v, jnp.int32(0),
                             wrap=WRAP_REPEAT)
    cla = sample_array_level(strips, jnp.int32(0), u, v, jnp.int32(0),
                             wrap=WRAP_CLAMP)
    assert float(rep[0]) > float(cla[0])


def test_vsm_chebyshev():
    from granite_tpu.ops.shadow import vsm_moments, sample_directional_shadow, sample_vsm_shadow
    # Occluder plane at z=0.8 (reverse-Z, closer to light); receiver at
    # 0.3 behind it -> shadowed; receiver at 0.9 in front -> lit.
    size = 32
    depth = jnp.full((size, size), 0.8)
    moments = vsm_moments(depth)
    assert moments.shape == (size, size, 2)
    uv_mat = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32))
    behind = jnp.array([[[0.5, 0.5, 0.3]]])
    front = jnp.array([[[0.5, 0.5, 0.9]]])
    t_b = float(np.asarray(sample_vsm_shadow(moments, uv_mat, behind)))
    t_f = float(np.asarray(sample_vsm_shadow(moments, uv_mat, front)))
    assert t_b < 0.05
    assert t_f == 1.0
    # Outside the map -> lit.
    out = jnp.array([[[1.5, 0.5, 0.3]]])
    assert float(np.asarray(sample_vsm_shadow(moments, uv_mat, out))) == 1.0


def test_packed_strip_matches_mip_strip():
    """Patch-gather gutter sampling == classic strip sampling (REPEAT
    exact everywhere incl. borders; CLAMP exact too via start-clamp +
    frac-adjust)."""
    from granite_tpu.ops.texture import (
        build_packed_strip_np, sample_packed_level,
        sample_packed_trilinear,
    )
    rng = np.random.RandomState(3)
    img = rng.rand(16, 16, 4).astype(np.float32)
    strips_old = build_mip_strip(jnp.asarray(img))[None]
    g = jnp.asarray(build_packed_strip_np(img, dtype="float32"))[None]
    u = jnp.asarray(rng.rand(64).astype(np.float32) * 1.4 - 0.2)
    v = jnp.asarray(rng.rand(64).astype(np.float32) * 1.4 - 0.2)
    tid = jnp.zeros(64, jnp.int32)
    for wrap in (WRAP_REPEAT,):
        for lvl in (0, 1, 3):
            a = sample_array_level(strips_old, tid, u, v, jnp.int32(lvl),
                                   wrap=wrap)
            b = sample_packed_level(g, tid, u, v, jnp.int32(lvl), 4,
                                    wrap=wrap)
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6), \
                f"wrap={wrap} lvl={lvl}"
    lod = jnp.asarray(rng.rand(64).astype(np.float32) * 4.0)
    a = sample_array_trilinear(strips_old, tid, u, v, lod)
    b = sample_packed_trilinear(g, tid, u, v, lod, 4)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_packed_clamp_mode():
    from granite_tpu.ops.texture import (
        build_packed_strip_np, sample_packed_level,
    )
    rng = np.random.RandomState(4)
    img = rng.rand(8, 8, 4).astype(np.float32)
    strips_old = build_mip_strip(jnp.asarray(img))[None]
    g = jnp.asarray(build_packed_strip_np(img, wrap=WRAP_CLAMP,
                                          dtype="float32"))[None]
    u = jnp.asarray(np.linspace(-0.3, 1.3, 33).astype(np.float32))
    v = jnp.asarray(np.linspace(1.3, -0.3, 33).astype(np.float32))
    tid = jnp.zeros(33, jnp.int32)
    a = sample_array_level(strips_old, tid, u, v, jnp.int32(0),
                           wrap=WRAP_CLAMP)
    b = sample_packed_level(g, tid, u, v, jnp.int32(0), 4,
                            wrap=WRAP_CLAMP)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pcf_patch_matches_per_tap():
    """Patch-gather PCF == per-tap gather PCF away from map borders."""
    rng = np.random.RandomState(5)
    sm = jnp.asarray(rng.rand(64, 64).astype(np.float32))
    u = jnp.asarray(0.1 + 0.8 * rng.rand(128).astype(np.float32))
    v = jnp.asarray(0.1 + 0.8 * rng.rand(128).astype(np.float32))
    ref = jnp.asarray(rng.rand(128).astype(np.float32))

    def pcf_2x2_ref(shadow_map, u, v, ref_z, bias=1e-3):
        h, w = shadow_map.shape[:2]
        x = u * w - 0.5
        y = v * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        cmp_ = lambda s: (ref_z >= s - bias).astype(jnp.float32)
        c00 = cmp_(shadow_map[y0i, x0i])
        c10 = cmp_(shadow_map[y0i, x1i])
        c01 = cmp_(shadow_map[y1i, x0i])
        c11 = cmp_(shadow_map[y1i, x1i])
        top = c00 * (1 - fx) + c10 * fx
        bot = c01 * (1 - fx) + c11 * fx
        return top * (1 - fy) + bot * fy

    a = pcf_2x2(sm, u, v, ref)
    b = pcf_2x2_ref(sm, u, v, ref)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def pcf_wide_ref(shadow_map, u, v, ref_z, bias=1e-3):
        h, w = shadow_map.shape[:2]
        x = u * w - 0.5
        y = v * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        wfn = lambda t: jnp.exp2(-0.375 * t * t) * (1.0 - t * t / 9.0)
        acc = 0.0
        tw = 0.0
        for dy in range(-2, 4):
            wy = wfn(dy - fy)
            yi = jnp.clip(y0i + dy, 0, h - 1)
            for dx in range(-2, 4):
                wx = wfn(dx - fx)
                xi = jnp.clip(x0i + dx, 0, w - 1)
                acc = acc + wx * wy * (ref_z >= shadow_map[yi, xi]
                                       - bias).astype(jnp.float32)
                tw = tw + wx * wy
        return acc / tw

    a = pcf_wide(sm, u, v, ref)
    b = pcf_wide_ref(sm, u, v, ref)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_packed_lod_strip_matches_trilinear():
    """One-gather LOD strip (build_packed_lod_strip_np): exact at
    integer lods; within a coarse-tap tolerance of true trilinear at
    fractional lods (ops/texture.py gather-economics rationale)."""
    import numpy as np
    import jax.numpy as jnp
    from granite_tpu.ops.texture import (
        build_packed_lod_strip_np, build_packed_strip_np,
        sample_packed_lod, sample_packed_trilinear,
    )
    rng = np.random.RandomState(9)
    img = rng.rand(32, 32, 12).astype(np.float32)
    lod_strip = jnp.asarray(build_packed_lod_strip_np(img,
                                                      dtype="float32"))
    tri_strip = jnp.asarray(build_packed_strip_np(img, dtype="float32"))
    u = jnp.asarray(rng.rand(64).astype(np.float32))
    v = jnp.asarray(rng.rand(64).astype(np.float32))
    tid = jnp.zeros(64, jnp.int32)

    for lod_i in (0.0, 1.0, 2.0):
        a = sample_packed_lod(lod_strip[None], tid, u, v,
                              jnp.full(64, lod_i), 12)
        b = sample_packed_trilinear(tri_strip[None], tid, u, v,
                                    jnp.full(64, lod_i), 12)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5), lod_i

    a = sample_packed_lod(lod_strip[None], tid, u, v,
                          jnp.full(64, 0.5), 12)
    b = sample_packed_trilinear(tri_strip[None], tid, u, v,
                                jnp.full(64, 0.5), 12)
    # Coarse tap frozen to the fine texel grid: bounded approximation.
    err = np.abs(np.asarray(a) - np.asarray(b)).max()
    assert err < 0.15, err
    mean_err = np.abs(np.asarray(a) - np.asarray(b)).mean()
    assert mean_err < 0.03, mean_err


def test_material_textures_off_knob():
    """materialTextures=false: factor-only materials — finite frame,
    still lit/shadowed, visibly different from the textured render
    (the frame-ladder probe for the material rung)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from golden_utils import render_config
    cfg = {"renderer": "deferred", "hdrBloom": True,
           "shadowMapResolution": 64,
           "clusteredLightsShadowsResolution": 64}
    tex = np.asarray(render_config(cfg), np.float32)
    flat = np.asarray(render_config({**cfg, "materialTextures": False}),
                      np.float32)
    assert np.isfinite(flat).all()
    # Still a real render: non-black rgb planes.
    assert all(1.0 < m < 250.0 for m in flat[..., :3].mean((0, 1)))
    # And actually flat: differs from the textured frame.
    assert np.abs(tex[..., :3] - flat[..., :3]).mean() > 0.5
