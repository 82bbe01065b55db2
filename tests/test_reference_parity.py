"""Formula-level parity vs the Vulkan reference's shader math.

The cross-engine image RMSE gate cannot run here (no Vulkan ICD, empty
reference submodules, zero egress — see docs/ref_build/README.md), so
this file is the stand-in: each test transcribes the reference GLSL
formula INDEPENDENTLY in numpy (fresh transcription, not an import of
the engine's own ops) and asserts the engine's kernel matches it.
Citations give the exact reference file:line transcribed.
"""

import jax.numpy as jnp
import numpy as np


def _rand(shape, lo=0.0, hi=1.0, seed=0):
    rng = np.random.RandomState(seed)
    return (lo + (hi - lo) * rng.rand(*shape)).astype(np.float32)


REF_PI = 3.1415628  # assets/shaders/lights/pbr.h:5 (sic)


# --------------------------------------------------------------------------
# pbr.h
# --------------------------------------------------------------------------

def _ref_d_ggx(roughness, noh):
    # pbr.h:8-15 (the #if 1 branch)
    noh = np.clip(noh, 0.0001, 1.0)
    m = roughness * roughness
    m2 = m * m
    d = (noh * m2 - noh) * noh + 1.0
    return m2 / (REF_PI * d * d)


def _ref_g_schlick(roughness, nov, nol):
    # pbr.h:28-35
    r = roughness + 1.0
    k = r * r / 8.0
    V = nov * (1.0 - k) + k
    L = nol * (1.0 - k) + k
    return 0.25 / np.maximum(V * L, 0.001)


def _ref_fresnel(f0, hov):
    # pbr.h:44-47: mix(F0, vec3(1.0), pow(1-HoV, 5))
    t = (1.0 - hov) ** 5
    return f0 * (1.0 - t[..., None]) + t[..., None]


def _ref_fresnel_ibl(f0, cos_theta, roughness):
    # pbr.h:49-52
    return f0 + (np.maximum(1.0 - roughness[..., None], f0) - f0) \
        * ((1.0 - cos_theta) ** 5)[..., None]


def _ref_compute_f0(base, metallic):
    # pbr.h:54-57: mix(vec3(0.04), base_color, metallic)
    return 0.04 * (1.0 - metallic[..., None]) + base * metallic[..., None]


def test_d_ggx_matches_reference():
    from granite_tpu.ops.pbr import d_ggx
    r = _rand((256,), 0.0, 1.0, 1)
    noh = _rand((256,), -0.2, 1.0, 2)
    got = np.asarray(d_ggx(jnp.asarray(r), jnp.asarray(noh)))
    want = _ref_d_ggx(r, noh)
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6)


def test_g_schlick_matches_reference():
    from granite_tpu.ops.pbr import g_schlick
    r = _rand((256,), 0.0, 1.0, 3)
    nov = _rand((256,), 0.001, 1.0, 4)
    nol = _rand((256,), 0.001, 1.0, 5)
    got = np.asarray(g_schlick(jnp.asarray(r), jnp.asarray(nov),
                               jnp.asarray(nol)))
    assert np.allclose(got, _ref_g_schlick(r, nov, nol), rtol=1e-5)


def test_fresnel_matches_reference():
    from granite_tpu.ops.pbr import fresnel, fresnel_ibl
    f0 = _rand((64, 3), 0.0, 1.0, 6)
    hov = _rand((64,), 0.0, 1.0, 7)
    rough = _rand((64,), 0.0, 1.0, 8)
    assert np.allclose(np.asarray(fresnel(jnp.asarray(f0),
                                          jnp.asarray(hov))),
                       _ref_fresnel(f0, hov), rtol=1e-5, atol=1e-6)
    assert np.allclose(
        np.asarray(fresnel_ibl(jnp.asarray(f0), jnp.asarray(hov),
                               jnp.asarray(rough))),
        _ref_fresnel_ibl(f0, hov, rough), rtol=1e-5, atol=1e-6)


def test_compute_f0_matches_reference():
    from granite_tpu.ops.pbr import compute_f0
    base = _rand((64, 3), 0.0, 1.0, 9)
    metal = _rand((64,), 0.0, 1.0, 10)
    assert np.allclose(
        np.asarray(compute_f0(jnp.asarray(base), jnp.asarray(metal))),
        _ref_compute_f0(base, metal), rtol=1e-5, atol=1e-7)


def test_compute_lighting_directional_matches_reference():
    """lighting.h:26-47 + 66 (flat-ambient branch), full directional
    term, transcribed straight from the GLSL."""
    from granite_tpu.ops.pbr import compute_lighting
    n = 128
    base = _rand((n, 3), 0.0, 1.0, 11)
    normal = _rand((n, 3), -1.0, 1.0, 12)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    metal = _rand((n,), 0.0, 1.0, 13)
    rough_in = _rand((n,), 0.0, 1.0, 14)
    wpos = _rand((n, 3), -5.0, 5.0, 15)
    cam = np.array([1.0, 2.0, 3.0], np.float32)
    ldir = np.array([0.3, 0.8, 0.5], np.float32)
    ldir /= np.linalg.norm(ldir)
    lcol = np.array([3.0, 2.8, 2.5], np.float32)
    shadow = _rand((n,), 0.0, 1.0, 16)
    ambf = _rand((n,), 0.0, 1.0, 17)

    # ---- reference transcription (lighting.h) ----
    roughness = rough_in * 0.75 + 0.25              # lighting.h:26
    L = np.broadcast_to(ldir, (n, 3))
    V = cam - wpos
    V = V / np.linalg.norm(V, axis=-1, keepdims=True)
    H = V + L
    H = H / np.linalg.norm(H, axis=-1, keepdims=True)
    N = normal
    nov = np.clip((N * V).sum(-1), 0.001, 1.0)
    nol = np.clip((N * L).sum(-1), 0.001, 1.0)
    hov = np.clip((H * V).sum(-1), 0.001, 1.0)
    f0 = _ref_compute_f0(base, metal)
    sf = _ref_fresnel(f0, hov)
    ct = sf * (_ref_g_schlick(roughness, nov, nol)
               * _ref_d_ggx(roughness, (N * H).sum(-1)))[..., None]
    specref = lcol * (nol * shadow)[..., None] * ct
    diffref = lcol * (nol * shadow)[..., None] * (1.0 - sf) / REF_PI
    want = specref + diffref * base * (1.0 - metal[..., None])
    want = want + base * (0.05 * (1.0 - metal) * ambf)[..., None]

    got = np.asarray(compute_lighting(
        jnp.asarray(base), jnp.asarray(normal), jnp.asarray(metal),
        jnp.asarray(rough_in), jnp.asarray(ambf), jnp.asarray(wpos),
        jnp.asarray(cam), jnp.asarray(ldir), jnp.asarray(lcol),
        shadow_term=jnp.asarray(shadow)))
    assert np.allclose(got, want, rtol=2e-4, atol=1e-5)


# --------------------------------------------------------------------------
# post/tonemap.frag
# --------------------------------------------------------------------------

def test_filmic_tonemap_matches_reference():
    """tonemap.frag:24-47 Uncharted2 curve + white scale."""
    from granite_tpu.ops.hdr import tonemap_filmic
    A, B, C, D, E, F, W = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30, 11.2

    def u2(x):
        return ((x * (A * x + C * B) + D * E)
                / (x * (A * x + B) + D * F)) - E / F

    x = _rand((512, 3), 0.0, 20.0, 20)
    want = u2(x) * (1.0 / u2(W))
    got = np.asarray(tonemap_filmic(jnp.asarray(x)))
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# lights/pcf.h
# --------------------------------------------------------------------------

def test_pcf_kernel_weight_matches_reference():
    """pcf.h:12-21: exp2(-0.375 x^2) * (1 - x^2 / 9)."""
    from granite_tpu.ops.shadow import _pcf_kernel_weight
    x = _rand((512,), -3.0, 3.0, 21)
    want = np.exp2(-0.375 * x * x) * (1.0 - x * x / 9.0)
    got = np.asarray(_pcf_kernel_weight(jnp.asarray(x)))
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# lights/vsm.h
# --------------------------------------------------------------------------

def test_vsm_term_matches_reference():
    """vsm.h:6-17 Chebyshev + light-leak clamp.  The reference stores
    forward-from-light depth (occluded when depth > mean); our maps are
    reverse-Z (occluded when depth < mean) — the term formula is
    identical under d -> -d, which squares away."""
    from granite_tpu.ops.shadow import _vsm_term
    depth = _rand((512,), 0.0, 1.0, 22)
    m1 = _rand((512,), 0.0, 1.0, 23)
    m2 = m1 * m1 + _rand((512,), 0.0, 0.05, 24)

    variance = np.maximum(m2 - m1 * m1, 1e-5)
    d = m1 - depth
    t = variance / (variance + d * d)
    t = np.clip((t - 0.25) / 0.75, 0.0, 1.0)
    want = np.where(depth < m1, t, 1.0)       # reverse-Z flip of :9

    got = np.asarray(_vsm_term(jnp.asarray(depth), jnp.asarray(m1),
                               jnp.asarray(m2)))
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# inc/srgb.h
# --------------------------------------------------------------------------

def test_srgb_encode_decode_match_reference():
    """inc/srgb.h:4-18."""
    from granite_tpu.ops.srgb import linear_to_srgb, srgb_to_linear
    x = np.linspace(0.0, 1.0, 1024, dtype=np.float32)

    enc_want = np.clip(np.where(x <= 0.0031308, x * 12.92,
                                1.055 * x ** (1 / 2.4) - 0.055), 0.0, 1.0)
    got = np.asarray(linear_to_srgb(jnp.asarray(x)))
    assert np.allclose(np.clip(got, 0, 1), enc_want, atol=2e-6)

    # decode threshold: the reference uses 0.0404482362771082, ours
    # 0.04045 — no float32 in [0,1] quantized from u8 falls between, and
    # the curve is continuous at the joint, so the curves agree to atol.
    dec_want = np.clip(np.where(x <= 0.0404482362771082, x / 12.92,
                                ((x + 0.055) / 1.055) ** 2.4), 0.0, 1.0)
    got_d = np.asarray(srgb_to_linear(jnp.asarray(x)))
    assert np.allclose(np.clip(got_d, 0, 1), dec_want, atol=2e-6)


# --------------------------------------------------------------------------
# lights/clusterer.h point/spot falloff (point.h:33, spot.h:33)
# --------------------------------------------------------------------------

def test_positional_light_falloff_matches_reference():
    """point.h/spot.h: static falloff 1 - smoothstep(0.9, 1.0, d/r),
    inverse-square, spot cone (cos scale/bias, squared)."""
    from granite_tpu.ops.clusterer import pack_lights, \
        positional_light_color
    pos = np.array([[0.0, 2.0, 0.0]], np.float32)
    col = np.array([[5.0, 4.0, 3.0]], np.float32)
    radius = np.array([4.0], np.float32)
    lights = pack_lights(pos, col, radius, capacity=4)
    wp = _rand((64, 3), -3.0, 3.0, 25)
    color, ldir = positional_light_color(lights, 0, jnp.asarray(wp))

    full = wp - pos[0]
    dist = np.maximum(np.linalg.norm(full, axis=-1), 0.1)
    x = dist / radius[0]
    t = np.clip((x - 0.9) / 0.1, 0.0, 1.0)
    falloff = 1.0 - t * t * (3.0 - 2.0 * t)
    want = col[0] * (falloff / (dist * dist))[..., None]
    assert np.allclose(np.asarray(color), want, rtol=1e-4, atol=1e-6)
    want_dir = -full / np.maximum(
        np.linalg.norm(full, axis=-1, keepdims=True), 0.1)
    # direction normalization clamps dist at MIN_POINT_DIST like the ref
    nd = np.asarray(ldir)
    close = dist <= 0.100001
    assert np.allclose(nd[~close], want_dir[~close], rtol=1e-4, atol=1e-5)
