"""PBR lighting kernels — exact port of the reference BRDF math.

Reference shaders: assets/shaders/lights/pbr.h (D_GGX, G_schlick, fresnel,
compute_F0) and lights/lighting.h compute_lighting.  The constants and
clamps are reproduced exactly (including Granite's PI = 3.1415628 and the
roughness remap r*0.75+0.25) because the driver gate is per-pixel RMSE vs
the reference's output.

All functions are elementwise over (..., 3) arrays — XLA fuses the whole
lighting expression into the shading kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.1415628  # Granite's value (pbr.h) — kept verbatim for parity.


def d_ggx(roughness, n_dot_h):
    noh = jnp.clip(n_dot_h, 1e-4, 1.0)
    m = roughness * roughness
    m2 = m * m
    d = (noh * m2 - noh) * noh + 1.0
    return m2 / (PI * d * d)


def g_schlick(roughness, nov, nol):
    r = roughness + 1.0
    k = r * r * (1.0 / 8.0)
    v = nov * (1.0 - k) + k
    l = nol * (1.0 - k) + k
    return 0.25 / jnp.maximum(v * l, 1e-3)  # 1/(4 NoV NoL) folded in


def fresnel(f0, h_dot_v):
    return f0 + (1.0 - f0) * (1.0 - h_dot_v)[..., None] ** 5


def fresnel_ibl(f0, cos_theta, roughness):
    return f0 + (jnp.maximum(1.0 - roughness[..., None], f0) - f0) * \
        (1.0 - cos_theta)[..., None] ** 5


def compute_f0(base_color, metallic):
    return 0.04 + (base_color - 0.04) * metallic[..., None]


def _dot(a, b):
    return (a * b).sum(-1)


def _normalize(v, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(_dot(v, v), eps))[..., None]


def compute_lighting(base_color, normal, metallic, roughness_in,
                     ambient_factor, world_pos, camera_pos, light_dir,
                     light_color, shadow_term=1.0, ambient: bool = True):
    """lighting.h compute_lighting: directional light + flat ambient.

    base_color (..., 3) linear; normal (..., 3) unit; metallic/roughness
    (...,); world_pos (..., 3); camera_pos (3,); light_dir (3,) pointing
    FROM surface TOWARD light; shadow_term (...,).
    """
    roughness = roughness_in * 0.75 + 0.25

    L = jnp.broadcast_to(light_dir, normal.shape)
    V = _normalize(camera_pos - world_pos)
    H = _normalize(V + L)
    N = normal

    nov = jnp.clip(_dot(N, V), 1e-3, 1.0)
    nol = jnp.clip(_dot(N, L), 1e-3, 1.0)
    hov = jnp.clip(_dot(H, V), 1e-3, 1.0)

    f0 = compute_f0(base_color, metallic)
    spec_fresnel = fresnel(f0, hov)
    d = d_ggx(roughness, _dot(N, H))
    g = g_schlick(roughness, nov, nol)
    term = (light_color * (nol * shadow_term)[..., None])
    specref = term * spec_fresnel * (g * d)[..., None]
    diffref = term * (1.0 - spec_fresnel) * (1.0 / PI)

    lighting = specref + diffref * base_color * (1.0 - metallic[..., None])
    if ambient:
        lighting = lighting + base_color * (
            0.05 * (1.0 - metallic) * ambient_factor)[..., None]
    return lighting
