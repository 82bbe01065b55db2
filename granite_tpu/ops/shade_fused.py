"""Fused Pallas shade kernel — the deferred lighting pass in ONE pass.

Reference: assets/shaders/lights/lighting.h compute_lighting +
clusterer.h compute_cluster_light + pbr.h BRDF terms.  The XLA lighting
expression (ops/pbr.compute_lighting + clusterer.shade_clustered + SH/
IBL combine) is ~40 elementwise stages whose intermediates round-trip
HBM between fusions, plus per-pixel z/tile cluster-mask lookups.  This
kernel computes the WHOLE shade expression per 32x128 tile in VMEM:

  * G-buffer + precomputed gather products (shadow term, specular env,
    background, irradiance, top-K cluster-shadow terms) ride in as ONE
    stacked (P, H, W) plane array — one BlockSpec, zero per-pixel
    gathers;
  * the light table and uniforms are VMEM-resident;
  * cluster culling is branch + compare based: the per-tile mask-word
    union skips whole lights (scalar pl.when), the per-light z check is
    a view-depth interval compare derived from the SAME slice bins as
    bin_lights_z (no per-pixel log, no mask lookups), and the 64-px
    tile-mask word resolves to a per-pixel lane select;
  * gather-bound inputs (PCF/VSM shadow fetch, env tile sampling, top-K
    shadow atlas) stay OUTSIDE in their existing one-gather forms.

Math is transcribed 1:1 from ops/pbr.py / ops/clusterer.py (Granite's
PI = 3.1415628 kept for parity); tests/test_shade_fused.py locks this
kernel against the classic shade_surface path numerically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pbr import PI

TILE_H = 32
TILE_W = 128

# Stacked plane indices.
P_BASE = 0        # 3
P_NRM = 3         # 3
P_METAL = 6
P_ROUGH = 7
P_POS = 8         # 3
P_EMISSIVE = 11   # 3
P_COVERED = 14
P_SHADOW = 15
P_SPECENV = 16    # 3 (env fresnel applied in-kernel)
P_BACKGROUND = 19  # 3
P_AO = 22
P_IRR = 23        # 3: diffuse irradiance (SH/pi or volumetric GI)
P_FIXED = 26      # cluster-shadow slot/term planes follow (2k)

# Light-table columns (one 128-lane row per light).
LC_POS = 0        # 3
LC_COLOR = 3      # 3
LC_INVR = 6
LC_DIR = 7        # 3
LC_SPOT_SCALE = 10
LC_SPOT_BIAS = 11
LC_IS_SPOT = 12
LC_ZLO = 13       # view-depth window equivalent to the z-slice bins
LC_ZHI = 14

# Uniform rows (8, 128 f32).
U_MISC = 0        # cam(0:3) sun_dir(3:6) n_lights(6) view_row2(9:13)
U_SUN_COLOR = 1   # 0:3


def _shade_kernel(planes, lights, tmasks, uni, out,
                  acc_r, acc_g, acc_b,
                  *, tiles_x: int, n_light_cap: int, k_shadow: int,
                  has_env: bool, has_lights: bool, has_ao: bool,
                  ambient: bool):
    tile = pl.program_id(0)
    ty = tile // tiles_x
    tx = tile % tiles_x

    def p1(i):
        return planes[i]

    def p3(i):
        return planes[i], planes[i + 1], planes[i + 2]

    def dot3(ax, ay, az, bx, by, bz):
        return ax * bx + ay * by + az * bz

    def rsqrt_pos(x, eps):
        return jax.lax.rsqrt(jnp.maximum(x, eps))

    cam_x = uni[U_MISC, 0]
    cam_y = uni[U_MISC, 1]
    cam_z = uni[U_MISC, 2]

    bx, by, bz = p3(P_BASE)
    nx, ny, nz = p3(P_NRM)
    metal = p1(P_METAL)
    rough_raw = p1(P_ROUGH)          # IBL fresnel uses the RAW value
    rough = rough_raw * 0.75 + 0.25  # BRDF remap (lighting.h)
    px_, py_, pz_ = p3(P_POS)

    vx = cam_x - px_
    vy = cam_y - py_
    vz_ = cam_z - pz_
    vinv = rsqrt_pos(dot3(vx, vy, vz_, vx, vy, vz_), 1e-20)
    vx = vx * vinv
    vy = vy * vinv
    vz_ = vz_ * vinv
    nov = jnp.clip(dot3(nx, ny, nz, vx, vy, vz_), 1e-3, 1.0)

    f0r = 0.04 + (bx - 0.04) * metal
    f0g = 0.04 + (by - 0.04) * metal
    f0b = 0.04 + (bz - 0.04) * metal
    one_m_metal = 1.0 - metal

    m = rough * rough
    m2 = m * m
    r1 = rough + 1.0
    k_g = r1 * r1 * 0.125
    one_m_kg = 1.0 - k_g
    gv = nov * one_m_kg + k_g

    def cook_torrance(lx, ly, lz, cr, cg, cb, sterm):
        """One light's full response (lighting.h compute_lighting /
        clusterer.h per-light body — identical BRDF)."""
        hx = lx + vx
        hy = ly + vy
        hz = lz + vz_
        hinv = rsqrt_pos(dot3(hx, hy, hz, hx, hy, hz), 1e-20)
        hx = hx * hinv
        hy = hy * hinv
        hz = hz * hinv
        nol = jnp.clip(dot3(nx, ny, nz, lx, ly, lz), 1e-3, 1.0)
        hov = jnp.clip(dot3(hx, hy, hz, vx, vy, vz_), 1e-3, 1.0)
        t = 1.0 - hov
        t2 = t * t
        t5 = t2 * t2 * t
        fr = f0r + (1.0 - f0r) * t5
        fg = f0g + (1.0 - f0g) * t5
        fb = f0b + (1.0 - f0b) * t5
        noh = jnp.clip(dot3(nx, ny, nz, hx, hy, hz), 1e-4, 1.0)
        dd = (noh * m2 - noh) * noh + 1.0
        d = m2 / (PI * dd * dd)
        gl = nol * one_m_kg + k_g
        g = 0.25 / jnp.maximum(gv * gl, 1e-3)
        dg = d * g
        tr = cr * (nol * sterm)
        tg = cg * (nol * sterm)
        tb = cb * (nol * sterm)
        inv_pi = 1.0 / PI
        dr = (1.0 - fr) * inv_pi * bx * one_m_metal
        dgn = (1.0 - fg) * inv_pi * by * one_m_metal
        db = (1.0 - fb) * inv_pi * bz * one_m_metal
        return (tr * (fr * dg + dr), tg * (fg * dg + dgn),
                tb * (fb * dg + db))

    # ---- sun -------------------------------------------------------------
    shadow = p1(P_SHADOW)
    sr, sg, sb = cook_torrance(
        uni[U_MISC, 3], uni[U_MISC, 4], uni[U_MISC, 5],
        uni[U_SUN_COLOR, 0], uni[U_SUN_COLOR, 1], uni[U_SUN_COLOR, 2],
        shadow)

    ao = p1(P_AO) if has_ao else 1.0
    if ambient:
        amb = 0.05 * one_m_metal * ao
        sr = sr + bx * amb
        sg = sg + by * amb
        sb = sb + bz * amb

    # ---- environment / GI (diffuse irradiance + specular IBL) -----------
    if has_env:
        ir, ig, ib = p3(P_IRR)       # wrapper pre-applies the /pi or GI
        diff = one_m_metal * ao
        sr = sr + ir * bx * diff
        sg = sg + ig * by * diff
        sb = sb + ib * bz * diff
        nov_env = jnp.clip(dot3(nx, ny, nz, vx, vy, vz_), 0.0, 1.0)
        t = 1.0 - nov_env
        t2 = t * t
        t5 = t2 * t2 * t
        one_m_rough = 1.0 - rough_raw
        er = f0r + (jnp.maximum(one_m_rough, f0r) - f0r) * t5
        eg = f0g + (jnp.maximum(one_m_rough, f0g) - f0g) * t5
        eb = f0b + (jnp.maximum(one_m_rough, f0b) - f0b) * t5
        ex, ey, ez = p3(P_SPECENV)
        sr = sr + ex * er * ao
        sg = sg + ey * eg * ao
        sb = sb + ez * eb * ao

    # ---- clustered positional lights -------------------------------------
    if has_lights:
        acc_r[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        acc_g[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        acc_b[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        v20 = uni[U_MISC, 9]
        v21 = uni[U_MISC, 10]
        v22 = uni[U_MISC, 11]
        v23 = uni[U_MISC, 12]
        pvz = -(px_ * v20 + py_ * v21 + pz_ * v22 + v23)
        # mask tiles are 64 px: kernel tile rows (32 px) map 2:1, kernel
        # tile cols (128 px) map 1:2.
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
        w0 = tmasks[ty // 2, tx * 2]
        w1 = tmasks[ty // 2, tx * 2 + 1]
        wsel = jnp.where(lane < 64, w0, w1)
        w_union = w0 | w1
        n_lights = uni[U_MISC, 6].astype(jnp.int32)

        for i in range(n_light_cap):
            # two's-complement int32 with bit (i%32) set (1<<31 would
            # overflow a direct int32 construction)
            bit = jnp.int32(np.uint32(1 << (i % 32)).astype(np.int32))

            @pl.when(((w_union & bit) != 0) & (i < n_lights))
            def _(i=i, bit=bit):
                fx = px_ - lights[i, LC_POS]
                fy = py_ - lights[i, LC_POS + 1]
                fz = pz_ - lights[i, LC_POS + 2]
                d2 = jnp.maximum(dot3(fx, fy, fz, fx, fy, fz), 1e-12)
                dist = jnp.maximum(jnp.sqrt(d2), 0.1)  # MIN_POINT_DIST
                inv_d = 1.0 / dist
                lx = -fx * inv_d
                ly = -fy * inv_d
                lz = -fz * inv_d
                x = dist * lights[i, LC_INVR]
                tt = jnp.clip((x - 0.9) * 10.0, 0.0, 1.0)
                static_fall = 1.0 - tt * tt * (3.0 - 2.0 * tt)
                cone = jnp.clip(
                    -(lx * lights[i, LC_DIR]
                      + ly * lights[i, LC_DIR + 1]
                      + lz * lights[i, LC_DIR + 2])
                    * lights[i, LC_SPOT_SCALE]
                    + lights[i, LC_SPOT_BIAS], 0.0, 1.0)
                cone = cone * cone
                fall = jnp.where(lights[i, LC_IS_SPOT] > 0.5,
                                 cone, 1.0) * static_fall
                att = fall / (dist * dist)
                cr = lights[i, LC_COLOR] * att
                cg = lights[i, LC_COLOR + 1] * att
                cb = lights[i, LC_COLOR + 2] * att
                sterm = jnp.ones((TILE_H, TILE_W), jnp.float32)
                for j in range(k_shadow):
                    sterm = jnp.where(
                        planes[P_FIXED + j] == jnp.float32(i),
                        planes[P_FIXED + k_shadow + j], sterm)
                rr, rg, rb = cook_torrance(lx, ly, lz, cr, cg, cb,
                                           sterm)
                active = ((wsel & bit) != 0) \
                    & (pvz >= lights[i, LC_ZLO]) \
                    & (pvz < lights[i, LC_ZHI])
                acc_r[:] = acc_r[:] + jnp.where(active, rr, 0.0)
                acc_g[:] = acc_g[:] + jnp.where(active, rg, 0.0)
                acc_b[:] = acc_b[:] + jnp.where(active, rb, 0.0)

        sr = sr + acc_r[:]
        sg = sg + acc_g[:]
        sb = sb + acc_b[:]

    # ---- emissive + background select ------------------------------------
    emr, emg, emb = p3(P_EMISSIVE)
    sr = sr + emr
    sg = sg + emg
    sb = sb + emb
    cov = p1(P_COVERED) > 0.5
    bgx, bgy, bgz = p3(P_BACKGROUND)
    out[0] = jnp.where(cov, sr, bgx)
    out[1] = jnp.where(cov, sg, bgy)
    out[2] = jnp.where(cov, sb, bgz)


def fused_light_table(lights, view, z_near: float, z_far: float,
                      z_slices: int) -> jax.Array:
    """(L, 128) f32 light table with LC_* columns; zlo/zhi replicate the
    z-slice quantization of bin_lights_z exactly in view-depth space."""
    L = lights.pos.shape[0]
    log_ratio = np.log(z_far / z_near)
    vz = -(lights.pos @ view[2, :3].T + view[2, 3])
    r = 1.0 / jnp.maximum(lights.inv_radius, 1e-12)
    z0 = jnp.maximum(vz - r, z_near)
    z1 = jnp.maximum(vz + r, z_near)
    s0 = jnp.clip(jnp.floor(jnp.log(z0 / z_near) / log_ratio * z_slices),
                  0, z_slices - 1)
    s1 = jnp.clip(jnp.ceil(jnp.log(z1 / z_near) / log_ratio * z_slices),
                  0, z_slices)
    # s >= s0  <=>  vz >= zn*exp(lr*s0/S)   (s0 == 0 -> always)
    zlo = jnp.where(s0 <= 0, 0.0,
                    z_near * jnp.exp(log_ratio * s0 / z_slices))
    # s < s1   <=>  vz < zn*exp(lr*s1/S)    (s1 >= S -> always, since s
    # is clipped to S-1)
    zhi = jnp.where(s1 >= z_slices, jnp.inf,
                    z_near * jnp.exp(log_ratio * s1 / z_slices))
    alive = (jnp.arange(L) < lights.count) & (vz + r > z_near)
    zlo = jnp.where(alive, zlo, jnp.inf)
    zhi = jnp.where(alive, zhi, -jnp.inf)
    tbl = jnp.zeros((L, 128), jnp.float32)
    tbl = tbl.at[:, LC_POS:LC_POS + 3].set(lights.pos)
    tbl = tbl.at[:, LC_COLOR:LC_COLOR + 3].set(lights.color)
    tbl = tbl.at[:, LC_INVR].set(lights.inv_radius)
    tbl = tbl.at[:, LC_DIR:LC_DIR + 3].set(lights.dir)
    tbl = tbl.at[:, LC_SPOT_SCALE].set(lights.spot_scale_bias[:, 0])
    tbl = tbl.at[:, LC_SPOT_BIAS].set(lights.spot_scale_bias[:, 1])
    tbl = tbl.at[:, LC_IS_SPOT].set(lights.is_spot)
    tbl = tbl.at[:, LC_ZLO].set(zlo)
    tbl = tbl.at[:, LC_ZHI].set(zhi)
    return tbl


def shade_planes_fused(planes, lights_tbl, tile_masks, uniforms,
                       height: int, width: int, *, k_shadow: int,
                       has_env: bool, has_lights: bool, has_ao: bool,
                       ambient: bool, interpret: bool | None = None):
    """Run the kernel over padded (P, ph, pw) planes -> (3, H, W)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ph = -(-height // TILE_H) * TILE_H
    pw = -(-width // TILE_W) * TILE_W
    P = planes.shape[0]
    tx = pw // TILE_W
    ty = ph // TILE_H
    n_light_cap = lights_tbl.shape[0]
    assert n_light_cap <= 32, "one tile-mask word per 64-px tile"
    # SMEM blocks want sublane-divisible rows (tile_sampler lesson).
    if tile_masks.shape[0] % 8:
        tile_masks = jnp.pad(
            tile_masks, ((0, 8 - tile_masks.shape[0] % 8), (0, 0)))
    kern = functools.partial(
        _shade_kernel, tiles_x=tx, n_light_cap=n_light_cap,
        k_shadow=k_shadow, has_env=has_env, has_lights=has_lights,
        has_ao=has_ao, ambient=ambient)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(tx * ty,),
        in_specs=[
            pl.BlockSpec((P, TILE_H, TILE_W),
                         lambda i: (0, i // (pw // TILE_W),
                                    i % (pw // TILE_W)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lights_tbl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            # Dynamic per-tile scalar reads (tmasks[ty//2, tx*2]) must
            # come from SMEM on Mosaic (the tile_sampler info-table
            # lesson); the table is tiny (<=0.5K words at 1080p).
            pl.BlockSpec(tile_masks.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(uniforms.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, TILE_H, TILE_W),
            lambda i: (0, i // (pw // TILE_W), i % (pw // TILE_W)),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, ph, pw), jnp.float32),
        interpret=interpret,
    )(planes, lights_tbl, tile_masks, uniforms)
    return out[:, :height, :width]
