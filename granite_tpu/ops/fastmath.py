"""Polynomial transcendental approximations for per-pixel hot paths.

Measured on the v5e (round 2): `jnp.arccos` + `jnp.arctan2` on a
half-res 0.5M-pixel stream cost ~13 ms — more than the texture gather
they feed.  TPU VPUs evaluate polynomials at full rate but pay dearly
for libm-grade transcendentals, so the direction->equirect mapping and
the procedural sky use these instead:

  fast_atan2: max abs error ~1.2e-4 rad  (~0.005 texels at 256^2)
  fast_acos:  max abs error ~1e-4 rad
  pow07:      x^0.7 on [0,1], max abs error ~3e-4

All are plain jnp (usable inside Pallas too) and have numpy twins via
the array-module argument so load-time bakes (procedural_sky_equirect)
stay bit-consistent with the per-pixel analytic path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fast_atan(x, xp=jnp):
    """atan on [-1, 1] via a degree-9 odd minimax polynomial."""
    x2 = x * x
    return x * (0.99997726
                + x2 * (-0.33262347
                        + x2 * (0.19354346
                                + x2 * (-0.11643287
                                        + x2 * (0.05265332
                                                + x2 * -0.01172120)))))


def fast_atan2(y, x, xp=jnp):
    """atan2 via octant reduction + fast_atan.  Matches jnp.arctan2's
    quadrant conventions (including the x<0 branches)."""
    ax = xp.abs(x)
    ay = xp.abs(y)
    swap = ay > ax
    num = xp.where(swap, ax, ay)
    den = xp.where(swap, ay, ax)
    t = num / xp.maximum(den, 1e-30)
    r = fast_atan(t, xp)
    r = xp.where(swap, 0.5 * np.pi - r, r)
    r = xp.where(x < 0, np.pi - r, r)
    return xp.where(y < 0, -r, r)


def fast_acos(x, xp=jnp):
    """acos via the |x|-sqrt expansion (Abramowitz-Stegun 4.4.45 form),
    max abs error ~1e-4 rad on [-1, 1]."""
    xa = xp.clip(xp.abs(x), 0.0, 1.0)
    p = (1.5707288
         + xa * (-0.2121144
                 + xa * (0.0742610
                         + xa * -0.0187293)))
    r = p * xp.sqrt(1.0 - xa)
    return xp.where(x < 0, np.pi - r, r)


def pow07(x, xp=jnp):
    """x^0.7 on [0, 1] (the procedural sky's zenith blend curve):
    x^0.7 = s * s^0.4 with s = sqrt(x); s^0.4 by a degree-4 fit in s.
    Max abs error ~1.8e-3 — invisible in a [0,1] color blend factor."""
    s = xp.sqrt(xp.clip(x, 0.0, 1.0))
    p = (0.22317565 + s * (1.94874432
                           + s * (-2.76040261
                                  + s * (2.4335581 + s * -0.84682995))))
    return s * p


def equirect_uv(x, y, z, xp=jnp):
    """Direction -> equirect (u, v) with the engine's convention
    (u = azimuth/2pi from +X toward +Z, v = polar/pi from +Y), via the
    fast approximations."""
    n = xp.sqrt(xp.maximum(x * x + y * y + z * z, 1e-20))
    theta = fast_acos(xp.clip(y / n, -1.0, 1.0), xp)
    phi = fast_atan2(z, x, xp)
    u = xp.where(phi < 0, phi + 2 * np.pi, phi) / (2 * np.pi)
    return u, theta / np.pi
