"""FFT ocean simulation kernels (reference: renderer/ocean.cpp +
assets/shaders/ocean/generate_fft.comp).

Exact math ports:
  * Phillips-style spectrum (ocean.cpp:1420): |k_dir . wind|^2 *
    exp(-(k*max_l)^2) * exp(-1/(kL)^2) * k^-4, with L = |wind|^2 / g,
    amplitude normalized by sqrt(dkx*dky) (ocean.cpp:54-58).
  * Gaussian initial distribution h0(k) = N(0,1) * amp * sqrt(0.5*P(k)).
  * Time evolution (generate_fft.comp): dispersion w = sqrt(g|k|) rounded
    to the animation period; H(k,t) = h0(k) e^{iwt} + conj(h0(-k)) e^{-iwt}
    (Hermitian -> real height field).
  * Gradient variants: normal-gradient spectrum i*k*H packed two-for-one
    (real part = d/dx, imag = d/dy); displacement uses i*k/|k|*H.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

G = 9.81


def alias_freq(n: int) -> np.ndarray:
    """Signed frequency index per bin (ocean.cpp alias())."""
    x = np.arange(n)
    return np.where(x > n // 2, x - n, x).astype(np.float32)


def phillips(kx, ky, max_l: float, wind_dir, L: float):
    k_len = np.sqrt(kx * kx + ky * ky)
    # Clamp to the smallest nonzero |k| actually present so safe**-4
    # stays finite in float32 (1e-12**-4 overflows to inf -> inf*0 NaN
    # before the final mask); the DC bin is zeroed by the where anyway.
    nonzero = k_len[k_len > 0.0]
    floor = float(nonzero.min()) if nonzero.size else 1.0
    safe = np.maximum(k_len, floor)
    kw = (kx * wind_dir[0] + ky * wind_dir[1]) / safe
    kL = safe * L
    p = (kw * kw
         * np.exp(-(safe * max_l) ** 2)
         * np.exp(-1.0 / np.maximum(kL * kL, 1e-12))
         * safe ** -4.0)
    return np.where(k_len == 0.0, 0.0, p)


def generate_distribution(n: int, world_size, amplitude: float,
                          wind_velocity, max_l: float = 0.02,
                          seed: int = 0) -> np.ndarray:
    """h0(k): (N, N) complex64 initial spectrum (ocean.cpp:1460-1480)."""
    rng = np.random.RandomState(seed)
    wind_velocity = np.asarray(wind_velocity, np.float32)
    L = float(wind_velocity @ wind_velocity) / G
    wind_dir = wind_velocity / max(np.linalg.norm(wind_velocity), 1e-9)
    mod = 2.0 * np.pi / np.asarray(world_size, np.float32)
    # amplitude normalized by frequency-space density (ocean.cpp:58)
    amp = amplitude * np.sqrt(mod[0] * mod[1])
    fx = alias_freq(n) * mod[0]
    fy = alias_freq(n) * mod[1]
    kx, ky = np.meshgrid(fx, fy)
    p = phillips(kx, ky, max_l, wind_dir, L)
    dist = rng.normal(0, 1, (n, n, 2)).astype(np.float32)
    h0 = (dist[..., 0] + 1j * dist[..., 1]) * (amp * np.sqrt(0.5 * p))
    return h0.astype(np.complex64)


def _freq_grids(n: int, world_size):
    mod = 2.0 * np.pi / np.asarray(world_size, np.float32)
    fx = alias_freq(n) * mod[0]
    fy = alias_freq(n) * mod[1]
    kx, ky = np.meshgrid(fx, fy)
    k_len = np.sqrt(kx * kx + ky * ky)
    return (jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(k_len))


def evolve_spectrum(h0, kx, ky, k_len, t, period: float = 256.0):
    """H(k,t) with period-rounded dispersion (generate_fft.comp:80-90)."""
    w = jnp.sqrt(G * k_len)
    w = jnp.round(w * period) / period
    phase = w * t
    e = jnp.cos(phase) + 1j * jnp.sin(phase)
    # conj(h0(-k)): reverse indices modulo N in both axes.
    h0r = jnp.roll(jnp.flip(h0, axis=(0, 1)), shift=(1, 1), axis=(0, 1))
    return h0 * e + jnp.conj(h0r) * jnp.conj(e)


def ocean_maps(h0, kx, ky, k_len, t, period: float = 256.0):
    """One simulation step -> (height (N,N), disp_xy (N,N,2),
    grad_xy (N,N,2)) real fields via three 2D IFFTs (the reference's
    height/displacement/normal FFT trio, ocean.cpp:697)."""
    H = evolve_spectrum(h0, kx, ky, k_len, t, period)
    n2 = H.shape[0] * H.shape[1]
    height = jnp.real(jnp.fft.ifft2(H)) * n2

    ik = 1j * (kx + 1j * ky)
    grad = jnp.fft.ifft2(ik * H) * n2
    grad_xy = jnp.stack([jnp.real(grad), jnp.imag(grad)], axis=-1)

    k_safe = jnp.maximum(k_len, 1e-5)
    disp = jnp.fft.ifft2(ik / k_safe * H) * n2
    disp_xy = jnp.stack([jnp.real(disp), jnp.imag(disp)], axis=-1)
    return height, disp_xy, grad_xy


def sample_heightfield(height, disp_xy, grad_xy, u, v, lambda_disp: float):
    """Bilinear-sample the periodic ocean maps at normalized (u, v).
    Returns (dx, dy_height, dz, normal) pieces for vertex displacement."""
    from .texture import sample_level
    n = height.shape[0]
    stack = jnp.concatenate([
        height[..., None], disp_xy, grad_xy], axis=-1)[None]  # (1,N,N,5)
    s = sample_level(stack, u, v, jnp.int32(0), wrap=0)
    h = s[..., 0]
    dx = -lambda_disp * s[..., 1]
    dz = -lambda_disp * s[..., 2]
    grad = s[..., 3:5]
    return h, dx, dz, grad
