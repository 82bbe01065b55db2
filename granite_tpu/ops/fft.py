"""FFT module (reference: renderer/fft/fft.{hpp,cpp} — a GLFFT-derived
Vulkan compute FFT with 1D/2D/3D, C2C/R2C/C2R, FP16/FP32 modes).

On TPU the subpass-per-radix machinery is unnecessary: XLA provides fused
FFTs.  This module keeps the reference's API surface (Domain/Direction/
resolution options, fft_1d/2d + r2c/c2r) over jnp.fft, and is validated
against numpy with the same SNR gate the reference uses vs muFFT
(squared_error <= 1e-10 * signal_power, fft/test/fft_test.cpp:70-93).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class Domain(enum.Enum):
    COMPLEX = 0
    REAL = 1


class Direction(enum.Enum):
    FORWARD = 0
    INVERSE = 1


def fft_1d(x, direction: Direction = Direction.FORWARD, axis: int = -1):
    if direction == Direction.FORWARD:
        return jnp.fft.fft(x, axis=axis)
    return jnp.fft.ifft(x, axis=axis)


def fft_2d(x, direction: Direction = Direction.FORWARD):
    if direction == Direction.FORWARD:
        return jnp.fft.fft2(x)
    return jnp.fft.ifft2(x)


def fft_3d(x, direction: Direction = Direction.FORWARD):
    axes = (-3, -2, -1)
    if direction == Direction.FORWARD:
        return jnp.fft.fftn(x, axes=axes)
    return jnp.fft.ifftn(x, axes=axes)


def r2c_1d(x, axis: int = -1):
    return jnp.fft.rfft(x, axis=axis)


def c2r_1d(x, n: int, axis: int = -1):
    return jnp.fft.irfft(x, n=n, axis=axis)


def r2c_2d(x):
    return jnp.fft.rfft2(x)


def c2r_2d(x, shape):
    return jnp.fft.irfft2(x, s=shape)


def snr_check(result, reference, gate: float = 1e-10) -> bool:
    """The reference's numeric gate: err <= gate * power."""
    import numpy as np
    r = np.asarray(result)
    ref = np.asarray(reference)
    err = float(np.sum(np.abs(r - ref) ** 2))
    power = float(np.sum(np.abs(ref) ** 2))
    return err <= gate * max(power, 1e-30)
