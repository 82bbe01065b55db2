"""Raster path dispatch: the binned Pallas kernel with sizing guards.

The binned path requires width padding to tile size; kept separate so
scene_renderer stays import-light on CPU-only test runs.
"""

from __future__ import annotations

import jax

from ..ops.raster_binned import rasterize_binned


def rasterize_binned_checked(setup, width: int, height: int):
    interpret = jax.default_backend() == "cpu"
    return rasterize_binned(setup, width, height, interpret=interpret)
