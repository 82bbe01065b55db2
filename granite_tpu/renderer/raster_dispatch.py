"""Raster path dispatch: the binned Pallas kernel with sizing guards.

The binned path requires width padding to tile size; kept separate so
scene_renderer stays import-light on CPU-only test runs.
"""

from __future__ import annotations

import os

import jax

from ..ops.raster_binned import rasterize_binned
from ..utils.logging import LOGW

_DEBUG = bool(os.environ.get("GRANITE_DEBUG_GRAPH"))
_overflow_logged = set()


def rasterize_binned_checked(setup, width: int, height: int):
    interpret = jax.default_backend() == "cpu"
    from ..ops.raster_binned import SPAN_H, SPAN_W, TILE_H, TILE_W
    ntiles = (-(-width // TILE_W)) * (-(-height // TILE_H))
    # wide emit window above 512 tiles (2048^2-class targets) — see
    # fused_raster_surface / render_shadow_map
    spans = dict(span_w=2, span_h=8) if ntiles > 512 else {}
    if _DEBUG:
        # Debug mode (breadcrumbs analogue): surface capacity overflows —
        # the reference never drops geometry (render_queue.cpp:41-58), so
        # any non-zero overflow counter is a correctness event.
        depth, tri, stats = rasterize_binned(
            setup, width, height, interpret=interpret, with_stats=True,
            **spans)
        import jax.debug as jdbg
        jdbg.callback(_report_overflow, stats["huge_overflow"],
                      stats["visible_overflow"],
                      stats["max_bin_entries"], ordered=False)
        return depth, tri
    return rasterize_binned(setup, width, height, interpret=interpret,
                            **spans)


def _report_overflow(huge_overflow, visible_overflow, max_bin):
    key = (int(huge_overflow), int(visible_overflow))
    if key != (0, 0) and key not in _overflow_logged:
        _overflow_logged.add(key)
        LOGW("raster binning overflow: %d huge triangles dropped, %d "
             "visible triangles dropped (max bin entries %d) — raise "
             "huge_cap/max_visible", int(huge_overflow),
             int(visible_overflow), int(max_bin))
