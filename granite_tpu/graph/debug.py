"""Render-graph debug execution: breadcrumbs + validation mode.

Reference analogues:
  * breadcrumbs (vulkan/breadcrumbs.{hpp,cpp}): AMD buffer-marker / NV
    checkpoint trails recording every draw/dispatch; on device loss the
    last-known-good marker is dumped.  Here: debug execution runs the
    baked graph pass-by-pass, synchronizing after each, so an XLA fault
    (or NaN, with check_numerics) maps to the exact pass name — the
    structured-error-to-pass mapping SURVEY.md §5 specifies.
  * validation layers: `check_numerics=True` scans every pass's outputs
    for NaN/Inf like a synchronization-validation layer scans hazards
    (jax_debug_nans analogue, but per-pass and non-fatal-configurable).
  * per-pass timing: the QueryPool timestamp path (query_pool.hpp:133) —
    each pass's device time lands in the device's TimestampInterval
    stats and the chrome trace.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import numpy as np

from ..utils.logging import LOGE, LOGI
from ..utils.timeline_trace import TimelineTraceFile
from .render_graph import PassContext, RenderGraphError


@dataclass
class Breadcrumbs:
    """Pass trail of the most recent debug execution."""
    completed: list = field(default_factory=list)
    failed: str | None = None
    nan_passes: list = field(default_factory=list)
    pass_times_ms: dict = field(default_factory=dict)

    def report(self) -> str:
        lines = ["RenderGraph breadcrumb trail:"]
        for name in self.completed:
            t = self.pass_times_ms.get(name)
            flag = " [NaN/Inf!]" if name in self.nan_passes else ""
            lines.append(f"  [done] {name}"
                         + (f" ({t:.2f} ms)" if t is not None else "")
                         + flag)
        if self.failed:
            lines.append(f"  [FAULT] {self.failed}  <-- device fault here")
        return "\n".join(lines)


def execute_debug(graph, params, history, check_numerics: bool = True,
                  device=None) -> tuple:
    """Run the baked graph one pass at a time with per-pass sync.

    Returns (backbuffer, new_history, breadcrumbs).  Orders of magnitude
    slower than the fused jit (every pass is its own dispatch + sync) —
    this is the GRANITE_VULKAN_SYNC_VALIDATION analogue, a debugging tool.
    """
    if graph._step is None:
        raise RenderGraphError("graph not baked")
    crumbs = Breadcrumbs()
    pool = {}
    trace = TimelineTraceFile.get_instance()
    t_base = time.monotonic_ns()
    for pname in graph._order:
        rp = graph._passes[pname]
        ctx = PassContext(graph, rp, pool, history, params)
        t0 = time.monotonic_ns()
        try:
            outs = rp._execute(ctx)
            # Force completion so faults attribute to THIS pass.
            outs = {k: jax.block_until_ready(v) for k, v in outs.items()}
        except Exception as e:  # noqa: BLE001 — report, then re-raise
            crumbs.failed = pname
            LOGE("%s", crumbs.report())
            raise
        dt_ms = (time.monotonic_ns() - t0) / 1e6
        crumbs.pass_times_ms[pname] = dt_ms
        if trace is not None:
            trace.complete_event(f"pass:{pname}",
                                 (t0 - t_base) / 1e3, dt_ms * 1e3, tid=1)
        if device is not None:
            device.register_time_interval(f"pass:{pname}", dt_ms / 1e3)
        if check_numerics:
            for k, v in outs.items():
                arr = np.asarray(v)
                if np.issubdtype(arr.dtype, np.floating) and \
                        not np.isfinite(arr).all():
                    crumbs.nan_passes.append(pname)
                    LOGE("pass '%s' output '%s' contains NaN/Inf", pname, k)
                    break
        pool.update(outs)
        crumbs.completed.append(pname)
    new_history = {n: pool[n] for n in graph._history_resources}
    return pool[graph._backbuffer], new_history, crumbs
