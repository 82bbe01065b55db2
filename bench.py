"""Driver benchmark: prints ONE JSON line with the headline metric.

Current flagship workload: the most advanced config available this round.
The metric is ms/frame; `vs_baseline` is frame_time / 10ms — the fraction of
the BASELINE.md budget used (<1.0 means beating the target).
"""

from __future__ import annotations

import json
import sys
import time


def bench_config1(width=1280, height=720, frames=20):
    import jax.numpy as jnp
    from granite_tpu.app.triangle_demo import TriangleApplication
    app = TriangleApplication()
    app.swapchain_updated(width, height)
    # Warmup/compile.
    app.render_frame(1 / 60, 0.0).block_until_ready()
    t0 = time.monotonic_ns()
    out = None
    for i in range(frames):
        out = app.render_frame(1 / 60, i / 60)
    out.block_until_ready()
    dt_ms = (time.monotonic_ns() - t0) / 1e6 / frames
    return {
        "metric": "frame_time_ms_config1_triangle_720p",
        "value": round(dt_ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(dt_ms / 10.0, 4),
    }


def main() -> int:
    result = bench_config1()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
