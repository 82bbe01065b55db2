"""Backend/Device — the TPU-native analogue of Vulkan Context + Device.

Reference:
  * `vulkan/context.hpp:249` Context: instance/device creation, feature
    negotiation, queue discovery.  Here: jax backend/platform/topology query
    and a capability struct (HBM size, core count, ICI mesh shape).
  * `vulkan/device.hpp:167` Device: per-frame contexts (PerFrame ring,
    device.hpp:641-700) with timeline-fence waits at
    Device::next_frame_context (device.cpp:2669-2704), deferred destruction,
    submission batching.  Here: the FrameContext ring holds in-flight jitted
    dispatch results; `next_frame_context()` blocks on the result from
    FRAMES_IN_FLIGHT frames ago — the exact analogue of waiting the timeline
    semaphore — giving frame pipelining without unbounded queueing.

There are no command buffers: "submission" is calling an already-jitted
frame function (XLA async dispatch plays the role of the queue).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax

from ..utils.logging import LOGI
from ..utils.environment import get_environment_int
from .stats import TimestampIntervalStats


@dataclasses.dataclass(frozen=True)
class ContextCreationFlags:
    """Analogue of ContextCreationFlagBits (vulkan/context.hpp:184-199)."""
    prefer_tpu: bool = True
    enable_x64: bool = False
    compilation_cache_dir: Optional[str] = None


class Backend:
    """Platform/topology query — the Context analogue (context.hpp:249)."""

    DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/granite_tpu/xla")

    def __init__(self, flags: ContextCreationFlags = ContextCreationFlags()):
        self.flags = flags
        # Fossilize / VkPipelineCache analogue (vulkan/pipeline_cache.cpp:262):
        # persistent XLA compilation cache for instant warm starts.  On by
        # default (GRANITE_DISABLE_PIPELINE_CACHE=1 to opt out) — compiles
        # through the remote TPU tunnel can take minutes.
        cache_dir = flags.compilation_cache_dir or self.DEFAULT_CACHE_DIR
        if not os.environ.get("GRANITE_DISABLE_PIPELINE_CACHE"):
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.5)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
        self.devices = jax.devices()
        self.default_device = self.devices[0]
        self.platform = self.default_device.platform
        self.device_kind = getattr(self.default_device, "device_kind", "cpu")
        self.num_devices = len(self.devices)

    def gpu_name(self) -> str:
        """Device identity string for the stat JSON (device.hpp name query)."""
        return f"{self.platform}:{self.device_kind} x{self.num_devices}"

    def memory_stats(self) -> dict:
        try:
            return self.default_device.memory_stats() or {}
        except Exception:
            return {}


class FrameContext:
    """One slot of the PerFrame ring (device.hpp:641-700).

    Holds the in-flight frame outputs (jax arrays whose computation may still
    be running thanks to async dispatch) plus host-side per-frame scratch.
    `begin()` blocks until the previous occupant's work is complete — the
    timeline-fence wait in PerFrame::begin.
    """

    def __init__(self, index: int):
        self.index = index
        self.in_flight: list[Any] = []   # arrays to sync on reuse
        self.recycle: list[Any] = []     # deferred-destroy analogue

    def begin(self) -> None:
        # block_until_ready() does not actually wait on the axon tunnel
        # (CLAUDE.md); the only true fence is a readback.  Concatenate one
        # element per in-flight array into a single tiny probe so the
        # fence costs one ~35 ms round trip, not one per array.
        if self.in_flight:
            try:
                import jax.numpy as jnp
                import numpy as np
                probe = jnp.concatenate([
                    jnp.ravel(a)[:1].astype(jnp.float32)
                    for a in self.in_flight])
                np.asarray(probe)
            except Exception:
                for arr in self.in_flight:
                    try:
                        arr.block_until_ready()
                    except Exception:
                        pass
        self.in_flight.clear()
        self.recycle.clear()

    def track(self, *arrays) -> None:
        self.in_flight.extend(a for a in arrays if hasattr(a,
                                                           "block_until_ready"))


class Device:
    """Central hub (vulkan/device.hpp:167) minus command machinery."""

    FRAMES_IN_FLIGHT_DEFAULT = 2

    def __init__(self, backend: Optional[Backend] = None,
                 frames_in_flight: Optional[int] = None):
        self.backend = backend or Backend()
        n = frames_in_flight or get_environment_int(
            "GRANITE_VULKAN_SWAPCHAIN_IMAGES", self.FRAMES_IN_FLIGHT_DEFAULT)
        self._frames = [FrameContext(i) for i in range(max(n, 1))]
        self._frame_index = 0
        self.frame_counter = 0
        self.stats = TimestampIntervalStats()
        LOGI("Device created on %s (%d frame contexts)",
             self.backend.gpu_name(), len(self._frames))

    # -- frame ring ---------------------------------------------------------
    def frame(self) -> FrameContext:
        return self._frames[self._frame_index]

    def next_frame_context(self) -> FrameContext:
        """Advance the ring; waits the oldest frame (device.cpp:2669-2704)."""
        self._frame_index = (self._frame_index + 1) % len(self._frames)
        self.frame_counter += 1
        f = self._frames[self._frame_index]
        f.begin()
        return f

    def wait_idle(self) -> None:
        for f in self._frames:
            f.begin()

    # -- profiling ----------------------------------------------------------
    def register_time_interval(self, tag: str, seconds: float) -> None:
        """Named interval aggregation (query_pool.hpp:200 TimestampInterval)."""
        self.stats.accumulate(tag, seconds)
