"""Application base (reference: application/application.hpp:31).

The reference's Application exposes render_frame(frame_time, elapsed_time)
and a poll()/run_frame() loop driven by a WSIPlatform.  Here the platform is
headless-first (application/platforms/application_headless.cpp): a frame loop
without a display, producing RGBA8 arrays that a sink (PNG writer, video
encoder, window) consumes — "presentation" is a device→host DMA.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..core.device import Device
from ..event.manager import EventManager


class Application:
    def __init__(self, device: Optional[Device] = None):
        self.device = device or Device()
        self.event_manager = EventManager.get()
        self.width = 0
        self.height = 0

    # -- WSI analogue --------------------------------------------------------
    def swapchain_updated(self, width: int, height: int) -> None:
        """SwapchainParameterEvent analogue: re-bake graphs on resize."""
        self.width = width
        self.height = height

    # -- overridables --------------------------------------------------------
    def render_frame(self, frame_time: float, elapsed_time: float) -> jax.Array:
        """Produce the frame: returns (H, W, 4) uint8 device array."""
        raise NotImplementedError

    def post_frame(self) -> None:
        """Asset-streaming hook (Application::post_frame, application.cpp)."""

    def teardown(self) -> None:
        self.device.wait_idle()
