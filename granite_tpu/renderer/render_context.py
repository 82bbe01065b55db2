"""RenderContext — per-view parameters (reference: renderer/
render_context.hpp:46: camera matrices, frustum, lighting params).

A plain pytree of small arrays handed to the jitted frame program; built on
host each frame from the Camera + lighting config.
"""

from __future__ import annotations

import numpy as np

from ..math.frustum import Frustum


class RenderContext:
    def __init__(self):
        self.view = np.eye(4, dtype=np.float32)
        self.projection = np.eye(4, dtype=np.float32)
        self.view_projection = np.eye(4, dtype=np.float32)
        self.camera_pos = np.zeros(3, np.float32)
        self.camera_front = np.array([0, 0, -1], np.float32)
        self.frustum: Frustum | None = None
        # directional light (renderer/lights/lights.hpp DirectionalLight)
        self.sun_direction = np.array([0.3, 0.8, 0.5], np.float32)
        self.sun_color = np.array([3.0, 2.8, 2.5], np.float32)

    def set_camera(self, camera) -> None:
        self.view = camera.get_view()
        self.projection = camera.get_projection()
        self.view_projection = (self.projection @ self.view).astype(
            np.float32)
        self.camera_pos = np.asarray(camera.position, np.float32)
        self.camera_front = camera.get_front()
        self.frustum = Frustum(self.view_projection)

    def set_lighting(self, sun_direction, sun_color) -> None:
        d = np.asarray(sun_direction, np.float32)
        self.sun_direction = d / np.linalg.norm(d)
        self.sun_color = np.asarray(sun_color, np.float32)

    def device_params(self) -> dict:
        """The pytree that crosses into jit."""
        return {
            "view_proj": self.view_projection,
            "camera_pos": self.camera_pos,
            "sun_dir": self.sun_direction,
            "sun_color": self.sun_color,
        }
