"""BASELINE config 1: headless clear + one textured triangle.

Reference analogue: tests/triangle.cpp run through the headless platform.
The whole frame (clear -> raster -> texture sample -> sRGB encode) is ONE
jitted function; the triangle slowly rotates with elapsed time so --frames
produces animation and --time-step is deterministic.

Run:  python -m granite_tpu.app.triangle_demo --width 1280 --height 720 \
          --frames 4 --time-step 0.0166 --png-path out.png
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graph import RenderGraph, AttachmentInfo, Queue
from ..ops import raster as R
from ..ops import texture as T
from ..ops.srgb import encode_rgba8
from .application import Application
from .headless import headless_main


def checkerboard(size: int = 256, tiles: int = 8) -> np.ndarray:
    """Procedural checkerboard texture (linear float RGBA)."""
    yy, xx = np.mgrid[0:size, 0:size]
    c = (((xx * tiles // size) ^ (yy * tiles // size)) & 1).astype(np.float32)
    img = np.empty((size, size, 4), np.float32)
    img[..., 0] = 0.9 * c + 0.05
    img[..., 1] = 0.4 * c + 0.1
    img[..., 2] = 0.2 * (1.0 - c) + 0.1
    img[..., 3] = 1.0
    return img


class TriangleApplication(Application):
    """Two graph passes: 'triangle' shades the rotating textured triangle
    into an HDR-ish linear color target; 'blit' sRGB-encodes into the
    backbuffer — exercising the render graph end to end from config 1 on."""

    CLEAR_COLOR = jnp.array([0.01, 0.02, 0.05], jnp.float32)

    def __init__(self, args=None):
        super().__init__()
        self.mips = None
        self.graph = RenderGraph()
        self._history = None

    def swapchain_updated(self, width: int, height: int) -> None:
        super().swapchain_updated(width, height)
        self.mips = T.build_mips(jnp.asarray(checkerboard()))
        g = self.graph
        g.reset()
        g.set_backbuffer_dimensions(width, height)
        g.add_pass("triangle", Queue.GRAPHICS) \
            .add_external_input("texture") \
            .add_color_output("color", AttachmentInfo(channels=3)) \
            .set_execute(self._triangle_pass)
        g.add_pass("blit", Queue.GRAPHICS) \
            .add_texture_input("color") \
            .add_color_output("backbuffer",
                              AttachmentInfo(channels=4, dtype=jnp.uint8)) \
            .set_execute(lambda ctx: {
                "backbuffer": encode_rgba8(ctx.input("color"))})
        g.set_backbuffer_source("backbuffer")
        g.bake()
        g.log()
        self._history = g.initial_history()

    @staticmethod
    def _triangle_pass(ctx):
        height, width = ctx.backbuffer_size()
        mips = ctx.input("texture")
        angle = ctx.params["angle"]
        c, s = jnp.cos(angle), jnp.sin(angle)
        base = jnp.array([
            [-0.6, 0.5, 0.5],
            [0.6, 0.5, 0.5],
            [0.0, -0.6, 0.5],
        ], jnp.float32)
        rot = jnp.stack([base[:, 0] * c - base[:, 1] * s,
                         base[:, 0] * s + base[:, 1] * c,
                         base[:, 2]], axis=1)
        clip = jnp.concatenate([rot, jnp.ones((3, 1), jnp.float32)], axis=1)
        uvs = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.5, 1.0]], jnp.float32)
        idx = jnp.array([[0, 1, 2]], jnp.int32)

        setup = R.setup_triangles(clip, idx, width, height,
                                  cull_mode=R.CULL_NONE)
        depth, tri = R.rasterize(setup, width, height)
        px, py = R.pixel_centers(width, height)
        uv, duv_dx, duv_dy = R.interpolate_with_derivs(
            uvs, idx, tri, setup, px, py)
        lod = T.lod_from_derivs(duv_dx[..., 0], duv_dx[..., 1],
                                duv_dy[..., 0], duv_dy[..., 1],
                                mips.shape[2], mips.shape[1])
        texel = T.sample_trilinear(mips, uv[..., 0], uv[..., 1], lod)
        covered = (tri >= 0)[..., None]
        color = jnp.where(covered, texel[..., :3],
                          TriangleApplication.CLEAR_COLOR)
        return {"color": color}

    def render_frame(self, frame_time: float, elapsed_time: float):
        params = {"external": {"texture": self.mips},
                  "angle": jnp.float32(0.3 * elapsed_time)}
        out, self._history = self.graph.execute(params, self._history)
        return out


def main(argv=None) -> int:
    return headless_main(TriangleApplication, argv)


if __name__ == "__main__":
    raise SystemExit(main())
