"""Video-textured surface demo (reference: tests/video_player.cpp).

Proves the video-decode path end to end: a VideoSource
(app/video_source.py — ffmpeg subprocess or PNG-sequence fallback)
streams RGBA frames that texture a 3D quad rendered through the render
graph, the TPU analogue of video_player.cpp's VideoTextureRenderable
(a triangle-strip quad whose per-frame ImageView comes from
VideoDecoder::acquire_video_frame).

TPU-native shape: the decoded frame's mip strip rides as an EXTERNAL
graph param — constant shape, so the jitted frame never retraces; only
the device upload happens per frame (the transfer-queue analogue).
The quad slowly yaws like the reference's camera drift so --frames
produces animation.  Audio sync and seeking are out of scope (the
reference drives them through ffmpeg's audio stream; this environment
has no sound device — audio/ has the mixer the real pipeline would use).

Run:  python -m granite_tpu.app.video_player --video <file-or-pngdir> \
          --width 640 --height 360 --frames 8 --png-path out.png
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graph import RenderGraph, AttachmentInfo, Queue
from ..math.muglm import look_at_matrix, perspective
from ..ops import raster as R
from ..ops import texture as T
from ..ops.srgb import encode_rgba8
from ..utils.logging import LOGI
from .application import Application
from .headless import headless_main
from .video_source import VideoSource


class VideoPlayerApplication(Application):
    """Two passes: 'screen' rasters the video quad, 'blit' sRGB-encodes."""

    CLEAR_COLOR = jnp.array([0.02, 0.02, 0.04], jnp.float32)

    @staticmethod
    def add_cli(parser) -> None:
        parser.add_argument("--video", type=str, default=None,
                            help="video file (ffmpeg) or PNG-seq dir")
        parser.add_argument("--video-size", dest="video_size", type=int,
                            default=256)

    def __init__(self, args=None):
        super().__init__()
        path = getattr(args, "video", None)
        if path is None:
            raise SystemExit("--video <file or PNG dir> is required")
        # Texture at a raster-friendly square size; the source decodes
        # (or letterboxes) into it.
        self.tex_size = int(getattr(args, "video_size", 256) or 256)
        self.source = VideoSource(path, self.tex_size, self.tex_size)
        self._frame_np = np.zeros(
            (self.tex_size, self.tex_size, 4), np.uint8)
        self._frames_decoded = 0
        self.graph = RenderGraph()
        self._history = None

    def swapchain_updated(self, width: int, height: int) -> None:
        super().swapchain_updated(width, height)
        g = self.graph
        g.reset()
        g.set_backbuffer_dimensions(width, height)
        g.add_pass("screen", Queue.GRAPHICS) \
            .add_external_input("video_mips") \
            .add_color_output("color", AttachmentInfo(channels=3)) \
            .set_execute(self._screen_pass)
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
    def _screen_pass(ctx):
        height, width = ctx.backbuffer_size()
        mips = ctx.input("video_mips")
        yaw = ctx.params["yaw"]

        # 16:9 screen quad in world space, slowly yawing around Y.
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        hw, hh = 1.6, 0.9
        corners = jnp.array([
            [-hw, hh, 0.0], [hw, hh, 0.0],
            [-hw, -hh, 0.0], [hw, -hh, 0.0]], jnp.float32)
        rot = jnp.stack([corners[:, 0] * c + corners[:, 2] * s,
                         corners[:, 1],
                         -corners[:, 0] * s + corners[:, 2] * c], axis=1)
        view = jnp.asarray(look_at_matrix(
            np.array([0.0, 0.0, 3.2], np.float32),
            np.zeros(3, np.float32), np.array([0.0, 1.0, 0.0],
                                              np.float32)))
        proj = jnp.asarray(perspective(
            0.9, width / height, 0.1, 100.0))
        vp = proj @ view
        world_h = jnp.concatenate(
            [rot, jnp.ones((4, 1), jnp.float32)], axis=1)
        clip = world_h @ vp.T
        uvs = jnp.array([[0.0, 0.0], [1.0, 0.0],
                         [0.0, 1.0], [1.0, 1.0]], jnp.float32)
        idx = jnp.array([[0, 1, 2], [2, 1, 3]], jnp.int32)

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
                          VideoPlayerApplication.CLEAR_COLOR)
        return {"color": color}

    def render_frame(self, frame_time: float, elapsed_time: float):
        nxt = self.source.read_frame()
        if nxt is not None:
            if nxt.shape[:2] != (self.tex_size, self.tex_size):
                # PNG-sequence fallback frames keep their own size;
                # nearest-resize into the constant texture shape.
                ys = (np.arange(self.tex_size) * nxt.shape[0]
                      // self.tex_size)
                xs = (np.arange(self.tex_size) * nxt.shape[1]
                      // self.tex_size)
                nxt = nxt[ys][:, xs]
            self._frame_np = nxt
            self._frames_decoded += 1
        # sRGB u8 -> linear float mips (VideoDecoder mipgen analogue);
        # constant shape, so this is upload + jit-cached mip build only.
        from ..ops.srgb import srgb_to_linear
        u8 = jnp.asarray(self._frame_np).astype(jnp.float32) / 255.0
        frame = jnp.concatenate(
            [srgb_to_linear(u8[..., :3]), u8[..., 3:4]], axis=-1)
        mips = T.build_mips(frame)
        params = {"external": {"video_mips": mips},
                  "yaw": jnp.float32(0.15 * elapsed_time)}
        out, self._history = self.graph.execute(params, self._history)
        return out

    def teardown(self) -> None:
        self.source.close()
        LOGI("VideoPlayer: %d frames decoded", self._frames_decoded)


def main(argv=None) -> int:
    return headless_main(VideoPlayerApplication, argv)


if __name__ == "__main__":
    raise SystemExit(main())
