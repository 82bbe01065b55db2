"""Headless platform — the primary benchmark harness.

Keeps the CLI contract of the reference's gltf-viewer-headless
(application/platforms/application_headless.cpp:469-505):
  --frames --width --height --time-step --png-path --png-reference-path
  --stat out.json
and the stat JSON schema (averageFrameTimeUs + device info,
application_headless.cpp:638-653) so sweep/compare tooling runs unchanged
against both engines.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..core.stats import StatSink
from ..utils.logging import LOGI, LOGE
from ..utils.timer import FrameTimer, get_current_time_nsecs
from ..utils.image_io import save_png
from .application import Application


def add_headless_cli(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--frames", type=int, default=0,
                        help="render N frames then exit (0 = 1 frame)")
    parser.add_argument("--width", type=int, default=1280)
    parser.add_argument("--height", type=int, default=720)
    parser.add_argument("--time-step", type=float, default=None,
                        dest="time_step",
                        help="fixed frame time step in seconds")
    parser.add_argument("--png-path", type=str, default=None, dest="png_path")
    parser.add_argument("--png-reference-path", type=str, default=None,
                        dest="png_reference_path")
    parser.add_argument("--stat", type=str, default=None,
                        help="write stat JSON to this path")
    parser.add_argument("--video-path", type=str, default=None,
                        dest="video_path",
                        help="encode every frame (ffmpeg or PNG sequence)")
    parser.add_argument("--warmup-frames", type=int, default=2,
                        dest="warmup_frames",
                        help="untimed compile/warmup frames")
    parser.add_argument("--chain", action="store_true",
                        help="time frames chained in one device program "
                             "(present-to-swapchain analogue); requires "
                             "a static scene, incompatible with "
                             "--video-path")
    parser.add_argument("--capture-probe", type=str, default=None,
                        dest="capture_probe",
                        help="render a 6-face environment probe and "
                             "write an equirect PNG/.npy to this path")


def run_headless(app: Application, args: argparse.Namespace) -> int:
    frames = max(args.frames, 1)
    app.swapchain_updated(args.width, args.height)

    timer = FrameTimer()
    stats = StatSink(app.device.backend.gpu_name())

    # Warmup: trigger trace+compile outside the timed region (the analogue
    # of Fossilize pipeline warm-up before benchmarking).
    if getattr(args, "capture_probe", None) and hasattr(
            app, "capture_environment_probe"):
        app.capture_environment_probe(args.capture_probe, face_size=128,
                                      equirect_height=64)
    step = args.time_step or (1.0 / 60.0)
    use_chain = bool(getattr(args, "chain", False)) and \
        hasattr(app, "render_frames_chained")
    if use_chain and getattr(args, "video_path", None):
        LOGE("--chain cannot encode per-frame video; chaining disabled")
        use_chain = False
    t_compile0 = get_current_time_nsecs()
    # --chain runs compile ONLY the chain executable (param building is
    # host-only); unchained runs warm the per-frame step.
    for _ in range(0 if use_chain else max(args.warmup_frames, 0)):
        out = app.render_frame(step, 0.0)
        # block_until_ready() does NOT wait through the axon tunnel
        # (CLAUDE.md); a tiny readback is the only true fence.
        np.asarray(out[0, 0:1])
    if use_chain:
        np.asarray(app.render_frames_chained(step, 0.0, frames)[0, 0:1])
    # Fossilize lesson: compile/warm-up time is a first-class stat.
    stats.counters["compileTimeMs"] = \
        (get_current_time_nsecs() - t_compile0) / 1e6

    sink = None
    if getattr(args, "video_path", None):
        from .video_sink import VideoSink
        sink = VideoSink(args.video_path, args.width, args.height,
                         fps=1.0 / step)

    last_image = None
    t_begin = get_current_time_nsecs()
    if use_chain:
        last_image = app.render_frames_chained(step, step, frames)
        np.asarray(last_image[0, 0:1])
    else:
        for i in range(frames):
            ft = timer.frame(fixed_step=args.time_step)
            out = app.render_frame(ft, timer.get_elapsed())
            app.device.frame().track(out)
            app.device.next_frame_context()
            app.post_frame()
            if sink is not None:
                sink.push_frame(np.asarray(out))
            last_image = out
        # One sync at the end: remote TPU readbacks cost ~35 ms each, so
        # the loop must stay fully pipelined (the reference pipelines
        # frames the same way via its swapchain ring).
        # averageFrameTimeUs is the pipelined throughput, like the
        # reference's headless counter.
        np.asarray(last_image[0, 0:1])
    if sink is not None:
        sink.close()
    total_s = (get_current_time_nsecs() - t_begin) * 1e-9
    for _ in range(frames):
        stats.add_frame(total_s / frames)
    stats.counters["wallTimePerFrameUs"] = 1e6 * total_s / frames
    for tag, us in app.device.stats.averages_us().items():
        stats.intervals.accumulate(tag, us * 1e-6)

    psnr = None
    if last_image is not None and (args.png_path or args.png_reference_path):
        host = np.asarray(last_image)
        if args.png_path:
            save_png(args.png_path, host)
            LOGI("Wrote %s", args.png_path)
        if args.png_reference_path:
            from ..utils.image_io import load_image
            ref = load_image(args.png_reference_path)
            if ref.shape[:2] != host.shape[:2]:
                LOGE("reference size mismatch: %s vs %s",
                     ref.shape, host.shape)
                return 1
            from ..utils.image_compare import psnr_channels
            psnr = psnr_channels(host, ref)
            LOGI("PSNR vs reference: %s", psnr)

    if args.stat:
        if psnr is not None:
            stats.counters.update(psnr)
        stats.write(args.stat)
        LOGI("Wrote %s (averageFrameTimeUs=%.1f)", args.stat,
             stats.average_frame_time_us())
    else:
        LOGI("averageFrameTimeUs=%.1f over %d frames",
             stats.average_frame_time_us(), frames)
    app.teardown()
    return 0


def headless_main(app_factory, argv=None) -> int:
    """application_main analogue (application/application_entry.cpp:88)."""
    parser = argparse.ArgumentParser()
    add_headless_cli(parser)
    app_factory_args = getattr(app_factory, "add_cli", None)
    if app_factory_args:
        app_factory_args(parser)
    args = parser.parse_args(argv)
    app = app_factory(args)
    return run_headless(app, args)
