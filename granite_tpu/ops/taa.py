"""Temporal anti-aliasing (reference: renderer/post/temporal.cpp +
assets/shaders/post/taa_resolve.frag + post/reprojection*.h).

Exact ports:
  * jitter phase tables (temporal.cpp:47-110): FXAA 2-phase, SMAA T2X
    2-phase, TAA 8/16-phase subpixel sequences; jitter is applied by
    translating clip space by 2*offset/resolution.
  * TAA color space (reprojection_color_space.h): max3 tonemap
    (c*8 / (max3+1)) then RGB->YCgCo; history is carried in this space.
  * resolve (TAA_QUALITY 1): camera reprojection from depth (static
    scenes hit the reference's MV==0 fallback path), 5-tap-cross nearest
    depth, rounded-corner neighborhood AABB clamp, motion-scaled blend
    lerp = (1 + 2*min(50*|mv|, 1)) / 16.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# -- jitter tables (pixel offsets; temporal.cpp) ------------------------------

JITTER_FXAA_2PHASE = np.array([[0.5, 0.0], [0.0, 0.5]], np.float32)
JITTER_SMAA_T2X = np.array([[-0.25, -0.25], [0.25, 0.25]], np.float32)
JITTER_TAA_8PHASE = 0.125 * np.array(
    [[-7, 1], [-5, -5], [-1, -3], [3, -7],
     [-5, -1], [7, 7], [1, 3], [-3, 5]], np.float32)
JITTER_TAA_16PHASE = 0.125 * np.array(
    [[-8, 0], [-6, -4], [-3, -2], [-2, -6], [1, -1], [2, -5], [6, -7],
     [5, -3], [4, 1], [7, 4], [3, 5], [0, 7], [-1, 3], [-4, 6],
     [-7, 8], [-5, 2]], np.float32)


class TemporalJitter:
    """TemporalJitter (post/temporal.cpp:40): steps a jitter phase and
    produces jittered view-proj matrices + the TAA reprojection matrix."""

    def __init__(self, phases: np.ndarray, width: int, height: int):
        self.phases = np.asarray(phases, np.float32)
        self.width = width
        self.height = height
        self.phase = 0
        self._saved_nojitter = []     # ring of un-jittered view-proj

    def jitter_matrix(self) -> np.ndarray:
        """Clip-space translation for the current phase."""
        ox, oy = self.phases[self.phase % len(self.phases)]
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 2.0 * ox / self.width
        m[1, 3] = 2.0 * oy / self.height
        return m

    def step(self, view_proj: np.ndarray) -> np.ndarray:
        """Advance one frame; returns the JITTERED view-proj to render
        with, saving the un-jittered one for reprojection."""
        self._saved_nojitter.append(np.asarray(view_proj, np.float32))
        if len(self._saved_nojitter) > 2:
            self._saved_nojitter.pop(0)
        jittered = (self.jitter_matrix() @ view_proj).astype(np.float32)
        self.phase += 1
        return jittered

    def unstep(self) -> None:
        """Rewind one step() (phase only; the saved un-jittered ring is
        idempotent for a static camera).  Used when a chained run
        re-generates the frame's jitter as part of its stacked bank
        (scene_viewer.render_frames_chained)."""
        self.phase -= 1

    def last_jitter_uv(self) -> np.ndarray:
        """The jitter used by the LAST step(), in UV units (NDC offset
        2*o/size maps to o/size in [0,1] UV space)."""
        ox, oy = self.phases[(self.phase - 1) % len(self.phases)]
        return np.array([ox / self.width, oy / self.height], np.float32)

    def reproject_matrix(self) -> np.ndarray:
        """registers.reproj: current NDC (x,y,z,1) -> previous-frame UV
        (after xy/w), i.e. uv_remap @ prevVP @ inv(curVP)."""
        cur = self._saved_nojitter[-1]
        prev = self._saved_nojitter[0]
        remap = np.array([[0.5, 0, 0, 0.5], [0, 0.5, 0, 0.5],
                          [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
        return (remap @ prev @ np.linalg.inv(cur)).astype(np.float32)


# -- TAA color space (reprojection_color_space.h) ----------------------------

def _max3(c):
    return jnp.maximum(jnp.maximum(c[..., 0], c[..., 1]), c[..., 2])


def hdr_to_taa(c):
    c = c * 8.0
    t = c / (_max3(c) + 1.0)[..., None]
    y = 0.25 * t[..., 0] + 0.5 * t[..., 1] + 0.25 * t[..., 2]
    cg = 0.5 * t[..., 1] - 0.25 * t[..., 0] - 0.25 * t[..., 2]
    co = 0.5 * t[..., 0] - 0.5 * t[..., 2]
    return jnp.stack([y, cg, co], axis=-1)


def taa_to_hdr(c):
    tmp = c[..., 0] - c[..., 1]
    rgb = jnp.stack([tmp + c[..., 2], c[..., 0] + c[..., 1],
                     tmp - c[..., 2]], axis=-1)
    rgb = jnp.clip(rgb, 0.0, 0.999)
    return (1.0 / 8.0) * rgb / (1.0 - _max3(rgb))[..., None]


# -- resolve ------------------------------------------------------------------

def _shift(img, dy: int, dx: int):
    """Clamp-to-edge neighbor access via pad+slice (no gathers)."""
    h, w = img.shape[:2]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad = ((py1, py0), (px1, px0)) + ((0, 0),) * (img.ndim - 2)
    out = jnp.pad(img, pad, mode="edge")
    return out[py0:py0 + h, px0:px0 + w]


def _clamp_box_aabb(color, lo, hi):
    """REPROJECTION_CLAMP_METHOD_AABB (reprojection.h:31-46)."""
    center = 0.5 * (lo + hi)
    radius = jnp.maximum(0.5 * (hi - lo), 1e-4)
    v = color - center
    units = jnp.abs(v / radius)
    max_unit = jnp.maximum(jnp.maximum(units[..., 0], units[..., 1]),
                           units[..., 2])[..., None]
    return jnp.where(max_unit > 1.0, center + v / max_unit, color)


def taa_resolve(current_hdr, prev_taa, depth, reproj, width: int,
                height: int, mv=None):
    """taa_resolve.frag, TAA_QUALITY=1.

    current_hdr: (H, W, 3) linear HDR (this frame, jittered render);
    prev_taa: (H, W, 3) last frame's history in TAA space;
    depth: (H, W) reverse-Z; reproj: (4, 4) from TemporalJitter.
    mv: optional (H, W, 2) per-object motion vectors uv_cur - uv_prev
    (reconstruct_mv path) — without it, camera-only reprojection of the
    depth buffer (the reference's MV==0 fallback; dynamic objects ghost).
    Returns (out_hdr, new_history_taa).
    """
    cur = hdr_to_taa(current_hdr)

    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    uu, vv = jnp.meshgrid(u, v)
    if mv is None:
        # Nearest-depth (closest = max reverse-Z) over the 5-tap cross.
        best_d = depth
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            best_d = jnp.maximum(best_d,
                                 _shift(depth[..., None], dy, dx)[..., 0])
        ndc = jnp.stack([2 * uu - 1, 2 * vv - 1, best_d,
                         jnp.ones_like(uu)], axis=-1)
        rp = ndc @ reproj.T
        old_uv = rp[..., :2] / jnp.maximum(jnp.abs(rp[..., 3:4]), 1e-12) \
            * jnp.sign(rp[..., 3:4])
        mv = jnp.stack([uu, vv], -1) - old_uv
    else:
        # Dilate MV toward the nearest-depth neighbor (taa_resolve.frag
        # closest-fragment search) so silhouettes track the foreground.
        best_d = depth
        best_mv = mv
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            nd = _shift(depth[..., None], dy, dx)[..., 0]
            nmv = _shift(mv, dy, dx)
            closer = nd > best_d
            best_mv = jnp.where(closer[..., None], nmv, best_mv)
            best_d = jnp.maximum(best_d, nd)
        mv = best_mv
        old_uv = jnp.stack([uu, vv], -1) - mv
    mv_len = jnp.sqrt((mv * mv).sum(-1) + 1e-20)
    mv_fast = jnp.minimum(mv_len * 50.0, 1.0)

    from .hdr import _sample_bilinear_uv
    history = _sample_bilinear_uv(prev_taa, old_uv[..., 0], old_uv[..., 1])
    history = jnp.clip(history,
                       jnp.array([0.0, -1.0, -1.0]), jnp.array([1.0]))

    # Rounded-corner neighborhood (cross/diamond minmax averaged).
    lo_x = cur
    hi_x = cur
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        n = _shift(cur, dy, dx)
        lo_x = jnp.minimum(lo_x, n)
        hi_x = jnp.maximum(hi_x, n)
    lo_d = lo_x
    hi_d = hi_x
    for dy, dx in ((-1, -1), (1, 1), (-1, 1), (1, -1)):
        n = _shift(cur, dy, dx)
        lo_d = jnp.minimum(lo_d, n)
        hi_d = jnp.maximum(hi_d, n)
    lo = 0.5 * (lo_x + lo_d)
    hi = 0.5 * (hi_x + hi_d)
    history = _clamp_box_aabb(history, lo, hi)

    # Off-screen reprojection falls back to the current sample.
    on_screen = ((old_uv[..., 0] >= 0) & (old_uv[..., 0] <= 1)
                 & (old_uv[..., 1] >= 0) & (old_uv[..., 1] <= 1))
    history = jnp.where(on_screen[..., None], history, cur)

    lerp_factor = ((1.0 + 2.0 * mv_fast) / 16.0)[..., None]
    out = history + (cur - history) * lerp_factor
    return taa_to_hdr(out), out
