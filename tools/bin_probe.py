"""Standalone attribution of the binning block (ops/raster_binned).

The bin-only frame ladder put transform+setup+binning+sort at 36.3
ms/frame (1080p bench scene, C=163840) — the biggest gbuffer sub-rung.
This probe times the block's pieces in isolation (chained protocol,
per-iteration varying inputs, scalar readback).  Standalone numbers
overstate in-context costs; use them for RELATIVE attribution only.

Run ON TPU: python tools/bin_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ITERS = 8


def timed(label, fn, *args):
    import jax
    f = jax.jit(fn)
    np.asarray(jax.tree_util.tree_leaves(f(*args))[0]).ravel()[:1]
    t0 = time.monotonic_ns()
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ms = (time.monotonic_ns() - t0) / 1e6 / ITERS
    print(f"{label:44s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from granite_tpu.ops import raster as R
    from granite_tpu.ops.raster_binned import (
        _build_packets, bin_triangles)

    T = 258774
    C = 163840
    rng = np.random.RandomState(0)
    # Synthetic clip-space tris, bench-scene-sized.
    v = rng.randn(ITERS, T, 3, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 1.5
    v[..., 0:2] *= 0.4
    clips = jnp.asarray(v.reshape(ITERS, T * 3, 4))
    idx = jnp.arange(T * 3, dtype=jnp.int32).reshape(T, 3)
    extra = jnp.asarray(rng.rand(ITERS, T, 55).astype(np.float32))
    W, H = 1920, 1080

    def chain(body):
        def run(clips, extra):
            def f(acc, ce):
                c, e = ce
                return acc + body(c, e), None
            acc, _ = jax.lax.scan(f, jnp.float32(0.0), (clips, extra))
            return acc
        return run

    def setup_only(c, e):
        s = R.setup_triangles(c, idx, W, H)
        return s.adj.sum() + s.offset.sum()

    def build_only(c, e):
        s = R.setup_triangles(c, idx, W, H)
        return _build_packets(s, e).sum()

    def sort_only(c, e):
        s = R.setup_triangles(c, idx, W, H)
        keys = (s.bbox[:, 0] << 12) ^ s.bbox[:, 1]
        order = jnp.argsort(keys, stable=False)
        return order.sum().astype(jnp.float32)

    def sortC_only(c, e):
        s = R.setup_triangles(c, idx, W, H)
        keys = ((s.bbox[:C, 0] << 12) ^ s.bbox[:C, 1])
        order = jnp.argsort(keys, stable=False)
        return order.sum().astype(jnp.float32)

    def gather_sorted(c, e):
        s = R.setup_triangles(c, idx, W, H)
        p = _build_packets(s, e)
        keys = (s.bbox[:, 0] << 12) ^ s.bbox[:, 1]
        order = jnp.argsort(keys, stable=False)
        return p[order].sum()

    def full_bin(c, e):
        s = R.setup_triangles(c, idx, W, H)
        pk, st, hr, hs, stats = bin_triangles(
            s, W, H, max_visible=C)
        return pk.sum() + st.sum().astype(jnp.float32) + hr.sum()

    def full_bin_nocap(c, e):
        s = R.setup_triangles(c, idx, W, H)
        pk, st, hr, hs, stats = bin_triangles(s, W, H)
        return pk.sum() + st.sum().astype(jnp.float32) + hr.sum()

    timed("setup_triangles only", chain(setup_only), clips, extra)
    timed("+ build_packets (T,128)", chain(build_only), clips, extra)
    timed("setup + argsort T keys", chain(sort_only), clips, extra)
    timed("setup + argsort C keys", chain(sortC_only), clips, extra)
    timed("setup+build+sort+gather[order]",
          chain(gather_sorted), clips, extra)
    timed("FULL bin_triangles (C cap)", chain(full_bin), clips, extra)
    timed("FULL bin_triangles (no cap)",
          chain(full_bin_nocap), clips, extra)


if __name__ == "__main__":
    main()
