"""Multi-chip framebuffer sharding (SURVEY.md §2.10).

The reference is single-GPU; its scale mechanisms are queue-level overlap
and frame pipelining.  The TPU-native scale-out axis is the FRAMEBUFFER:
tile rows shard across chips over ICI (the honest context-parallel
analogue), scene/material/texture state is replicated, and the few
cross-tile reductions (average luminance for auto-exposure) become XLA
collectives inserted by GSPMD.

Rules that make this work without manual collectives:
  * per-pixel passes are elementwise/windowed in row space -> partitioned
    for free (neighborhood filters get halo exchanges from XLA);
  * the raster scan carries (depth, tri) buffers sharded on rows; the
    triangle stream is replicated so every chip rasterizes its rows of
    every triangle — for multi-chip perf the binned path later restricts
    each chip to tiles it owns;
  * luminance mean -> psum; history carry keeps the same sharding.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tile_mesh(n_devices: int | None = None,
                   devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, axis_names=("tile",))


def _row_sharded(mesh: Mesh, leaf) -> NamedSharding:
    """Rows (axis 0) over the tile axis for image-like leaves; replicate
    scalars/small vectors."""
    ndim = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    if ndim >= 2 and shape[0] % mesh.shape["tile"] == 0:
        return NamedSharding(mesh, P("tile", *([None] * (ndim - 1))))
    return NamedSharding(mesh, P())


def shard_frame_step(graph, mesh: Mesh):
    """Jit the baked graph step with the backbuffer (and any image-like
    history) sharded over tile rows.  Params are replicated.

    Returns step(params, history) -> (backbuffer, new_history) with
    device placement handled by GSPMD.
    """
    step = graph._step
    repl = NamedSharding(mesh, P())

    def sharded_step(params, history):
        params = jax.device_put(params, repl)
        out, new_hist = step(params, history)
        return out, new_hist

    def out_shardings(outputs):
        return jax.tree_util.tree_map(
            lambda leaf: _row_sharded(mesh, leaf), outputs)

    # Two-phase: trace once to learn output shapes, then jit with
    # shardings derived from them.  The jitted fn is cached after the
    # first call so per-frame use costs no re-trace (eval_shape) and no
    # fresh jit wrapper — jax.jit then hits its own executable cache.
    cache: dict = {}

    def runner(params, history):
        fn = cache.get("fn")
        if fn is None:
            shapes = jax.eval_shape(step, params, history)
            shardings = out_shardings(shapes)
            fn = cache["fn"] = jax.jit(sharded_step,
                                       out_shardings=shardings)
        return fn(params, history)

    return runner
