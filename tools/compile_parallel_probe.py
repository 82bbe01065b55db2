#!/usr/bin/env python
"""Can two XLA/axon compiles overlap?  (warm-start attempt 2 groundwork)

Cold bench start pays two big Pallas raster compiles through the
tunnel, serially, inside one jit trace.  If the tunnel's remote compile
service accepts concurrent RPCs, pre-warming independent executables on
worker THREADS (XLA compile releases the GIL) would cut cold start by
up to the smaller compile's length — the Fossilize warm-start contract
(reference vulkan/device_fossilize.cpp:51-108) approximated with
parallelism instead of the on-disk cache axon cannot serialize.

Run ON TPU: python tools/compile_parallel_probe.py
Prints serial vs threaded wall for two DISTINCT small-but-nontrivial
Pallas kernel compiles (distinct shapes so no executable cache hits).
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _kernel_fn(n_iters: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def body(x_ref, o_ref):
        acc = x_ref[:]
        # Enough unrolled VPU work to make Mosaic compile take a
        # measurable while (distinct n_iters -> distinct executables).
        for i in range(n_iters):
            acc = acc * 1.0001 + jnp.float32(i)
        o_ref[:] = acc

    def run(x):
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)

    return jax.jit(run)


def _compile(fn, shape):
    import jax.numpy as jnp
    x = jnp.zeros(shape, jnp.float32)
    fn.lower(x).compile()


def main():
    import jax
    print("device:", jax.devices()[0], flush=True)
    # Warm the dispatch path once.
    import jax.numpy as jnp
    np.asarray(jax.jit(lambda a: a + 1)(jnp.ones((8, 128)))[0, 0:1])

    pairs = [(_kernel_fn(96), (256, 256)), (_kernel_fn(97), (384, 256))]
    t0 = time.monotonic()
    for fn, shape in pairs:
        _compile(fn, shape)
    serial = time.monotonic() - t0
    print(f"serial 2-compile wall: {serial:.1f}s", flush=True)

    pairs2 = [(_kernel_fn(98), (512, 256)), (_kernel_fn(99), (640, 256))]
    t0 = time.monotonic()
    threads = [threading.Thread(target=_compile, args=p) for p in pairs2]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    threaded = time.monotonic() - t0
    print(f"threaded 2-compile wall: {threaded:.1f}s "
          f"({'OVERLAPS' if threaded < 0.75 * serial else 'serialized'})",
          flush=True)


if __name__ == "__main__":
    main()
