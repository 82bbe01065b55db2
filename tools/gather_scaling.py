"""Gather cost vs index count + op-merge microbench (v5e, axon).

Decides the topk_shadow_terms layout question: at half-res the K=4
atlas gathers fetch ~0.5M indices each — if the per-OP floor dominates
at that size, stacking the 4 slots' indices into ONE gather of 2M wins;
if cost is per-index linear, it's a wash.  Honest protocol per
CLAUDE.md: per-iteration varying indices inside a lax.scan (hoist
defeat), one scalar readback.

Run ON TPU: python tools/gather_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(fn, *args):
    import jax
    f = jax.jit(fn)
    np.asarray(f(*args))                      # compile + warm
    t0 = time.monotonic_ns()
    np.asarray(f(*args))
    return (time.monotonic_ns() - t0) / 1e6


def main():
    import jax
    import jax.numpy as jnp

    ITERS = 16
    rng = np.random.RandomState(0)
    # Shadow-atlas-sized table: 2048^2 x 8 slices quads = 128 MB f32x4.
    for rows, label in ((2048 * 2048 * 2, "128MB"),
                        (512 * 512 * 8, "8MB")):
        table = jnp.asarray(rng.rand(rows, 4).astype(np.float32))
        for n in (131072, 524288, 2097152):
            idx = jnp.asarray(
                rng.randint(0, rows, size=(ITERS, n)).astype(np.int32))

            def chain(tbl, idx):
                def body(acc, i):
                    return acc + tbl[i].sum(), None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), idx)
                return acc

            ms = timed(chain, table, idx) / ITERS
            print(f"table={label:6s} n={n:8d}  one gather: "
                  f"{ms:7.3f} ms  ({ms / n * 1e6:.2f} ns/idx)",
                  flush=True)

        # 4 ops x n vs 1 op x 4n (the slot-merge question), n = half-res
        # 1080p pixel count ~ 0.5M.
        n = 518400
        idx4 = jnp.asarray(
            rng.randint(0, rows, size=(ITERS, 4, n)).astype(np.int32))

        def chain4(tbl, idx):
            def body(acc, i):
                return acc + sum(tbl[i[s]].sum() for s in range(4)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), idx)
            return acc

        def chain1(tbl, idx):
            def body(acc, i):
                return acc + tbl[i.reshape(-1)].sum(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), idx)
            return acc

        ms4 = timed(chain4, table, idx4) / ITERS
        ms1 = timed(chain1, table, idx4) / ITERS
        print(f"table={label:6s} 4 ops x {n}: {ms4:7.3f} ms   "
              f"1 op x {4 * n}: {ms1:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
