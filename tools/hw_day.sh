#!/bin/bash
# Hardware validation sequence for when the axon tunnel returns.
# Runs cheapest-first so a flaky window still yields signal; every step
# logs to $OUT and failures don't stop later steps (except the probe).
#
#   bash tools/hw_day.sh [outdir]
#
# Order: 1-op probe -> tiny fused-shade Mosaic compile -> hw_verify
# 1080p -> bench (records the number; safe-mode retry built in) ->
# frame_probe orbit ladder.
set -u
OUT=${1:-/tmp/hw_day}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== 1. tunnel probe (60s)"
timeout 120 python -c "
import jax, numpy as np
print(jax.devices())
x = jax.jit(lambda a: a*2)(np.ones((8,128),np.float32))
print('probe ok', np.asarray(x[0,0:1]))" 2>&1 | tail -2 | tee "$OUT/probe.log"
grep -q "probe ok" "$OUT/probe.log" || { echo "TUNNEL STILL DEAD"; exit 1; }

echo "== 2. fused-shade Mosaic compile + tiny run (new kernel, unvalidated)"
# NOTE: the heredoc must attach to `python -`, NOT the last pipeline
# component (round-4 bug: `python - | tee <<EOF` fed the heredoc to tee
# and the probe never ran).
timeout 1200 python - <<'EOF' 2>&1 | tail -5 | tee "$OUT/shade_fused_probe.log"
import numpy as np, jax, jax.numpy as jnp
from granite_tpu.ops.shade_fused import shade_planes_fused, P_FIXED
H, W = 64, 256
planes = jnp.asarray(np.random.default_rng(0).uniform(
    0, 1, (P_FIXED, H, W)).astype(np.float32))
ltbl = jnp.zeros((32, 128), jnp.float32).at[:, 13].set(0.0).at[:, 14].set(1e9)
tm = jnp.full((1, 4), -1, jnp.int32)   # all bits set
uni = jnp.zeros((8, 128), jnp.float32).at[0, 3:6].set(
    jnp.asarray([0.3, 0.8, 0.5])).at[1, 0:3].set(1.0).at[0, 6].set(2.0)
out = shade_planes_fused(planes, ltbl, tm, uni, H, W, k_shadow=0,
                         has_env=True, has_lights=True, has_ao=True,
                         ambient=False, interpret=False)
v = np.asarray(out)
print("fused shade hw probe:", v.shape, "finite:", bool(np.isfinite(v).all()),
      "mean:", float(v.mean()))
EOF

echo "== 3. hw_verify 1080p (image gate)"
timeout 3000 python tools/hw_verify.py --out "$OUT/hw_verify" 2>&1 | tail -8 | tee "$OUT/hw_verify.log"

echo "== 4. bench (the number)"
timeout 3000 python bench.py 2> "$OUT/bench_stderr.log" | tee "$OUT/bench.json"
tail -3 "$OUT/bench_stderr.log"

echo "== 5. frame_probe orbit ladder"
timeout 3000 python tools/frame_probe.py 2>&1 | tail -12 | tee "$OUT/ladder.log"

echo "== 6. rep-diag (bench vs ladder protocol gap)"
timeout 3000 python tools/rep_diag.py 2>&1 | tail -6 | tee "$OUT/rep_diag.log"

echo "== done; logs in $OUT"
