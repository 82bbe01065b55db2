"""Per-stage TPU timing probe for the bench scene (CLAUDE.md breakdown).

Times each frame stage as its own jitted dispatch chain (K dispatches +
one readback — the only honest protocol on the axon tunnel).  Stages:
transform+setup, binning+raster, resolve (surface_attributes), shade,
shadow map, bloom+tonemap.  Run ON TPU:  python tools/stage_probe.py
[--width 1920 --height 1080 -k 12 --stages raster,resolve,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _sync(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(np.ravel(np.asarray(leaf))[:1])


def timeit(name, fn, *args, k=12):
    out = fn(*args)
    _sync(out)
    t0 = time.monotonic_ns()
    for _ in range(k):
        out = fn(*args)
    _sync(out)
    dt = (time.monotonic_ns() - t0) / 1e6 / k
    print(f"{name:28s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("-k", type=int, default=12)
    ap.add_argument("--shadow", type=int, default=2048)
    ap.add_argument("--stages", type=str, default="all")
    args = ap.parse_args()
    W, H = args.width, args.height
    want = (None if args.stages == "all"
            else set(args.stages.split(",")))

    def on(name):
        return want is None or name in want

    import jax
    import jax.numpy as jnp
    import tempfile
    cfg = {"renderer": "deferred", "hdrBloom": True,
           "shadowMapResolution": args.shadow}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name
    from granite_tpu.app.scene_viewer import SceneViewerApplication
    app = SceneViewerApplication(types.SimpleNamespace(
        scene=None, config=path, camera_index=-1, bench_scene=True))
    app.swapchain_updated(W, H)
    print("device:", jax.devices()[0], flush=True)

    import __graft_entry__ as ge
    params, history = ge._frame_inputs(app)
    scene = app.packed
    from granite_tpu.renderer import scene_renderer as SR
    from granite_tpu.ops import raster as R

    world = params["external"]["world"]
    nm = params["external"]["normal_mats"]
    vp = params["view_proj"]

    tf = jax.jit(lambda w, n, v: SR.transform_vertices(scene, w, n, v))
    clip, wpos, wnrm, wtan = tf(world, nm, vp)
    if on("transform"):
        timeit("transform+project", tf, world, nm, vp, k=args.k)

    setup_fn = jax.jit(lambda c: R.setup_triangles(c, scene.indices, W, H))
    setup = setup_fn(clip)
    if on("setup"):
        timeit("triangle setup", setup_fn, clip, k=args.k)

    om = params["object_mask"]

    from granite_tpu.ops.raster_binned import bin_triangles, rasterize_binned

    def _bin(s, mask):
        s = s._replace(valid=s.valid & mask[scene.tri_object])
        return bin_triangles(s, W, H)

    bin_fn = jax.jit(_bin)
    if on("bin"):
        timeit("binning (sort+gather)", bin_fn, setup, om, k=args.k)

    def _raster(s, mask):
        s = s._replace(valid=s.valid & mask[scene.tri_object])
        return rasterize_binned(s, W, H, interpret=False)

    raster_fn = jax.jit(_raster)
    depth, tri = raster_fn(setup, om)
    if on("raster"):
        timeit("bin+raster kernel", raster_fn, setup, om, k=args.k)

    res_fn = jax.jit(lambda s, t, a, b, c: SR.surface_attributes(
        scene, s, t, a, b, c, W, H))
    surf = res_fn(setup, tri, wpos, wnrm, wtan)
    if on("resolve"):
        timeit("resolve (vis->surface)", res_fn, setup, tri, wpos, wnrm,
               wtan, k=args.k)

    if on("fused"):
        # The production TPU path: fused Pallas raster+resolve
        # (ops/raster_fused.py) + the material texture tail.
        fused_fn = jax.jit(lambda c, m, a, b, t_: SR.fused_raster_surface(
            scene, c, m, a, b, t_, W, H))
        fused_fn(clip, om, wpos, wnrm, wtan)
        timeit("FUSED raster+resolve", fused_fn, clip, om, wpos, wnrm,
               wtan, k=args.k)

    if on("frame"):
        step = app.graph._step
        frame_fn = jax.jit(lambda p, h: step(p, h)[0])
        frame_fn(params, history)
        timeit("FULL frame (graph step)", frame_fn, params, history,
               k=args.k)

    shadow_size = app.config.shadow_map_resolution
    shadow_fn = jax.jit(lambda w, m: SR.render_shadow_map(
        scene, w, params["shadow_vp"], shadow_size, m))
    smap = shadow_fn(world, params["shadow_object_mask"])
    if on("shadow"):
        timeit(f"shadow map {shadow_size}^2", shadow_fn, world,
               params["shadow_object_mask"], k=args.k)

    env = {"strips": app.environment.strips, "sh": app.environment.sh,
           "levels": app.environment.num_levels}
    light_kw = {}
    if app._has_lights:
        light_kw = dict(lights=params.get("lights"),
                        z_masks=params.get("z_masks"),
                        tile_masks=params.get("tile_masks"))

    def _shade(sf, sm):
        return SR.shade_surface(sf, params, shadow_map=sm,
                                shadow_uv_mat=params["shadow_uv_mat"],
                                width=W, height=H, env=env, **light_kw)

    shade_fn = jax.jit(_shade)
    hdr = shade_fn(surf, smap)
    if on("shade"):
        timeit("shade (light+env+sky)", shade_fn, surf, smap, k=args.k)

    # Shade sub-stages
    if on("shadesub"):
        pcf_fn = jax.jit(lambda sf, sm: __import__(
            "granite_tpu.ops.shadow", fromlist=["x"])
            .sample_directional_shadow(sm, params["shadow_uv_mat"],
                                       sf["pos"]))
        timeit("  pcf term", pcf_fn, surf, smap, k=args.k)
        from granite_tpu.renderer.environment import sample_environment

        def _env(sf):
            return sample_environment(env["strips"], sf["normal"],
                                      sf["roughness"] * 7.0)
        timeit("  env trilinear", jax.jit(_env), surf, k=args.k)
        if light_kw:
            from granite_tpu.ops.clusterer import shade_clustered
            px, py = R.pixel_centers(W, H)

            def _cl(sf):
                return shade_clustered(
                    light_kw["lights"], light_kw["z_masks"],
                    light_kw["tile_masks"], sf["base_color"], sf["normal"],
                    sf["metallic"], sf["roughness"], sf["pos"],
                    params["camera_pos"], params["view"], px, py,
                    z_near=app._cluster_range[0],
                    z_far=app._cluster_range[1])
            timeit("  clustered lights", jax.jit(_cl), surf, k=args.k)

    from granite_tpu.ops import hdr as HDR

    if on("post"):
        def _post(x):
            return HDR.tonemap(x, jnp.zeros_like(x),
                               jnp.float32(np.log(0.18)))
        post_fn = jax.jit(_post)
        post_fn(hdr)
        timeit("tonemap only", post_fn, hdr, k=args.k)


if __name__ == "__main__":
    main()
