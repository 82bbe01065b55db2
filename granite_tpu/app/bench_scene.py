"""Sponza-class synthetic benchmark scene.

No redistributable Sponza asset ships in this environment, so the
headline benchmark uses a procedurally-built atrium of comparable cost:
~260k triangles, textured floor, colonnade of cylinders, a grid of
high-density spheres and cubes, multiple PBR materials (textured +
dielectric + metal), a directional sun plus a ring of point lights —
exercising exactly the BASELINE config-3 deferred HDR graph.
"""

from __future__ import annotations

import numpy as np

from ..scene.mesh_util import cube_mesh, cylinder_mesh, plane_mesh, \
    sphere_mesh
from ..scene.scene_formats import (
    LIGHT_POINT, LightData, MaterialData, NodeData, SceneInfo,
)


def build_bench_scene(target_tris: int = 260_000,
                      seed: int = 11) -> SceneInfo:
    from .triangle_demo import checkerboard
    rng = np.random.RandomState(seed)
    info = SceneInfo()
    checker = (np.clip(checkerboard(512, tiles=16), 0, 1) * 255).astype(
        np.uint8)
    noise = rng.randint(60, 200, (256, 256, 4), np.uint8)
    noise[..., 3] = 255
    info.images = [checker, noise]
    info.image_srgb = [True, True]
    info.materials = [
        MaterialData(name="floor", base_color_image=0,
                     roughness_factor=0.7),
        MaterialData(name="stone", base_color_image=1,
                     roughness_factor=0.9),
        MaterialData(name="marble",
                     base_color_factor=np.array([.8, .78, .72, 1],
                                                np.float32),
                     roughness_factor=0.35),
        MaterialData(name="brass",
                     base_color_factor=np.array([.9, .7, .3, 1],
                                                np.float32),
                     roughness_factor=0.3, metallic_factor=1.0),
        MaterialData(name="fabric",
                     base_color_factor=np.array([.6, .12, .1, 1],
                                                np.float32),
                     roughness_factor=0.95),
    ]
    # High-density meshes so instances reach the triangle budget.
    sphere_hi = sphere_mesh(32, 3)         # ~4k tris
    sphere_md = sphere_mesh(24, 2)         # ~2.3k tris
    cyl = cylinder_mesh(48, 1)             # ~192 tris
    info.meshes = [plane_mesh(0, tiles=24.0), cyl, sphere_hi, sphere_md,
                   cube_mesh(4)]
    tris_per = [2, 96 * 2, 32 * 64 * 2, 24 * 48 * 2, 12]

    root = NodeData(name="root")
    nodes = [root]

    def add(name, mesh, t, r=None, s=None):
        nodes.append(NodeData(
            name=name, meshes=[mesh],
            translation=np.asarray(t, np.float32),
            rotation=np.asarray(r if r is not None else [1, 0, 0, 0],
                                np.float32),
            scale=np.asarray(s if s is not None else [1, 1, 1],
                             np.float32)))

    add("floor", 0, [0, 0, 0], s=[30, 1, 30])
    total = tris_per[0]
    # colonnade
    for i in range(24):
        a = 2 * np.pi * i / 24
        add(f"col{i}", 1, [18 * np.cos(a), 3.0, 18 * np.sin(a)],
            s=[0.8, 3.0, 0.8])
        total += tris_per[1]
    # grid of spheres/cubes until budget
    i = 0
    while total < target_tris:
        x = rng.uniform(-14, 14)
        z = rng.uniform(-14, 14)
        kind = i % 3
        mesh = [2, 3, 4][kind]
        scale = [0.9, 0.7, 0.8][kind] * rng.uniform(0.7, 1.3)
        y = [1.0, 0.8, 0.8][kind] * scale
        q = np.array([np.cos(i * 0.3), 0, np.sin(i * 0.3), 0], np.float32)
        add(f"obj{i}", mesh, [x, y, z], r=q, s=[scale] * 3)
        total += tris_per[mesh]
        i += 1
    root.children = list(range(1, len(nodes)))
    info.nodes = nodes
    info.roots = [0]

    for k in range(8):
        a = 2 * np.pi * k / 8
        info.lights.append(LightData(
            type=LIGHT_POINT,
            color=np.asarray([(2, .6, .4), (.5, 2, .6), (.5, .6, 2),
                              (2, 2, .6)][k % 4], np.float32),
            intensity=8.0, range=12.0))
        nodes.append(NodeData(
            name=f"plight{k}",
            translation=np.array([10 * np.cos(a), 2.5, 10 * np.sin(a)],
                                 np.float32),
            light=len(info.lights) - 1))
        root.children.append(len(nodes) - 1)
    return info
