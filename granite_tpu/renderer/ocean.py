"""Ocean renderable (reference: renderer/ocean.{hpp,cpp}).

The reference's Ocean is an AbstractRenderable that adds graph passes
(update_fft_input -> 3 FFTs -> bake heightmap/gradients) and renders a
GPU-LOD-culled grid displaced in the vertex shader (ocean.vert).

Here: an `Ocean` owns the initial spectrum + frequency grids (device
constants), contributes an "ocean-fft" COMPUTE pass producing the packed
(N, N, 5) height/displacement/gradient maps, and a vertex displacer that
the scene raster path applies to the ocean grid node's vertices — the
vertex-shader displacement done at transform time instead.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops import ocean as O
from ..scene.scene_formats import MeshData


@dataclass
class OceanConfig:
    """Mirror of Ocean::Config defaults (ocean.hpp:79)."""
    fft_resolution: int = 256
    grid_resolution: int = 128
    world_size: float = 64.0
    amplitude: float = 0.3
    wind_velocity: tuple = (6.0, 3.0)
    lambda_disp: float = 1.2
    height_scale: float = 1.0
    animation_period: float = 256.0


class Ocean:
    def __init__(self, config: OceanConfig = OceanConfig(), seed: int = 0):
        self.config = config
        n = config.fft_resolution
        ws = (config.world_size, config.world_size)
        self.h0 = jnp.asarray(O.generate_distribution(
            n, ws, config.amplitude, config.wind_velocity, seed=seed))
        self.kx, self.ky, self.k_len = O._freq_grids(n, ws)

    def grid_mesh(self, material: int = -1) -> MeshData:
        """Flat grid covering one heightmap period, UV in [0,1]."""
        g = self.config.grid_resolution
        ws = self.config.world_size
        lin = np.linspace(0.0, 1.0, g + 1, dtype=np.float32)
        uu, vv = np.meshgrid(lin, lin)
        pos = np.stack([(uu - 0.5) * ws, np.zeros_like(uu),
                        (vv - 0.5) * ws], axis=-1).reshape(-1, 3)
        uv = np.stack([uu, vv], axis=-1).reshape(-1, 2)
        nrm = np.tile(np.array([0, 1, 0], np.float32), (len(pos), 1))
        tri = []
        W = g + 1
        for y in range(g):
            for x in range(g):
                a = y * W + x
                tri += [[a, a + W, a + 1], [a + 1, a + W, a + W + 1]]
        return MeshData(positions=pos.astype(np.float32), normals=nrm,
                        uvs=uv.astype(np.float32),
                        indices=np.array(tri, np.int32),
                        material=material).finalize()

    def fft_pass(self, ctx):
        """Graph pass: spectrum evolve + 3 IFFTs -> packed LOD mip stack
        (L, N, N, 5).

        The reference builds "ocean-lods" mip chains of the displacement
        maps and a per-patch LOD texture consumed by ocean.vert
        (ocean.cpp:181-235 + cull_blocks.comp); here the mip chain is
        built in the same pass and LOD selection happens per VERTEX in
        displace() — continuous LOD with no patch stitching needed.
        """
        t = ctx.params["ocean_time"]
        height, disp, grad = O.ocean_maps(
            self.h0, self.kx, self.ky, self.k_len, t,
            period=self.config.animation_period)
        maps = jnp.concatenate(
            [height[..., None] * self.config.height_scale, disp, grad],
            axis=-1).astype(jnp.float32)
        from ..ops.texture import build_mips
        levels = min(self.num_lods,
                     int(np.log2(self.config.fft_resolution)) + 1)
        return {"ocean-maps": build_mips(maps, levels)}

    # Vertex LOD count (quad_lod mip chain depth, ocean.cpp:208-213).
    num_lods = 6

    def displace(self, world_pos, world_normal, vertex_mask, maps,
                 camera_pos=None):
        """Vertex displacement + analytic normals from the gradient maps.

        world_pos: (V, 3); vertex_mask: (V,) bool for ocean vertices;
        maps: (L, N, N, 5) mip stack.  UVs derive from world xz
        (periodic tiling), matching heightmap_world_size addressing
        (ocean.cpp:411).

        camera_pos: when given, per-vertex distance selects the
        displacement mip (GPU grid LOD analogue): far vertices sample a
        box-filtered spectrum so sub-grid waves can't alias/shimmer,
        and trilinear lod blending geomorphs between levels (the
        reference's discrete patch LODs + edge stitching are replaced
        by a LOD that varies continuously across the surface — cracks
        are impossible by construction).
        """
        ws = self.config.world_size
        u = world_pos[:, 0] / ws + 0.5
        v = world_pos[:, 2] / ws + 0.5
        if camera_pos is not None:
            d = world_pos - camera_pos
            dist = jnp.sqrt(jnp.maximum((d * d).sum(-1), 1e-6))
            # LOD 0 holds until one displacement-map texel subtends less
            # than ~a pixel (texel size * ~1000 at 1080p / 60 deg fov),
            # doubling per level — LOD exists to stop sub-pixel waves
            # from shimmering, not to blur nearby detail.
            lod0 = ws / self.config.fft_resolution * 1000.0
            lod = jnp.clip(jnp.log2(jnp.maximum(dist / lod0, 1.0)), 0.0,
                           maps.shape[0] - 1.0)
            from ..ops.texture import sample_trilinear
            s = sample_trilinear(maps, u, v, lod, wrap=0)
        else:
            from ..ops.texture import sample_level
            s = sample_level(maps, u, v, jnp.int32(0), wrap=0)
        h = s[..., 0]
        dx = -self.config.lambda_disp * s[..., 1]
        dz = -self.config.lambda_disp * s[..., 2]
        grad = s[..., 3:5] * self.config.height_scale
        disp = jnp.stack([dx, h, dz], axis=-1)
        new_pos = world_pos + jnp.where(vertex_mask[:, None], disp, 0.0)
        n = jnp.stack([-grad[..., 0], jnp.ones_like(h), -grad[..., 1]],
                      axis=-1)
        n = n / jnp.sqrt((n * n).sum(-1, keepdims=True))
        new_nrm = jnp.where(vertex_mask[:, None], n, world_normal)
        return new_pos, new_nrm
