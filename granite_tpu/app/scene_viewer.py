"""SceneViewerApplication — the flagship viewer/benchmark app.

Reference: application/scene_viewer_application.cpp — loads a glTF scene +
config.json (~40 knobs, read_config at :164), builds the whole render graph
(bake_render_graph :1167-1318), and drives the frame flow (SURVEY.md §3.2).

Config keys match the reference's config.json schema (renderer, msaa,
directionalLightShadows, PCFKernelWide, hdrBloom, shadowMapResolution,
resolutionScale, postAA, ...).  Unsupported knobs are accepted and logged.

Run (config 2):
  python -m granite_tpu.app.scene_viewer --scene scene.gltf \
      --width 1280 --height 720 --frames 8 --png-path out.png
With no --scene a procedural test scene is used.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..graph import AttachmentInfo, Queue, RenderGraph, SizeClass
from ..ops.srgb import encode_rgba8
from ..renderer.render_context import RenderContext
from ..renderer.scene_renderer import (
    PackedScene, forward_shade, pack_scene, rasterize_scene,
    render_shadow_map, transform_vertices,
)
from ..ops.shadow import directional_shadow_matrix, shadow_uv_transform
from ..math.frustum import Frustum
from ..scene.camera import FPSCamera
from ..scene.scene import Scene
from ..scene.scene_formats import SceneInfo
from ..utils.logging import LOGI, LOGW
from .application import Application
from .headless import headless_main


@dataclass
class ViewerConfig:
    """config.json knobs (scene_viewer_application.cpp:164-300)."""
    renderer: str = "forward"                 # forward | deferred
    msaa: int = 1
    directional_light_shadows: bool = True
    pcf_kernel_wide: bool = False
    hdr_bloom: bool = True
    hdr_bloom_dynamic_exposure: bool = True
    shadow_map_resolution: float = 2048.0
    resolution_scale: float = 1.0
    post_aa: str = "none"
    lod_bias: float = 0.0
    unsupported: dict = field(default_factory=dict)

    @classmethod
    def from_json(cls, path: str) -> "ViewerConfig":
        cfg = cls()
        with open(path) as f:
            doc = json.load(f)
        mapping = {
            "renderer": "renderer",
            "msaa": "msaa",
            "directionalLightShadows": "directional_light_shadows",
            "PCFKernelWide": "pcf_kernel_wide",
            "hdrBloom": "hdr_bloom",
            "hdrBloomDynamicExposure": "hdr_bloom_dynamic_exposure",
            "shadowMapResolution": "shadow_map_resolution",
            "resolutionScale": "resolution_scale",
            "postAA": "post_aa",
            "lodBias": "lod_bias",
        }
        for k, v in doc.items():
            if k in mapping:
                setattr(cfg, mapping[k], v)
            else:
                cfg.unsupported[k] = v
                LOGW("config key '%s' not yet supported; ignored", k)
        return cfg


def build_default_test_scene() -> SceneInfo:
    """Procedural stand-in scene (no bundled assets in this environment):
    a floor plane, a ring of textured cubes and spheres — enough geometry
    and materials to exercise the forward path."""
    from ..scene.mesh_util import cube_mesh, plane_mesh, sphere_mesh
    from ..scene.scene_formats import MaterialData, NodeData
    from .triangle_demo import checkerboard

    info = SceneInfo()
    checker = (np.clip(checkerboard(256), 0, 1) * 255).astype(np.uint8)
    info.images = [checker]
    info.image_srgb = [True]
    info.materials = [
        MaterialData(name="floor", base_color_image=0, roughness_factor=0.8,
                     metallic_factor=0.0),
        MaterialData(name="red",
                     base_color_factor=np.array([0.8, 0.1, 0.1, 1],
                                                np.float32),
                     roughness_factor=0.35, metallic_factor=0.0),
        MaterialData(name="metal",
                     base_color_factor=np.array([0.9, 0.85, 0.4, 1],
                                                np.float32),
                     roughness_factor=0.25, metallic_factor=1.0),
    ]
    info.meshes = [plane_mesh(0, tiles=8.0), cube_mesh(1), sphere_mesh(24, 2)]
    root = NodeData(name="root")
    nodes = [root]
    floor = NodeData(name="floor", scale=np.array([12, 1, 12], np.float32),
                     meshes=[0])
    nodes.append(floor)
    rng = np.random.RandomState(7)
    for i in range(8):
        a = 2 * np.pi * i / 8
        kind = i % 2
        nd = NodeData(
            name=f"obj{i}",
            translation=np.array([5 * np.cos(a), 1.0, 5 * np.sin(a)],
                                 np.float32),
            rotation=np.array([np.cos(a / 2), 0, np.sin(a / 2), 0],
                              np.float32),
            scale=np.full(3, 0.7 + 0.3 * rng.rand(), np.float32),
            meshes=[1 + kind])
        nodes.append(nd)
    root.children = list(range(1, len(nodes)))
    info.nodes = nodes
    info.roots = [0]
    return info


class SceneViewerApplication(Application):
    @staticmethod
    def add_cli(parser) -> None:
        parser.add_argument("--scene", type=str, default=None,
                            help="glTF/GLB scene path")
        parser.add_argument("--config", type=str, default=None,
                            help="config.json path (reference schema)")
        parser.add_argument("--camera-index", type=int, default=-1)

    def __init__(self, args=None):
        super().__init__()
        self.config = (ViewerConfig.from_json(args.config)
                       if args and getattr(args, "config", None)
                       else ViewerConfig())
        if args and getattr(args, "scene", None):
            from ..scene.gltf import GLTFParser
            info = GLTFParser(args.scene).get_scene()
            LOGI("Loaded scene %s", args.scene)
        else:
            info = build_default_test_scene()
            LOGI("Using procedural test scene")
        self.info = info
        self.scene = self._build_runtime_scene(info)
        self.packed: PackedScene = pack_scene(info)
        self.context = RenderContext()
        self.camera = self._setup_camera(args)
        self.graph = RenderGraph()
        self._history = None
        self._sun_dir = np.array([0.35, 0.9, 0.25], np.float32)
        self._sun_dir /= np.linalg.norm(self._sun_dir)
        self._sun_color = np.array([3.0, 2.8, 2.5], np.float32)
        for nd, light_idx in ((n, n.light) for n in info.nodes
                              if n.light is not None):
            light = info.lights[light_idx]
            if light.type == 0:  # directional
                self._sun_color = light.color * light.intensity

    def _build_runtime_scene(self, info: SceneInfo) -> Scene:
        s = Scene()
        parent = {}
        for i, nd in enumerate(info.nodes):
            for c in nd.children:
                parent[c] = i
        for i, nd in enumerate(info.nodes):
            s.create_node(parent=parent.get(i, -1),
                          translation=nd.translation, rotation=nd.rotation,
                          scale=nd.scale)
        # register renderables for culling (object order must match
        # pack_scene's flattening: nodes in order, meshes per node)
        from ..scene.scene import (
            RENDERABLE_CASTS_SHADOW, RENDERABLE_OPAQUE,
        )
        for i, nd in enumerate(info.nodes):
            for mesh_idx in nd.meshes:
                md = info.meshes[mesh_idx]
                s.add_renderable(i, mesh_idx,
                                 RENDERABLE_OPAQUE | RENDERABLE_CASTS_SHADOW,
                                 md.aabb_min, md.aabb_max)
        s.update_transform_tree()
        return s

    def _setup_camera(self, args) -> FPSCamera:
        cam = FPSCamera()
        cam_index = getattr(args, "camera_index", -1) if args else -1
        if 0 <= cam_index < len(self.info.cameras):
            cd = self.info.cameras[cam_index]
            cam.set_fovy(cd.fovy)
            cam.set_depth_range(cd.znear, cd.zfar)
            if cd.node is not None:
                w = self.scene.world[cd.node]
                cam.position = w[:3, 3].copy()
                from ..math.transforms import decompose_trs
                _t, r, _s = decompose_trs(w)
                from ..math.muglm import quat_normalize
                cam.rotation = quat_normalize(
                    np.array([r[0], -r[1], -r[2], -r[3]], np.float32))
            return cam
        # frame the scene bounds
        self.scene.update_cached_transforms()
        if len(self.scene.r_world_min):
            mn = self.scene.r_world_min.min(axis=0)
            mx = self.scene.r_world_max.max(axis=0)
        else:
            mn, mx = np.full(3, -1.0), np.full(3, 1.0)
        center = 0.5 * (mn + mx)
        radius = max(0.5 * float(np.linalg.norm(mx - mn)), 1e-3)
        eye = center + np.array([0.6, 0.45, 0.9]) * radius * 1.2
        cam.look_at(eye, center)
        cam.set_depth_range(radius * 1e-3, 0.0)   # infinite far
        return cam

    # -- graph -----------------------------------------------------------------
    def swapchain_updated(self, width: int, height: int) -> None:
        super().swapchain_updated(width, height)
        self.camera.set_aspect(width / height)
        rw = max(int(width * self.config.resolution_scale), 1)
        rh = max(int(height * self.config.resolution_scale), 1)
        self._rw, self._rh = rw, rh
        g = self.graph
        g.reset()
        g.set_backbuffer_dimensions(width, height)
        shadow_res = int(self.config.shadow_map_resolution)
        use_shadow = self.config.directional_light_shadows

        if use_shadow:
            g.add_pass("shadow-main", Queue.GRAPHICS) \
                .add_external_input("world") \
                .add_depth_stencil_output(
                    "shadow-depth",
                    AttachmentInfo(SizeClass.ABSOLUTE, shadow_res,
                                   shadow_res, channels=1)) \
                .set_execute(self._shadow_pass)

        forward = g.add_pass("forward", Queue.GRAPHICS) \
            .add_external_input("world") \
            .add_external_input("normal_mats") \
            .add_color_output("hdr", AttachmentInfo(
                SizeClass.SWAPCHAIN_RELATIVE,
                self.config.resolution_scale,
                self.config.resolution_scale, channels=3))
        if use_shadow:
            forward.add_texture_input("shadow-depth")
        forward.set_execute(self._forward_pass)

        g.add_pass("tonemap", Queue.GRAPHICS) \
            .add_texture_input("hdr") \
            .add_color_output("backbuffer",
                              AttachmentInfo(channels=4, dtype=jnp.uint8)) \
            .set_execute(self._blit_pass)
        g.set_backbuffer_source("backbuffer")
        g.bake()
        g.log()
        self._history = g.initial_history()

    # -- passes ------------------------------------------------------------------
    def _shadow_pass(self, ctx):
        size = ctx.size("shadow-depth")[0]
        depth = render_shadow_map(
            self.packed, ctx.input("world"),
            ctx.params["shadow_vp"], size,
            ctx.params["shadow_object_mask"])
        return {"shadow-depth": depth}

    def _forward_pass(self, ctx):
        p = ctx.params
        clip, wpos, wnrm, wtan = transform_vertices(
            self.packed, ctx.input("world"), ctx.input("normal_mats"),
            p["view_proj"])
        setup, depth, tri = rasterize_scene(
            self.packed, clip, p["object_mask"], self._rw, self._rh)
        shadow_map = ctx.input("shadow-depth") \
            if self.config.directional_light_shadows else None
        color = forward_shade(
            self.packed, setup, depth, tri, wpos, wnrm, wtan, p,
            shadow_map=shadow_map,
            shadow_uv_mat=p.get("shadow_uv_mat"),
            width=self._rw, height=self._rh,
            background=jnp.array([0.1, 0.15, 0.25], jnp.float32),
            pcf_wide=self.config.pcf_kernel_wide)
        return {"hdr": color}

    def _blit_pass(self, ctx):
        hdr = ctx.input("hdr")
        h, w = ctx.backbuffer_size()
        if hdr.shape[:2] != (h, w):
            # nearest upscale for resolutionScale < 1 (scaler analogue)
            yi = (jnp.arange(h) * hdr.shape[0] // h)
            xi = (jnp.arange(w) * hdr.shape[1] // w)
            hdr = hdr[yi][:, xi]
        ldr = hdr / (1.0 + hdr)  # Reinhard placeholder until HDR chain lands
        return {"backbuffer": encode_rgba8(ldr)}

    # -- frame --------------------------------------------------------------------
    def render_frame(self, frame_time: float, elapsed_time: float):
        scene = self.scene
        scene.update_transform_tree()
        self.context.set_camera(self.camera)
        self.context.set_lighting(self._sun_dir, self._sun_color)

        # host-side culling -> per-object masks
        vis = scene.gather_visible_opaque_renderables(self.context.frustum)
        object_mask = np.zeros(self.packed.num_objects, bool)
        object_mask[vis] = True

        mn = scene.r_world_min.min(axis=0)
        mx = scene.r_world_max.max(axis=0)
        light_vp = directional_shadow_matrix(self._sun_dir, mn, mx)
        shadow_mask = np.zeros(self.packed.num_objects, bool)
        shadow_mask[scene.gather_visible_static_shadow_renderables(
            Frustum(light_vp))] = True
        shadow_mask[scene.gather_visible_dynamic_shadow_renderables(
            Frustum(light_vp))] = True

        n = scene.num_nodes
        world = scene.world[:n]
        nm = np.linalg.inv(world[:, :3, :3]).transpose(0, 2, 1).astype(
            np.float32)

        params = {
            "external": {"world": jnp.asarray(world),
                         "normal_mats": jnp.asarray(nm)},
            "view_proj": jnp.asarray(self.context.view_projection),
            "camera_pos": jnp.asarray(self.context.camera_pos),
            "sun_dir": jnp.asarray(self._sun_dir),
            "sun_color": jnp.asarray(self._sun_color),
            "object_mask": jnp.asarray(object_mask),
            "shadow_object_mask": jnp.asarray(shadow_mask),
            "shadow_vp": jnp.asarray(light_vp),
            "shadow_uv_mat": jnp.asarray(shadow_uv_transform(light_vp)),
        }
        out, self._history = self.graph.execute(params, self._history)
        return out


def main(argv=None) -> int:
    return headless_main(SceneViewerApplication, argv)


if __name__ == "__main__":
    raise SystemExit(main())
