"""Device-side packed scene + shading paths.

PackedScene is the analogue of the reference ResourceManager's global SoA
mesh pools (vulkan/managers/resource_manager.hpp:40-76 MeshBufferAllocator):
every mesh primitive is packed into ONE set of global vertex/index buffers,
with per-triangle material and object ids.  Per frame the whole scene is:

  1. vertex transform: world matrices gathered per vertex (node id),
     positions/normals transformed in two big einsums (MXU work);
  2. triangle setup + rasterize -> visibility buffer;
  3. deferred attribute interpolation + texture sampling + PBR lighting.

This replaces the reference's per-draw CommandBuffer path
(renderer/renderer.cpp:908 flush -> per-draw vkCmdDrawIndexed): there are
no draws, one fused dispatch shades everything.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.texture_array import (
    FLAT_NORMAL_TEXTURE, TextureArrayBuilder, WHITE_TEXTURE,
)
from ..ops import raster as R
from ..ops import texture as T
from ..ops.pbr import compute_lighting
from ..ops.shadow import sample_directional_shadow
from ..scene.scene_formats import ALPHA_MODE_BLEND, ALPHA_MODE_MASK, SceneInfo
from ..utils.logging import LOGI, LOGW


@dataclass
class PackedScene:
    # vertex SoA (static, object space)
    positions: jax.Array        # (V, 3) f32
    normals: jax.Array          # (V, 3)
    uvs: jax.Array              # (V, 2)
    tangents: jax.Array         # (V, 4)
    v_node: jax.Array           # (V,) i32 node id per vertex
    indices: jax.Array          # (Tri, 3) i32 global
    tri_material: jax.Array     # (Tri,) i32
    tri_object: jax.Array       # (Tri,) i32
    # material table
    mat_base_color: jax.Array   # (M, 4)
    mat_mr: jax.Array           # (M, 2) metallic, roughness
    mat_emissive: jax.Array     # (M, 3)
    mat_bundle: jax.Array       # (M,) i32 material texture-bundle index
    mat_alpha: jax.Array        # (M, 2) f32: mode, cutoff
    mat_two_sided: jax.Array    # (M,) i32
    # Material texture bundles: (B, HS-1, S, 60) f16 LOD strips holding
    # the 12 essential material channels
    # [base rgba | mr g,b | normal xyz | emissive rgb], 2x2-quad-packed
    # with a pre-filtered next-level parent tap — FULL (approximate
    # trilinear) material sampling costs ONE single-index gather
    # (ops/texture.build_packed_lod_strip_np; ~16-30 ms/gather at 1080p
    # is the dominant frame cost, so gather count is the lever).
    bundles: jax.Array
    # host-side object table (for culling)
    obj_node: np.ndarray        # (O,) node per object
    obj_aabb_min: np.ndarray    # (O, 3) object-space AABB
    obj_aabb_max: np.ndarray
    obj_flags: np.ndarray       # (O,) material-derived renderable flags
    num_objects: int
    num_nodes: int
    # skinning (SkinnedMesh path, renderer/mesh.hpp): vertices
    # [num_static_verts, V) use the joint-matrix palette instead of the
    # node transform.
    num_static_verts: int = 0
    v_joints: Optional[jax.Array] = None   # (Vskin, 4) palette indices
    v_weights: Optional[jax.Array] = None  # (Vskin, 4) f32
    # Morph targets (glTF primitive.targets; scene_formats.hpp weights):
    # vertices [morph_v0, morph_v0 + Vm) carry per-target deltas blended
    # by per-instance weights before node/skin transforms.
    morph_v0: int = -1
    morph_nodes: list = None               # host: node per morph instance
    morph_default_weights: np.ndarray = None   # host (NI, MT)
    v_morph_inst: Optional[jax.Array] = None   # (Vm,) i32 instance id
    morph_deltas: Optional[jax.Array] = None   # (Vm, MT, 3) pos deltas
    morph_normal_deltas: Optional[jax.Array] = None  # (Vm, MT, 3)
    # Shader-variant capability flags (ShaderSuite material-flag variant
    # resolution, renderer/shader_suite.hpp:72): texture fetches for
    # capabilities no material uses are compiled out of the trace.
    has_normal_maps: bool = True
    has_mr_textures: bool = True
    has_emissive: bool = True
    scene_aabb_min: np.ndarray = None
    scene_aabb_max: np.ndarray = None
    # Host-side streaming manager when texture_streaming is on
    # (assets/streaming.TextureStreamer); None for the eager path.
    streamer: object = None

    # Tile-rect sampler strips (ops/tile_sampler): lane-tiled bf16 mip
    # strips + coarse fallback block; static meta tuple
    # (yr_off, size, channels, levels, coarse_level).  None -> classic
    # XLA gather path.
    bundles_tiled_strip: Optional[jax.Array] = None
    bundles_tiled_coarse: Optional[jax.Array] = None
    tiled_meta: Optional[tuple] = None

    DEVICE_FIELDS = ("positions", "normals", "uvs", "tangents", "v_node",
                     "indices", "tri_material", "tri_object",
                     "mat_base_color", "mat_mr", "mat_emissive",
                     "mat_bundle", "mat_alpha", "mat_two_sided",
                     "bundles", "v_joints", "v_weights", "v_morph_inst",
                     "morph_deltas", "morph_normal_deltas",
                     "bundles_tiled_strip", "bundles_tiled_coarse")

    def device_arrays(self) -> dict:
        """The jax.Array fields as a params pytree.

        Passing scene buffers as jit ARGUMENTS instead of closure
        constants keeps them out of the serialized executable (the axon
        remote-compile request has a hard size limit, and constants the
        size of a texture-bundle array make compiles minutes slower) and
        lets the streaming path swap bundle contents without a retrace.
        """
        return {f: getattr(self, f) for f in self.DEVICE_FIELDS
                if getattr(self, f) is not None}

    def with_arrays(self, arrays: dict) -> "PackedScene":
        """Shallow copy with device fields replaced (trace-time use)."""
        import dataclasses
        return dataclasses.replace(self, **arrays)


def material_bundle_plan(mat_tex: np.ndarray):
    """Dedupe materials by their (base, mr, normal, emissive) texture
    tuple.  Returns (mat_bundle (M,) int32, bundle_keys list of
    4-tuples of texture indices) — shared by the eager pack path and the
    streaming path (assets/streaming.py)."""
    bundle_of: dict = {}
    bundle_keys: list = []
    M = mat_tex.shape[0]
    mat_bundle = np.zeros(M, np.int32)
    for i in range(M):
        key = tuple(int(t) for t in mat_tex[i])
        if key not in bundle_of:
            bundle_of[key] = len(bundle_keys)
            bundle_keys.append(key)
        mat_bundle[i] = bundle_of[key]
    return mat_bundle, bundle_keys


MATERIAL_CHANNELS = 12   # base rgba | mr g,b | normal xyz | emissive rgb


def pack_material_channels(images_rgba: list) -> np.ndarray:
    """4 linear (S, S, 4) images [base, mr, normal, emissive] -> the 12
    essential channels (glTF uses mr.G=roughness, mr.B=metallic; normal
    and emissive alpha are dead weight — payload bytes are gather cost)."""
    base, mr, normal, emissive = images_rgba
    return np.concatenate([base[..., 0:4], mr[..., 1:3],
                           normal[..., 0:3], emissive[..., 0:3]], axis=-1)


def build_bundle_strip(images_rgba: list) -> np.ndarray:
    """4 material images -> one 60-channel LOD strip (f16): quad-packed
    12 channels + pre-filtered parent tap (one-gather trilinear)."""
    from ..ops.texture import build_packed_lod_strip_np
    return build_packed_lod_strip_np(pack_material_channels(images_rgba))


def pack_scene(info: SceneInfo, node_of_instance=None,
               texture_size: int = 512, texture_streaming: bool = False,
               texture_budget=None,
               tile_sampler: bool = False) -> PackedScene:
    """Flatten SceneInfo into global device buffers.

    Each (node, mesh-primitive) pair becomes an object.  node_of_instance
    optionally remaps SceneInfo node indices to runtime Scene node indices
    (they match when the Scene was built 1:1 from the SceneInfo).

    texture_streaming: defer texture decode to the AssetManager flow
    (assets/streaming.py) — bundles start as fallbacks and latch in as
    images become resident under texture_budget bytes (SURVEY §3.4).
    """
    from ..assets.texture_array import NUM_BUILTIN_TEXTURES
    tb = None
    if texture_streaming:
        # Texture ids assigned without decoding; the streamer owns decode.
        img_to_tex = {i: NUM_BUILTIN_TEXTURES + i
                      for i in range(len(info.images))}
    else:
        tb = TextureArrayBuilder(texture_size)
        img_to_tex = {}
        for i, img in enumerate(info.images):
            img_to_tex[i] = tb.add_image(img, info.image_srgb[i])

    def tex_of(img_idx, fallback):
        return img_to_tex.get(img_idx, fallback) if img_idx is not None \
            else fallback

    M = max(len(info.materials), 1)
    mat_base = np.ones((M, 4), np.float32)
    mat_mr = np.ones((M, 2), np.float32) * np.array([[0.0, 1.0]], np.float32)
    mat_emissive = np.zeros((M, 3), np.float32)
    mat_tex = np.zeros((M, 4), np.int32)
    mat_tex[:, 0] = WHITE_TEXTURE
    mat_tex[:, 1] = WHITE_TEXTURE
    mat_tex[:, 2] = FLAT_NORMAL_TEXTURE
    mat_tex[:, 3] = WHITE_TEXTURE
    mat_alpha = np.zeros((M, 2), np.float32)
    mat_alpha[:, 1] = 0.5
    mat_two_sided = np.zeros(M, np.int32)
    for i, m in enumerate(info.materials):
        mat_base[i] = m.base_color_factor
        mat_mr[i] = [m.metallic_factor, m.roughness_factor]
        mat_emissive[i] = m.emissive_factor
        mat_tex[i] = [tex_of(m.base_color_image, WHITE_TEXTURE),
                      tex_of(m.metallic_roughness_image, WHITE_TEXTURE),
                      tex_of(m.normal_image, FLAT_NORMAL_TEXTURE),
                      tex_of(m.emissive_image, WHITE_TEXTURE)]
        mat_alpha[i] = [float(m.alpha_mode), m.alpha_cutoff]
        mat_two_sided[i] = int(m.two_sided)

    # Material texture bundles: dedupe by (base, mr, normal, emissive)
    # texture tuple; interleave the four RGBA images channel-wise into one
    # 16-channel quad-packed gutter strip per bundle — full trilinear
    # sampling of all four material textures is then TWO single-index
    # gathers per pixel instead of 32 (ops/texture.py gather economics).
    mat_bundle, bundle_keys = material_bundle_plan(mat_tex)
    streamer = None
    if texture_streaming:
        from ..assets.streaming import TextureStreamer
        tex_to_image = {NUM_BUILTIN_TEXTURES + i: i
                        for i in range(len(info.images))}
        streamer = TextureStreamer(info, mat_tex, bundle_keys,
                                   tex_to_image, texture_size,
                                   budget_bytes=texture_budget)
        bundles = streamer.initial_bundles()
    else:
        bundle_strips = [build_bundle_strip(
            [tb._images[t] for t in key]) for key in bundle_keys]
        bundles = np.stack(bundle_strips)

    tiled = None
    if tile_sampler and streamer is None:
        from ..ops.tile_sampler import MAX_S, build_tiled_strips_np
        S0 = tb.base_size if tb is not None else texture_size
        if S0 <= MAX_S and len(bundle_keys) <= 8:
            tiled = build_tiled_strips_np([
                pack_material_channels([tb._images[t] for t in key])
                for key in bundle_keys])
        else:
            LOGW("tile sampler disabled: S=%d bundles=%d exceed the "
                 "VMEM-rect limits (classic gather path used)", S0,
                 len(bundle_keys))

    pos_l, nrm_l, uv_l, tan_l, vnode_l = [], [], [], [], []
    idx_l, trimat_l, triobj_l = [], [], []
    obj_node, obj_min, obj_max, obj_flags = [], [], [], []
    joints_l, weights_l = [], []
    v_off = 0
    num_nodes = len(info.nodes)

    from ..scene.scene import (
        RENDERABLE_CASTS_SHADOW, RENDERABLE_DYNAMIC, RENDERABLE_OPAQUE,
        RENDERABLE_TRANSPARENT,
    )

    # Skin palette layout: skins packed back to back, joint j of skin s
    # lives at palette index skin_offsets[s] + j.
    skin_offsets = []
    off = 0
    for sk in info.skins:
        skin_offsets.append(off)
        off += len(sk.joints)

    # Vertex-range blocks: plain | morph-only | morph+skin | skin-only —
    # both the morph range and the skin range stay contiguous.
    instances = []
    for node_idx, nd in enumerate(info.nodes):
        for mesh_idx in nd.meshes:
            md = info.meshes[mesh_idx]
            skinned = nd.skin is not None and md.joints is not None
            morphed = md.morph_position_deltas is not None
            block = (1 if morphed and not skinned else
                     2 if morphed and skinned else
                     3 if skinned else 0)
            instances.append((block, node_idx, md, nd))
    instances.sort(key=lambda x: x[0])

    # Global morph-target slot count (pad per-mesh target lists).
    mt_max = max((len(md.morph_position_deltas)
                  for _b, _n, md, _nd in instances
                  if md.morph_position_deltas is not None), default=0)
    morph_v0 = -1
    v_morph_inst_l, morph_pos_l, morph_nrm_l = [], [], []
    morph_nodes, morph_defaults = [], []
    any_morph_nrm = any(
        md.morph_normal_deltas is not None
        for _b, _n, md, _nd in instances)

    num_static_verts = 0
    for block, node_idx, md, nd in instances:
        skinned = block in (2, 3)
        rt_node = node_of_instance[node_idx] if node_of_instance else node_idx
        if md.encoding == "meshlet" and md.positions is None:
            # MeshEncoding::MeshletDecoded (resource_manager.hpp:85-92):
            # MLT2 streams materialize to SoA at instantiation.
            md.decode_meshlets()
        v = len(md.positions)
        t = len(md.indices)
        pos_l.append(md.positions)
        nrm_l.append(md.normals)
        uv_l.append(md.uvs)
        tan_l.append(md.tangents)
        vnode_l.append(np.full(v, rt_node, np.int32))
        idx_l.append(md.indices + v_off)
        mat = max(md.material, 0)
        trimat_l.append(np.full(t, mat, np.int32))
        obj_id = len(obj_node)
        triobj_l.append(np.full(t, obj_id, np.int32))
        obj_node.append(rt_node)
        obj_min.append(md.aabb_min)
        obj_max.append(md.aabb_max)
        mode = info.materials[mat].alpha_mode if info.materials else 0
        flags = RENDERABLE_CASTS_SHADOW | (
            RENDERABLE_TRANSPARENT if mode == ALPHA_MODE_BLEND
            else RENDERABLE_OPAQUE)
        if skinned:
            flags |= RENDERABLE_DYNAMIC
            joints_l.append(md.joints + skin_offsets[nd.skin])
            w = md.weights if md.weights is not None else \
                np.tile(np.array([1, 0, 0, 0], np.float32), (v, 1))
            ws = w.sum(axis=1, keepdims=True)
            weights_l.append((w / np.maximum(ws, 1e-9)).astype(np.float32))
        else:
            num_static_verts += v
        if block in (1, 2):
            flags |= RENDERABLE_DYNAMIC
            if morph_v0 < 0:
                morph_v0 = v_off
            inst_id = len(morph_nodes)
            morph_nodes.append(rt_node)
            dw = np.zeros(mt_max, np.float32)
            defaults = nd.morph_weights if nd.morph_weights is not None \
                else md.default_morph_weights
            if defaults is not None:
                dw[:len(defaults)] = defaults
            morph_defaults.append(dw)
            v_morph_inst_l.append(np.full(v, inst_id, np.int32))
            dp = np.zeros((v, mt_max, 3), np.float32)
            for ti, d in enumerate(md.morph_position_deltas):
                dp[:, ti] = d
            morph_pos_l.append(dp)
            if any_morph_nrm:
                dn = np.zeros((v, mt_max, 3), np.float32)
                if md.morph_normal_deltas is not None:
                    for ti, d in enumerate(md.morph_normal_deltas):
                        dn[:, ti] = d
                morph_nrm_l.append(dn)
        obj_flags.append(flags)
        v_off += v

    if not pos_l:
        raise ValueError("scene has no mesh instances")

    positions = np.concatenate(pos_l)

    ps = PackedScene(
        positions=jnp.asarray(positions),
        normals=jnp.asarray(np.concatenate(nrm_l)),
        uvs=jnp.asarray(np.concatenate(uv_l)),
        tangents=jnp.asarray(np.concatenate(tan_l)),
        v_node=jnp.asarray(np.concatenate(vnode_l)),
        indices=jnp.asarray(np.concatenate(idx_l)),
        tri_material=jnp.asarray(np.concatenate(trimat_l)),
        tri_object=jnp.asarray(np.concatenate(triobj_l)),
        mat_base_color=jnp.asarray(mat_base),
        mat_mr=jnp.asarray(mat_mr),
        mat_emissive=jnp.asarray(mat_emissive),
        mat_bundle=jnp.asarray(mat_bundle),
        streamer=streamer,
        mat_alpha=jnp.asarray(mat_alpha),
        mat_two_sided=jnp.asarray(mat_two_sided),
        bundles=jnp.asarray(bundles),
        obj_node=np.asarray(obj_node, np.int32),
        obj_aabb_min=np.asarray(obj_min, np.float32),
        obj_aabb_max=np.asarray(obj_max, np.float32),
        obj_flags=np.asarray(obj_flags, np.int32),
        num_objects=len(obj_node),
        num_nodes=num_nodes,
        num_static_verts=num_static_verts,
        v_joints=(jnp.asarray(np.concatenate(joints_l))
                  if joints_l else None),
        v_weights=(jnp.asarray(np.concatenate(weights_l))
                   if weights_l else None),
        morph_v0=morph_v0,
        morph_nodes=morph_nodes,
        morph_default_weights=(np.stack(morph_defaults)
                               if morph_defaults else None),
        v_morph_inst=(jnp.asarray(np.concatenate(v_morph_inst_l))
                      if v_morph_inst_l else None),
        morph_deltas=(jnp.asarray(np.concatenate(morph_pos_l))
                      if morph_pos_l else None),
        morph_normal_deltas=(jnp.asarray(np.concatenate(morph_nrm_l))
                             if morph_nrm_l else None),
        has_normal_maps=any(m.normal_image is not None
                            for m in info.materials),
        has_mr_textures=any(m.metallic_roughness_image is not None
                            for m in info.materials),
        has_emissive=any(m.emissive_image is not None
                         or np.any(m.emissive_factor)
                         for m in info.materials),
        bundles_tiled_strip=(tiled.strip if tiled is not None else None),
        bundles_tiled_coarse=(tiled.coarse if tiled is not None
                              else None),
        tiled_meta=((tiled.yr_off, tiled.size, tiled.channels,
                     tiled.levels, tiled.coarse_level)
                    if tiled is not None else None),
    )
    LOGI("PackedScene: %d verts, %d tris, %d objects, %d materials, "
         "%d textures%s, %d bundles (%.1f MB f16)", len(positions),
         len(ps.indices), ps.num_objects, M,
         len(tb._images) if tb is not None else len(info.images),
         " (streaming)" if streamer is not None else "",
         len(bundle_keys), ps.bundles.nbytes / 2**20)
    return ps


# ---------------------------------------------------------------------------
# Device-side frame stages (called from graph pass execute fns).
# ---------------------------------------------------------------------------

def apply_morphs(scene: PackedScene, positions, normals=None,
                 morph_weights=None):
    """Blend morph-target deltas into the vertex range [morph_v0, ..)
    (glTF: morph before skin/node transforms).  morph_weights: (NI, MT)
    per-instance weights (params-borne, animated per frame)."""
    if scene.morph_deltas is None or morph_weights is None:
        return positions, normals
    m0 = scene.morph_v0
    vm = scene.morph_deltas.shape[0]
    w = morph_weights[scene.v_morph_inst]          # (Vm, MT)
    dp = (scene.morph_deltas * w[..., None]).sum(1)
    positions = jnp.concatenate(
        [positions[:m0], positions[m0:m0 + vm] + dp, positions[m0 + vm:]])
    if normals is not None and scene.morph_normal_deltas is not None:
        dn = (scene.morph_normal_deltas * w[..., None]).sum(1)
        normals = jnp.concatenate(
            [normals[:m0], normals[m0:m0 + vm] + dn, normals[m0 + vm:]])
    return positions, normals


def transform_vertices(scene: PackedScene, world, normal_mats, view_proj,
                       displace_fn=None, skin_palette=None,
                       morph_weights=None):
    """Per-vertex node-matrix gather + transform.

    world: (N, 4, 4); normal_mats: (N, 3, 3); view_proj: (4, 4).
    Returns (clip (V,4), world_pos (V,3), world_normal (V,3),
             world_tangent (V,4)).
    This replaces static_mesh.vert's per-draw uniforms: ALL meshes transform
    in one batched gather+einsum (the MXU-shaped hot path).

    displace_fn(world_pos, world_normal) -> (pos, normal): procedural
    vertex displacement hook (ocean/terrain heightfields; the analogue of
    ocean.vert's heightmap fetch) applied before projection.
    """
    wm = world[scene.v_node]                          # (V, 4, 4)
    p, base_normals = apply_morphs(scene, scene.positions, scene.normals,
                                   morph_weights)
    world_pos = jnp.einsum("vij,vj->vi", wm[:, :3, :3], p) + wm[:, :3, 3]
    nm = normal_mats[scene.v_node]
    world_normal = jnp.einsum("vij,vj->vi", nm, base_normals)
    if scene.v_joints is not None and skin_palette is not None:
        # Skinned tail segment: blend joint matrices from the palette
        # (SkinnedMesh path; skin matrices already map bind -> world).
        vs = scene.num_static_verts
        sp = p[vs:]
        sn = base_normals[vs:]
        pm = skin_palette[scene.v_joints]              # (Vsk, 4, 4, 4)
        w = scene.v_weights[..., None, None]
        blended = (pm * w).sum(axis=1)                 # (Vsk, 4, 4)
        spos = jnp.einsum("vij,vj->vi", blended[:, :3, :3], sp) \
            + blended[:, :3, 3]
        snrm = jnp.einsum("vij,vj->vi", blended[:, :3, :3], sn)
        world_pos = jnp.concatenate([world_pos[:vs], spos])
        world_normal = jnp.concatenate([world_normal[:vs], snrm])
    if displace_fn is not None:
        world_pos, world_normal = displace_fn(world_pos, world_normal)
    clip = world_pos @ view_proj[:3, :3].T + view_proj[:3, 3]
    clip_w = world_pos @ view_proj[3, :3].T + view_proj[3, 3]
    clip = jnp.concatenate([clip, clip_w[:, None]], axis=1)
    world_tan = jnp.einsum("vij,vj->vi", wm[:, :3, :3],
                           scene.tangents[:, :3])
    world_tangent = jnp.concatenate([world_tan, scene.tangents[:, 3:4]],
                                    axis=1)
    return clip, world_pos, world_normal, world_tangent


def rasterize_scene(scene: PackedScene, clip, object_mask, width: int,
                    height: int, cull_mode: int = R.CULL_BACK,
                    use_binned: Optional[bool] = None):
    """Setup + per-object visibility + rasterize -> visibility buffer.

    use_binned: None = auto (binned Pallas path on TPU, chunked-scan on
    CPU where interpret-mode Pallas would be slower than the scan)."""
    setup = R.setup_triangles(clip, scene.indices, width, height,
                              cull_mode=cull_mode)
    tri_visible = object_mask[scene.tri_object]
    setup = setup._replace(valid=setup.valid & tri_visible)
    if use_binned is None:
        use_binned = jax.default_backend() != "cpu"
    if use_binned:
        from .raster_dispatch import rasterize_binned_checked
        depth, tri = rasterize_binned_checked(setup, width, height)
    else:
        depth, tri = R.rasterize(setup, width, height)
    return setup, depth, tri


def surface_attributes(scene: PackedScene, setup, tri, world_pos,
                       world_normal, world_tangent, width: int, height: int,
                       lod_bias: float = 0.0, prev_world_pos=None,
                       bundles=None, material_textures: bool = True):
    """Visibility-buffer resolve: material gathers + texture sampling +
    normal mapping.  Shared by the forward path (static_mesh.frag) and
    the deferred G-buffer pass (static_mesh.frag DEFERRED variant).

    prev_world_pos: optional (V, 3) LAST-frame world positions — rides
    the same packed-row gather (zero extra gather passes) and yields
    surf["prev_pos"] for per-object motion vectors
    (assets/shaders/reconstruct_mv.frag analogue).

    bundles: optional override of scene.bundles — the texture-streaming
    path updates the device bundle array per frame (params-borne so no
    retrace; assets/streaming.py).

    Returns dict: pos, normal, base_color, metallic, roughness, emissive,
    covered [, prev_pos].
    """
    if bundles is None:
        bundles = scene.bundles
    px, py = R.pixel_centers(width, height)
    covered = tri >= 0

    # TPU gather economics: ~3ns per gathered ROW regardless of width, so
    # the resolve packs EVERYTHING a pixel needs from its triangle into
    # one wide per-triangle row, built with triangle-count gathers
    # (T*3 corner rows), then fetched with a single pixel-count gather:
    #   [adj 9 | offset 2 | corner attrs 3x12 | material factors...]
    # This replaces 5+ separate pixel-count gather passes.
    T_ = scene.indices.shape[0]
    attrs = [world_pos, world_normal, world_tangent, scene.uvs]   # 12
    if prev_world_pos is not None:
        attrs.append(prev_world_pos)                              # +3
    vattrs = jnp.concatenate(attrs, axis=1)               # (V, A)
    A = vattrs.shape[1]
    corner = vattrs[scene.indices].reshape(T_, 3 * A)     # (T,3) row gather
    mat_of_tri = scene.tri_material                       # (T,)
    tri_pack = jnp.concatenate([
        setup.adj.reshape(T_, 9),
        setup.offset,                                     # 2
        corner,                                           # 3A
        scene.mat_base_color[mat_of_tri],                 # 4
        scene.mat_mr[mat_of_tri],                         # 2
        scene.mat_bundle[mat_of_tri].astype(jnp.float32)[:, None],  # 1
        scene.mat_emissive[mat_of_tri],                   # 3
    ], axis=1)                                            # (T, 21+3A)

    t = jnp.maximum(tri, 0)
    row = tri_pack[t]                                     # (H, W, 21+3A)
    adj = row[..., 0:9].reshape(row.shape[:-1] + (3, 3))
    off = row[..., 9:11]
    m0 = 11 + 3 * A
    av = row[..., 11:m0].reshape(row.shape[:-1] + (3, A))

    # Perspective-correct interpolation + analytic screen derivatives
    # (see ops/raster.interpolate_with_derivs for the math).
    rx = (px - off[..., 0])[..., None]
    ry = (py - off[..., 1])[..., None]
    lam = adj[..., 0] * rx + adj[..., 1] * ry + adj[..., 2]
    D = lam.sum(-1)
    Dx = adj[..., 0].sum(-1)
    Dy = adj[..., 1].sum(-1)
    N = (av * lam[..., None]).sum(-2)
    Nx = (av * adj[..., 0][..., None]).sum(-2)
    Ny = (av * adj[..., 1][..., None]).sum(-2)
    D = jnp.where(jnp.abs(D) < 1e-20, 1e-20, D)[..., None]
    vals = N / D
    ddx = (Nx - vals * Dx[..., None]) / D
    ddy = (Ny - vals * Dy[..., None]) / D

    pos = vals[..., 0:3]
    nrm = vals[..., 3:6]
    tan = vals[..., 6:10]
    uv = vals[..., 10:12]
    duvdx = ddx[..., 10:12]
    duvdy = ddy[..., 10:12]

    return _material_shade_tail(
        scene, bundles, pos=pos, nrm=nrm, tan=tan, uv=uv,
        duvdx=duvdx, duvdy=duvdy,
        base_factor=row[..., m0:m0 + 4],
        mr_factor=row[..., m0 + 4:m0 + 6],
        bundle_id=row[..., m0 + 6].astype(jnp.int32),
        emissive_factor=row[..., m0 + 7:m0 + 10],
        covered=covered, lod_bias=lod_bias,
        prev_pos=(vals[..., 12:15] if prev_world_pos is not None
                  else None),
        textures=material_textures)


def _material_shade_tail(scene, bundles, pos, nrm, tan, uv, duvdx, duvdy,
                         base_factor, mr_factor, bundle_id,
                         emissive_factor, covered, lod_bias, prev_pos=None,
                         textures: bool = True):
    """Texture fetch + normal mapping tail shared by the classic resolve
    and the fused-kernel plane path.

    When the scene carries tile-rect strips (ops/tile_sampler) and the
    streaming override isn't active, the fetch runs through the Pallas
    tile sampler (rect DMA + one-hot MXU fetch) instead of the per-pixel
    XLA gather — same quad+parent trilinear, ~6x cheaper at 1080p.

    textures=False (materialTextures knob): factor-only materials — no
    texture fetch, no normal mapping.  A quality tier AND the in-context
    probe for the material rung of the frame ladder (tools/frame_probe)."""
    if not textures:
        n = _normalize(nrm)
        emissive = (emissive_factor if scene.has_emissive
                    else jnp.zeros_like(base_factor[..., :3]))
        out = {"pos": pos, "normal": n,
               "base_color": base_factor[..., :3],
               "metallic": mr_factor[..., 0],
               "roughness": mr_factor[..., 1],
               "emissive": emissive, "covered": covered,
               "alpha": base_factor[..., 3]}
        if prev_pos is not None:
            out["prev_pos"] = prev_pos
        return out
    use_tiled = (scene.bundles_tiled_strip is not None
                 and bundles is scene.bundles)
    S = scene.tiled_meta[1] if use_tiled else bundles.shape[2]
    lod = T.lod_from_derivs(duvdx[..., 0], duvdx[..., 1],
                            duvdy[..., 0], duvdy[..., 1], S, S,
                            bias=lod_bias)
    u, v = uv[..., 0], uv[..., 1]
    if use_tiled:
        from ..ops.tile_sampler import TiledStrips, sample_tiled
        yr_off, size, ch, levels, cl = scene.tiled_meta
        strips = TiledStrips(
            strip=scene.bundles_tiled_strip,
            coarse=scene.bundles_tiled_coarse,
            yr_off=yr_off, size=size, channels=ch, levels=levels,
            coarse_level=cl)
        bnd = jnp.where(covered, bundle_id, -1)
        tex = sample_tiled(strips, u, v, lod, bnd)
    else:
        tex = T.sample_packed_lod(bundles, bundle_id, u, v, lod,
                                  MATERIAL_CHANNELS)
    base_tex = tex[..., 0:4]
    base_color = base_factor[..., :3] * base_tex[..., :3]
    if scene.has_mr_textures:
        metallic = mr_factor[..., 0] * tex[..., 5]
        roughness = mr_factor[..., 1] * tex[..., 4]
    else:
        metallic = mr_factor[..., 0]
        roughness = mr_factor[..., 1]
    n = _normalize(nrm)
    if scene.has_normal_maps:
        t3 = _normalize(tan[..., :3])
        b = jnp.cross(n, t3) * tan[..., 3:4]
        tn = tex[..., 6:9] * 2.0 - 1.0
        n_mapped = _normalize(tn[..., 0:1] * t3 + tn[..., 1:2] * b
                              + tn[..., 2:3] * n)
    else:
        n_mapped = n
    if scene.has_emissive:
        emissive = emissive_factor * tex[..., 9:12]
    else:
        emissive = jnp.zeros_like(base_color)
    alpha = base_factor[..., 3] * base_tex[..., 3]
    out = {"pos": pos, "normal": n_mapped, "base_color": base_color,
           "metallic": metallic, "roughness": roughness,
           "emissive": emissive, "covered": covered, "alpha": alpha}
    if prev_pos is not None:
        out["prev_pos"] = prev_pos
    return out


def fused_raster_surface(scene: PackedScene, clip, object_mask,
                         world_pos, world_normal, world_tangent,
                         width: int, height: int, lod_bias: float = 0.0,
                         prev_world_pos=None, bundles=None,
                         interpret=None, max_visible: int | None = None,
                         material_textures: bool = True,
                         bin_plan=None, future_clip_fn=None):
    """Raster + resolve through the fused Pallas mega-kernel
    (ops/raster_fused.py): zero per-pixel HBM gathers until the texture
    fetch.  Returns (surf dict, depth), plus plan_out when a
    raster_binned.BinPlan is passed (cached-binning path).

    future_clip_fn: nullary -> clip positions under the predicted
    future camera (traced only inside the re-bin branch)."""
    from ..ops.raster_fused import (
        PLANE_BASE, PLANE_BUNDLE, PLANE_COVERED, PLANE_DEPTH,
        PLANE_DUVDX, PLANE_DUVDY, PLANE_EMISSIVE, PLANE_MR, PLANE_NRM,
        PLANE_POS, PLANE_PREV, PLANE_TAN, PLANE_UV,
        build_resolve_extra, rasterize_resolve,
    )
    if bundles is None:
        bundles = scene.bundles
    setup = R.setup_triangles(clip, scene.indices, width, height)
    tri_visible = object_mask[scene.tri_object]
    setup = setup._replace(valid=setup.valid & tri_visible)
    extra = build_resolve_extra(scene, world_pos, world_normal,
                                world_tangent, prev_world_pos)
    # Large tile grids (2048^2-class targets, >512 tiles) killed the TPU
    # worker with the default emit window (too much spilled to the
    # shared huge list); the wide window that keeps 2048^2 shadow maps
    # alive (render_shadow_map) applies the same medicine here.
    from ..ops.raster_binned import SPAN_H, SPAN_W, TILE_H, TILE_W
    ntiles = (-(-width // TILE_W)) * (-(-height // TILE_H))
    span_w, span_h = (2, 8) if ntiles > 512 else (SPAN_W, SPAN_H)
    future_fn = None
    if bin_plan is not None and future_clip_fn is not None:
        def future_fn():
            s_f = R.setup_triangles(future_clip_fn(), scene.indices,
                                    width, height)
            return s_f.valid & tri_visible, s_f.bbox
    out = rasterize_resolve(setup, extra, width, height,
                            interpret=interpret,
                            span_w=span_w, span_h=span_h,
                            has_prev=prev_world_pos is not None,
                            max_visible=max_visible,
                            plan=bin_plan, future_fn=future_fn)
    plan_out = None
    if bin_plan is not None:
        planes, plan_out = out
    else:
        planes = out

    def ch(base, n):
        return jnp.moveaxis(planes[base:base + n], 0, -1)

    surf = _material_shade_tail(
        scene, bundles,
        pos=ch(PLANE_POS, 3), nrm=ch(PLANE_NRM, 3),
        tan=ch(PLANE_TAN, 4), uv=ch(PLANE_UV, 2),
        duvdx=ch(PLANE_DUVDX, 2), duvdy=ch(PLANE_DUVDY, 2),
        base_factor=ch(PLANE_BASE, 4), mr_factor=ch(PLANE_MR, 2),
        bundle_id=planes[PLANE_BUNDLE].astype(jnp.int32),
        emissive_factor=ch(PLANE_EMISSIVE, 3),
        covered=planes[PLANE_COVERED] > 0.5, lod_bias=lod_bias,
        prev_pos=(ch(PLANE_PREV, 3) if prev_world_pos is not None
                  else None),
        textures=material_textures)
    if bin_plan is not None:
        return surf, planes[PLANE_DEPTH], plan_out
    return surf, planes[PLANE_DEPTH]


def compute_shadow_term(pos, covered, shadow_map, shadow_uv_mat,
                        pcf_wide: bool = False,
                        shadow_tiled: bool = False, shadow_strips=None,
                        shadow_half_res: bool = False):
    """Directional shadow term for every pixel — PCF / wide-PCF / VSM /
    tiled-VSM / cascades (lighting_resources.h get_directional_shadow_
    term; shared by the classic and fused shade paths)."""
    if shadow_map is None:
        return 1.0
    if shadow_map.ndim == 3 and shadow_map.shape[-1] == 2:
        # (S, S, 2) VSM moments (vsm.h path).
        if shadow_tiled:
            # Pallas tile-rect moment fetch (ops/tile_sampler):
            # ~16 ms XLA gather -> ~1-2 ms rect DMA + weighted
            # one-hot matmul; bit-exact where tiles fit at level 0.
            # shadow_strips: strip prebaked with the static shadow
            # cache (rebuilding ~300 MB of strip per frame costs
            # more than the fetch saves).
            from ..ops.shadow import sample_vsm_shadow_tiled
            return sample_vsm_shadow_tiled(
                shadow_map, shadow_uv_mat, pos, covered,
                strips=shadow_strips)
        from ..ops.shadow import sample_vsm_shadow
        return sample_vsm_shadow(shadow_map, shadow_uv_mat, pos)
    if shadow_map.ndim == 3:
        # (C, S, S) cascades with (C, 4, 4) uv transforms.
        from ..ops.shadow import sample_cascaded_shadow
        return sample_cascaded_shadow(
            shadow_map, shadow_uv_mat, pos, wide=pcf_wide)
    if shadow_half_res and pos.shape[0] % 2 == 0 and \
            pos.shape[1] % 2 == 0 and pos.shape[0] >= 64:
        # PCF term at half res + bilinear term upsample: the gather
        # cost is linear in pixel count (~16 ms at 1080p, the
        # per-index DMA floor), and the 2x2 PCF term is already a
        # bilinear blend, so upsampling the term loses little.
        from ..ops.hdr import resize_bilinear
        th = sample_directional_shadow(
            shadow_map, shadow_uv_mat, pos[::2, ::2], wide=pcf_wide)
        return resize_bilinear(
            th[..., None], pos.shape[0], pos.shape[1])[..., 0]
    return sample_directional_shadow(
        shadow_map, shadow_uv_mat, pos, wide=pcf_wide)


def compute_env_products(surf, params, env, width: int, height: int,
                         background, vol_diffuse=None):
    """Gather-bound environment products for the fused shade kernel:
    (irradiance (H,W,3) with the lambert 1/pi pre-applied, spec_env
    (H,W,3), background (H,W,3)) — the same fetch paths shade_surface
    uses inline (SH/GI diffuse, prefiltered specular, sky)."""
    from ..ops.pbr import _normalize as _nrm
    from .environment import eval_sh9, sample_environment
    n = surf["normal"]
    pos = surf["pos"]
    if vol_diffuse is not None:
        from .volumetric_diffuse import sample_volumetric_diffuse
        irr = sample_volumetric_diffuse(
            vol_diffuse["volumes"], pos, n, vol_diffuse["fallback"])
    else:
        irr = jnp.maximum(eval_sh9(env["sh"], n), 0.0) / jnp.pi
    v = params["camera_pos"] - pos
    v = v / jnp.sqrt(jnp.maximum((v * v).sum(-1, keepdims=True), 1e-20))
    nov = jnp.clip((n * v).sum(-1), 0.0, 1.0)
    refl = 2.0 * nov[..., None] * n - v
    lod = surf["roughness"] * (env["levels"] - 1.0)
    half_spec = (bool(env.get("half_res")) and n.ndim == 3
                 and n.shape[0] % 2 == 0 and n.shape[1] % 2 == 0)
    if background is None and width and height:
        px, py = R.pixel_centers(width, height)
        ivp = params["inv_view_proj"]
        ndc = jnp.stack([2 * (px + 0.0) / width - 1,
                         2 * (py + 0.0) / height - 1,
                         jnp.full_like(px, 0.5),
                         jnp.ones_like(px)], axis=-1)
        wp = ndc @ ivp.T
        view_dirs = wp[..., :3] / jnp.where(
            jnp.abs(wp[..., 3:4]) < 1e-20, 1e-20, wp[..., 3:4]) \
            - params["camera_pos"]
        cov = surf["covered"]
        tiled = env.get("tiled")
        if env.get("sky_params"):
            from .environment import analytic_sky
            background = analytic_sky(view_dirs, **env["sky_params"])
            if tiled is not None:
                from .environment import sample_environment_tiled
                if half_spec:
                    # envSpecularHalfRes: prefiltered reflections at
                    # every-other-pixel + bilinear upsample (the
                    # accepted pre-tile-sampler trade; the analytic sky
                    # background stays full-res).
                    from ..ops.hdr import resize_bilinear
                    spec_h = sample_environment_tiled(
                        tiled, refl[::2, ::2], lod[::2, ::2],
                        covered=cov[::2, ::2])
                    spec_env = resize_bilinear(spec_h, height, width)
                else:
                    spec_env = sample_environment_tiled(
                        tiled, refl, lod, covered=cov)
            else:
                from ..ops.hdr import resize_bilinear
                spec_h = sample_environment(
                    env["strips"], refl[::2, ::2], lod[::2, ::2])
                spec_env = resize_bilinear(spec_h, height, width)
        else:
            dirs = jnp.where(cov[..., None], refl, view_dirs)
            lod = jnp.where(cov, lod, 0.0)
            if tiled is not None:
                from .environment import sample_environment_tiled
                env_sample = sample_environment_tiled(tiled, dirs, lod)
            else:
                env_sample = sample_environment(env["strips"], dirs, lod)
            spec_env = env_sample
            background = env_sample
    elif env.get("tiled") is not None:
        from .environment import sample_environment_tiled
        if half_spec:
            from ..ops.hdr import resize_bilinear
            spec_h = sample_environment_tiled(
                env["tiled"], refl[::2, ::2], lod[::2, ::2],
                covered=surf["covered"][::2, ::2])
            spec_env = resize_bilinear(spec_h, n.shape[0], n.shape[1])
        else:
            spec_env = sample_environment_tiled(
                env["tiled"], refl, lod, covered=surf["covered"])
    else:
        spec_env = sample_environment(env["strips"], refl, lod)
    if background is None:
        background = jnp.zeros(3, jnp.float32)
    background = jnp.broadcast_to(background, surf["normal"].shape)
    return irr, spec_env, background


def shade_surface(surf: dict, params, shadow_map=None, shadow_uv_mat=None,
                  lights=None, z_masks=None, tile_masks=None,
                  width: int = 0, height: int = 0,
                  background=None, pcf_wide: bool = False,
                  z_near: float = 0.1, z_far: float = 1000.0,
                  cluster_tile: int = 64, env=None,
                  cluster_shadows=None, ao=None, vol_diffuse=None,
                  shadow_tiled: bool = False, shadow_strips=None,
                  shadow_half_res: bool = False):
    """Lighting from resolved surface attributes: directional + shadow +
    clustered positional lights + emissive (lighting.h compute_lighting +
    compute_cluster_light).  Used by both forward and deferred paths —
    in deferred the `surf` dict comes from G-buffer arrays instead of the
    raster resolve, matching the reference's shared lighting.h.

    env: optional {"strips", "sh", "levels"} environment bundle — enables
    IBL ambient (SH irradiance diffuse + prefiltered specular with
    fresnel_ibl, the environment-lighting path of the reference) instead
    of the flat 0.05 ambient, and a view-ray skybox for background pixels
    when `background` is None."""
    pos = surf["pos"]
    shadow_term = compute_shadow_term(
        pos, surf["covered"], shadow_map, shadow_uv_mat,
        pcf_wide=pcf_wide, shadow_tiled=shadow_tiled,
        shadow_strips=shadow_strips, shadow_half_res=shadow_half_res)
    ambient_factor = jnp.ones_like(surf["metallic"]) if ao is None else ao
    color = compute_lighting(
        surf["base_color"], surf["normal"], surf["metallic"],
        surf["roughness"], ambient_factor=ambient_factor,
        world_pos=pos, camera_pos=params["camera_pos"],
        light_dir=params["sun_dir"], light_color=params["sun_color"],
        shadow_term=shadow_term, ambient=env is None)

    if env is not None:
        from ..ops.pbr import compute_f0, fresnel_ibl
        from .environment import eval_sh9, sample_environment
        n = surf["normal"]
        base = surf["base_color"]
        metal = surf["metallic"]
        rough = surf["roughness"]
        ambient_occ = 1.0 if ao is None else ao[..., None]
        if vol_diffuse is not None:
            # Volumetric diffuse GI replaces the SH sky-irradiance
            # diffuse term (lighting.h:56 material_ambient_factor *
            # compute_volumetric_diffuse_metallic; the probes already
            # carry the lambertian 1/PI, volumetric_diffuse.h:151).
            from .volumetric_diffuse import sample_volumetric_diffuse
            irr_vd = sample_volumetric_diffuse(
                vol_diffuse["volumes"], pos, n, vol_diffuse["fallback"])
            color = color + irr_vd * base * (1.0 - metal[..., None]) \
                * ambient_occ
        else:
            irr = jnp.maximum(eval_sh9(env["sh"], n), 0.0)
            color = color + irr / jnp.pi * base \
                * (1.0 - metal[..., None]) * ambient_occ
        v = params["camera_pos"] - pos
        v = v / jnp.sqrt(jnp.maximum((v * v).sum(-1,
                                                 keepdims=True), 1e-20))
        nov = jnp.clip((n * v).sum(-1), 0.0, 1.0)
        refl = 2.0 * nov[..., None] * n - v
        lod = rough * (env["levels"] - 1.0)
        if background is None and width and height:
            px, py = R.pixel_centers(width, height)
            ivp = params["inv_view_proj"]
            ndc = jnp.stack([2 * (px + 0.0) / width - 1,
                             2 * (py + 0.0) / height - 1,
                             jnp.full_like(px, 0.5),
                             jnp.ones_like(px)], axis=-1)
            wp = ndc @ ivp.T
            view_dirs = wp[..., :3] / jnp.where(
                jnp.abs(wp[..., 3:4]) < 1e-20, 1e-20, wp[..., 3:4]) \
                - params["camera_pos"]
            cov = surf["covered"]
            tiled = env.get("tiled")
            if env.get("sky_params"):
                # Procedural env: ANALYTIC sky (zero gathers) for the
                # background.  Specular IBL: tile-rect Pallas fetch at
                # full res when the env carries tiled strips (reflection
                # footprints are wide -> the planner picks coarse
                # prefiltered levels, few rect rows); otherwise the
                # classic half-res gather + bilinear upsample.
                from .environment import analytic_sky
                background = analytic_sky(view_dirs, **env["sky_params"])
                if tiled is not None:
                    from .environment import sample_environment_tiled
                    spec_env = sample_environment_tiled(
                        tiled, refl, lod, covered=cov)
                else:
                    from ..ops.hdr import resize_bilinear
                    spec_h = sample_environment(
                        env["strips"], refl[::2, ::2], lod[::2, ::2])
                    spec_env = resize_bilinear(spec_h, height, width)
            else:
                # File-based env: merge the IBL-specular and skybox
                # fetches into ONE full-res sample stream (covered
                # pixels reflect, background pixels view ray at lod 0).
                dirs = jnp.where(cov[..., None], refl, view_dirs)
                lod = jnp.where(cov, lod, 0.0)
                if tiled is not None:
                    from .environment import sample_environment_tiled
                    env_sample = sample_environment_tiled(tiled, dirs,
                                                          lod)
                else:
                    env_sample = sample_environment(env["strips"], dirs,
                                                    lod)
                spec_env = env_sample
                background = env_sample
        elif env.get("tiled") is not None:
            from .environment import sample_environment_tiled
            spec_env = sample_environment_tiled(env["tiled"], refl, lod,
                                                covered=surf["covered"])
        else:
            spec_env = sample_environment(env["strips"], refl, lod)
        f0 = compute_f0(base, metal)
        color = color + spec_env * fresnel_ibl(f0, nov, rough) \
            * ambient_occ

    if lights is not None:
        from ..ops.clusterer import shade_clustered
        px, py = R.pixel_centers(width, height)
        color = color + shade_clustered(
            lights, z_masks, tile_masks, surf["base_color"],
            surf["normal"], surf["metallic"], surf["roughness"], pos,
            params["camera_pos"], params["view"], px, py,
            z_near=z_near, z_far=z_far, tile=cluster_tile,
            cluster_shadows=cluster_shadows)

    color = color + surf["emissive"]
    if background is None:
        # env skybox pixels were produced by the merged IBL+sky stream
        # above; without an env (or pixel grid) the clear color is black.
        background = jnp.zeros(3, jnp.float32)
    return jnp.where(surf["covered"][..., None], color, background)


def shade_surface_fused(surf: dict, params, shadow_map=None,
                        shadow_uv_mat=None, lights=None, z_masks=None,
                        tile_masks=None, width: int = 0, height: int = 0,
                        background=None, pcf_wide: bool = False,
                        z_near: float = 0.1, z_far: float = 1000.0,
                        cluster_tile: int = 64, env=None,
                        cluster_shadows=None, ao=None, vol_diffuse=None,
                        shadow_tiled: bool = False, shadow_strips=None,
                        shadow_half_res: bool = False,
                        z_slices: int = 32, view=None,
                        interpret: bool | None = None):
    """shade_surface through the fused Pallas kernel
    (ops/shade_fused.py): the gather-bound products (shadow term, env
    fetch, top-K atlas terms) are computed with the same one-gather
    paths, then the ENTIRE per-pixel lighting expression runs in one
    VMEM-tiled pass.  Numerically locked against shade_surface by
    tests/test_shade_fused.py."""
    from ..ops.shade_fused import (
        P_FIXED, fused_light_table, shade_planes_fused)
    assert cluster_tile == 64, "fused shade kernel assumes 64-px tiles"
    if view is None and lights is not None:
        view = params["view"]
    if z_masks is not None:
        z_slices = z_masks.shape[0]
    H, W = surf["metallic"].shape
    pos = surf["pos"]
    shadow_term = compute_shadow_term(
        pos, surf["covered"], shadow_map, shadow_uv_mat,
        pcf_wide=pcf_wide, shadow_tiled=shadow_tiled,
        shadow_strips=shadow_strips, shadow_half_res=shadow_half_res)
    shadow_term = jnp.broadcast_to(
        jnp.asarray(shadow_term, jnp.float32), (H, W))

    has_env = env is not None
    if has_env:
        irr, spec_env, bg = compute_env_products(
            surf, params, env, width, height, background,
            vol_diffuse=vol_diffuse)
    else:
        irr = spec_env = jnp.zeros((H, W, 3), jnp.float32)
        bg = jnp.broadcast_to(
            jnp.zeros(3, jnp.float32) if background is None
            else jnp.asarray(background, jnp.float32), (H, W, 3))

    has_lights = lights is not None
    k_shadow = 0
    slot_planes = []
    if has_lights and cluster_shadows is not None:
        # pixel_masks only feed the top-K selection (the kernel culls
        # lights itself); same select-tree construction as
        # shade_clustered.
        from ..ops.clusterer import shade_clustered  # noqa: F401
        from ..ops.light_shadows import topk_shadow_terms
        cs = cluster_shadows
        half = bool(cs.get("half_res", False))
        # pixel_masks feed ONLY the top-K selection here (the kernel
        # culls lights itself), so under half_res the 32-slice z-select
        # tree runs on the subsampled grid too.
        tpos = pos[::2, ::2] if half else pos
        zs = z_masks.shape[0]
        log_ratio = np.log(z_far / z_near)
        vz = -(tpos @ jnp.asarray(view)[2, :3].T + jnp.asarray(view)[2, 3])
        s = jnp.clip(jnp.log(jnp.maximum(vz, z_near) / z_near)
                     / log_ratio * zs, 0, zs - 1).astype(jnp.int32)
        zsel = z_masks[0]
        for k in range(1, zs):
            zsel = jnp.where((s == k)[..., None], z_masks[k], zsel)
        tiled = jnp.repeat(jnp.repeat(tile_masks, cluster_tile, axis=0),
                           cluster_tile, axis=1)[:H, :W]
        if half:
            tiled = tiled[::2, ::2]
        pixel_masks = zsel & tiled
        slots, terms = topk_shadow_terms(
            cs["atlas_flat"], cs["vps_np"], cs["size"],
            int(cs["num_lights"]), cs["light_slice_np"],
            cs["light_kind_np"], cs["light_pos_np"], pixel_masks,
            tpos, k=cs.get("k", 4), bias=cs.get("bias", 2e-3))
        if half:
            slots = jnp.repeat(jnp.repeat(slots, 2, axis=1),
                               2, axis=2)[:, :H, :W]
            terms = jnp.repeat(jnp.repeat(terms, 2, axis=1),
                               2, axis=2)[:, :H, :W]
        k_shadow = slots.shape[0]
        slot_planes = [slots[j].astype(jnp.float32)
                       for j in range(k_shadow)] + \
                      [terms[j] for j in range(k_shadow)]

    has_ao = ao is not None
    zero = jnp.zeros((H, W), jnp.float32)
    planes = [
        surf["base_color"][..., 0], surf["base_color"][..., 1],
        surf["base_color"][..., 2],
        surf["normal"][..., 0], surf["normal"][..., 1],
        surf["normal"][..., 2],
        surf["metallic"], surf["roughness"],
        pos[..., 0], pos[..., 1], pos[..., 2],
        surf["emissive"][..., 0], surf["emissive"][..., 1],
        surf["emissive"][..., 2],
        surf["covered"].astype(jnp.float32),
        shadow_term,
        spec_env[..., 0], spec_env[..., 1], spec_env[..., 2],
        bg[..., 0], bg[..., 1], bg[..., 2],
        (ao if has_ao else zero),
        irr[..., 0], irr[..., 1], irr[..., 2],
    ]
    assert len(planes) == P_FIXED
    planes += slot_planes
    ph = -(-H // 32) * 32
    pw = -(-W // 128) * 128
    stacked = jnp.stack([jnp.asarray(p, jnp.float32) for p in planes])
    stacked = jnp.pad(stacked, ((0, 0), (0, ph - H), (0, pw - W)))

    uni = jnp.zeros((8, 128), jnp.float32)
    uni = uni.at[0, 0:3].set(jnp.asarray(params["camera_pos"],
                                         jnp.float32))
    uni = uni.at[0, 3:6].set(jnp.asarray(params["sun_dir"], jnp.float32))
    uni = uni.at[1, 0:3].set(jnp.asarray(params["sun_color"],
                                         jnp.float32))
    if has_lights:
        uni = uni.at[0, 6].set(lights.count.astype(jnp.float32))
        vrow = jnp.asarray(view)[2]
        uni = uni.at[0, 9:13].set(vrow.astype(jnp.float32))
        ltbl = fused_light_table(lights, jnp.asarray(view), z_near,
                                 z_far, z_slices)
        tmw = pw // 64
        tmh = -(-ph // 64)
        tm = jax.lax.bitcast_convert_type(
            tile_masks[..., 0] if tile_masks.ndim == 3 else tile_masks,
            jnp.int32)
        tm = jnp.pad(tm, ((0, max(tmh - tm.shape[0], 0)),
                          (0, max(tmw - tm.shape[1], 0))))[:tmh, :tmw]
    else:
        ltbl = jnp.zeros((1, 128), jnp.float32)
        tm = jnp.zeros((1, 2), jnp.int32)

    out = shade_planes_fused(
        stacked, ltbl, tm, uni, H, W, k_shadow=k_shadow,
        has_env=has_env, has_lights=has_lights, has_ao=has_ao,
        ambient=not has_env, interpret=interpret)
    return jnp.moveaxis(out, 0, -1)


def motion_vectors(prev_pos, covered, depth, prev_vp_uv, cam_reproj,
                   width: int, height: int):
    """Per-pixel motion vectors mv = uv_cur - uv_prev
    (assets/shaders/reconstruct_mv.frag; RendererSuite Type MotionVector,
    renderer/renderer.hpp:182-211).

    Covered pixels reproject the surface's LAST-frame world position
    (interpolated by surface_attributes from prev_world transforms)
    through the previous un-jittered view-proj; background pixels fall
    back to camera-only reprojection of the depth buffer (the
    reference's MV==0 static path).

    prev_vp_uv: (4, 4) uv_remap @ prev_view_proj (world -> prev UV).
    cam_reproj: (4, 4) TemporalJitter.reproject_matrix().
    """
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    uu, vv = jnp.meshgrid(u, v)
    uv = jnp.stack([uu, vv], axis=-1)

    m = prev_vp_uv
    xy = prev_pos @ m[:2, :3].T + m[:2, 3]
    w = prev_pos @ m[3, :3].T + m[3, 3]
    w = jnp.maximum(jnp.abs(w), 1e-12) * jnp.sign(
        jnp.where(w == 0, 1.0, w))
    uv_obj = xy / w[..., None]

    ndc = jnp.concatenate([2 * uv - 1.0, depth[..., None],
                           jnp.ones_like(depth)[..., None]], axis=-1)
    rp = ndc @ cam_reproj.T
    rw = rp[..., 3:4]
    rw = jnp.maximum(jnp.abs(rw), 1e-12) * jnp.sign(
        jnp.where(rw == 0, 1.0, rw))
    uv_cam = rp[..., :2] / rw

    uv_prev = jnp.where(covered[..., None], uv_obj, uv_cam)
    return uv - uv_prev


def transparent_composite(scene: PackedScene, setup, opaque_depth,
                          opaque_hdr, clip, transparent_mask, params,
                          width: int, height: int, **light_kw):
    """Transparent queue (renderer.hpp Queue::Transparent): blended
    materials render AFTER opaque lighting, forward-shaded and
    alpha-blended over the lit frame, depth-tested against the opaque
    depth (no depth write).  Single visibility layer: overlapping
    transparent surfaces resolve to the nearest (the reference sorts
    back-to-front per draw; a depth-peeling pass chain is future work).
    """
    tri_visible = transparent_mask[scene.tri_object]
    tsetup = setup._replace(valid=setup.valid & tri_visible)
    if jax.default_backend() == "cpu":
        tdepth, ttri = R.rasterize(tsetup, width, height)
    else:
        from ..ops.raster_binned import rasterize_binned
        tdepth, ttri = rasterize_binned(tsetup, width, height,
                                        interpret=False)
    # Depth test against opaque (reverse-Z GREATER), no write.
    visible = (ttri >= 0) & (tdepth > opaque_depth)
    ttri = jnp.where(visible, ttri, -1)
    surf = surface_attributes(scene, tsetup, ttri,
                              light_kw.pop("world_pos"),
                              light_kw.pop("world_normal"),
                              light_kw.pop("world_tangent"),
                              width, height)
    color = shade_surface(surf, params, width=width, height=height,
                          background=jnp.zeros(3, jnp.float32), **light_kw)
    a = jnp.where(visible, surf["alpha"], 0.0)[..., None]
    return opaque_hdr * (1.0 - a) + color * a


def forward_shade(scene: PackedScene, setup, depth, tri, world_pos,
                  world_normal, world_tangent, params, shadow_map=None,
                  shadow_uv_mat=None, width: int = 0, height: int = 0,
                  background=None, pcf_wide: bool = False, **light_kw):
    """Forward path: resolve + light in one fused pass."""
    surf = surface_attributes(scene, setup, tri, world_pos, world_normal,
                              world_tangent, width, height)
    return shade_surface(surf, params, shadow_map=shadow_map,
                         shadow_uv_mat=shadow_uv_mat, width=width,
                         height=height, background=background,
                         pcf_wide=pcf_wide, **light_kw)


def _normalize(v, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum((v * v).sum(-1), eps))[..., None]


def world_positions(scene: PackedScene, world, skin_palette=None,
                    morph_weights=None):
    """World-space vertex positions (morph + node transform + optional
    skinning)."""
    wm = world[scene.v_node]
    p, _ = apply_morphs(scene, scene.positions,
                        morph_weights=morph_weights)
    world_pos = jnp.einsum("vij,vj->vi", wm[:, :3, :3], p) + wm[:, :3, 3]
    if scene.v_joints is not None and skin_palette is not None:
        vs = scene.num_static_verts
        pm = skin_palette[scene.v_joints]
        w = scene.v_weights[..., None, None]
        blended = (pm * w).sum(axis=1)
        spos = jnp.einsum("vij,vj->vi", blended[:, :3, :3],
                          p[vs:]) + blended[:, :3, 3]
        world_pos = jnp.concatenate([world_pos[:vs], spos])
    return world_pos


def render_shadow_map(scene: PackedScene, world, light_vp, size: int,
                      object_mask, skin_palette=None, morph_weights=None):
    """Depth-only raster from the light's view (the shadow-map pass;
    assets/shaders/static_mesh_depth.vert analogue).  Front faces kept —
    the reference renders shadow maps without cull flip, relying on depth
    bias in the compare."""
    world_pos = world_positions(scene, world, skin_palette,
                                morph_weights=morph_weights)
    lv = jnp.asarray(light_vp)
    clip = world_pos @ lv[:3, :3].T + lv[:3, 3]
    clip_w = world_pos @ lv[3, :3].T + lv[3, 3]
    clip = jnp.concatenate([clip, clip_w[:, None]], axis=1)
    setup = R.setup_triangles(clip, scene.indices, size, size,
                              cull_mode=R.CULL_NONE)
    tri_visible = object_mask[scene.tri_object]
    setup = setup._replace(valid=setup.valid & tri_visible)
    if jax.default_backend() != "cpu":
        # Ortho shadow views have many tall/large triangles; use the
        # binned path with a wide emit window (see rasterize_binned).
        from ..ops.raster_binned import rasterize_binned
        depth, _tri = rasterize_binned(setup, size, size, interpret=False,
                                       span_w=2, span_h=8)
    else:
        depth, _tri = R.rasterize(setup, size, size)
    return depth
