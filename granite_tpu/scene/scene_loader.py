"""SceneLoader — composed `.scene` JSON scenes (reference: renderer/
scene_loader.{hpp,cpp}: loads glTF directly OR a custom JSON document
composing multiple scenes/meshes with per-instance transforms, ocean and
terrain blocks).

Schema (fresh design mirroring the reference's feature set):
{
  "scenes": [
    {"path": "a.gltf",
     "instances": [{"translation": [..], "rotation": [w,x,y,z],
                    "scale": [..]}, ...]}        # default: one identity
  ],
  "ocean":   true | {OceanConfig fields},        # composition extensions
  "terrain": true | {"worldSize": .., "amplitude": .., "grid": ..}
}
"""

from __future__ import annotations

import json
import os

import numpy as np

from .gltf import GLTFParser
from .scene_formats import NodeData, SceneInfo


def _merge_scene(dst: SceneInfo, src: SceneInfo, instances) -> None:
    """Append src under one new root node per instance, remapping ids."""
    mesh_off = len(dst.meshes)
    mat_off = len(dst.materials)
    img_off = len(dst.images)
    light_off = len(dst.lights)
    cam_off = len(dst.cameras)
    skin_off = len(dst.skins)

    for md in src.meshes:
        import copy
        m2 = copy.copy(md)
        if m2.material >= 0:
            m2.material = m2.material + mat_off
        dst.meshes.append(m2)
    for mat in src.materials:
        import copy
        m2 = copy.copy(mat)
        for attr in ("base_color_image", "metallic_roughness_image",
                     "normal_image", "occlusion_image", "emissive_image"):
            v = getattr(m2, attr)
            if v is not None:
                setattr(m2, attr, v + img_off)
        dst.materials.append(m2)
    dst.images.extend(src.images)
    dst.image_srgb.extend(src.image_srgb)
    dst.lights.extend(src.lights)
    dst.cameras.extend(src.cameras)
    for sk in src.skins:
        import copy
        s2 = copy.copy(sk)
        dst.skins.append(s2)  # joints remapped per instance below

    for inst in instances:
        node_off = len(dst.nodes)
        root = NodeData(name=f"instance@{node_off}")
        if "translation" in inst:
            root.translation = np.asarray(inst["translation"], np.float32)
        if "rotation" in inst:
            root.rotation = np.asarray(inst["rotation"], np.float32)
        if "scale" in inst:
            root.scale = np.asarray(inst["scale"], np.float32)
        dst.nodes.append(root)
        dst.roots.append(node_off)
        base = len(dst.nodes)
        for nd in src.nodes:
            import copy
            n2 = copy.copy(nd)
            n2.children = [c + base for c in nd.children]
            n2.meshes = [m + mesh_off for m in nd.meshes]
            if n2.light is not None:
                n2.light = n2.light + light_off
            if n2.camera is not None:
                n2.camera = n2.camera + cam_off
            if n2.skin is not None:
                n2.skin = n2.skin + skin_off
            dst.nodes.append(n2)
        root.children = [r + base for r in src.roots]
        # animations retarget per instance
        for ad in src.animations:
            import copy
            a2 = copy.copy(ad)
            a2.channels = [dict(ch, node=ch["node"] + base)
                           for ch in ad.channels]
            dst.animations.append(a2)
        for i, sk in enumerate(src.skins):
            dst.skins[skin_off + i].joints = sk.joints + base


class SceneLoader:
    """load_scene(path): .gltf/.glb directly, or .scene composition."""

    def __init__(self, path: str):
        self.ocean_config = None
        self.terrain_config = None
        if path.endswith(".scene") or path.endswith(".json"):
            self.info = self._load_composed(path)
        else:
            self.info = GLTFParser(path).get_scene()

    def _load_composed(self, path: str) -> SceneInfo:
        base_dir = os.path.dirname(os.path.abspath(path))
        with open(path) as f:
            doc = json.load(f)
        info = SceneInfo()
        for entry in doc.get("scenes", []):
            sub = GLTFParser(os.path.join(base_dir,
                                          entry["path"])).get_scene()
            instances = entry.get("instances", [{}])
            _merge_scene(info, sub, instances)
        if doc.get("ocean"):
            self.ocean_config = doc["ocean"] if isinstance(
                doc["ocean"], dict) else {}
        if doc.get("terrain"):
            self.terrain_config = doc["terrain"] if isinstance(
                doc["terrain"], dict) else {}
        return info

    def get_scene(self) -> SceneInfo:
        return self.info
