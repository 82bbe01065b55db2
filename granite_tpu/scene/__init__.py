from .scene_formats import (
    MeshData, MaterialData, NodeData, CameraData, LightData, AnimationData,
    SkinData, SceneInfo, generate_normals, generate_tangents,
)
from .gltf import GLTFParser
from .scene import Scene, RenderableHandle
from .camera import Camera, FPSCamera
