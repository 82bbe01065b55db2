from .gltf_export import export_gltf
