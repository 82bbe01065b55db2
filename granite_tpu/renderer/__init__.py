from .render_context import RenderContext
from .scene_renderer import (
    PackedScene, forward_shade, pack_scene, rasterize_scene,
    render_shadow_map, shade_surface, surface_attributes,
    transform_vertices,
)
