from .render_context import RenderContext
from .scene_renderer import PackedScene, forward_shade, transform_vertices
