from .flat_renderer import FlatRenderer, draw_text, font_bitmap
