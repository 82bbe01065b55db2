from .render_graph import (
    RenderGraph, RenderPass, AttachmentInfo, BufferInfo, SizeClass, Queue,
    RenderGraphError,
)
