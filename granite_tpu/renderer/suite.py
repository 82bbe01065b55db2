"""RendererSuite (reference renderer/renderer.hpp:182-211).

The reference keeps ten specialized Renderer instances — one per render
role (forward opaque/transparent, shadow depth PCF/VSM directional/
positional, depth prepass, motion vectors, deferred G-buffer) — and a
`Config` that rebuilds the set when global options flip.  Here each
"renderer" is a pass-executor callable (the traced function a
RenderGraph pass runs); the suite is the registry the application's
`bake_render_graph` consults instead of ad-hoc config branches.

`set_default_renderers(app, config)` mirrors the reference's
`RendererSuite::set_default_renderers`: it derives every role from the
Config (pcf_wide / directional_light_vsm / cascaded shadows /
z-prepass) and binds the scene_renderer implementations.  Applications
can override any role with `set_renderer` before bake (the reference's
escape hatch for custom passes).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Callable, Optional


class Type(enum.Enum):
    """renderer.hpp:186-197 Type — same roles, same intent."""
    ForwardOpaque = 0
    ForwardTransparent = 1
    ShadowDepthDirectionalPCF = 2
    ShadowDepthDirectionalFallbackPCF = 3
    ShadowDepthPositionalPCF = 4
    ShadowDepthDirectionalVSM = 5
    ShadowDepthPositionalVSM = 6
    PrepassDepth = 7
    MotionVector = 8
    Deferred = 9
    DeferredLighting = 10     # our split: G-buffer and resolve are
    #                           separate graph passes (lighting.h side)


@dataclass
class Config:
    """renderer.hpp:205-211 RendererSuite::Config."""
    pcf_kernel_wide: bool = False
    directional_light_vsm: bool = False
    forward_z_prepass: bool = False
    cascaded_directional_shadows: bool = False


class RendererSuite:
    def __init__(self):
        self._renderers: dict[Type, Callable] = {}
        self.config = Config()

    def set_renderer(self, t: Type, fn: Callable) -> None:
        self._renderers[t] = fn

    def get(self, t: Type) -> Optional[Callable]:
        return self._renderers.get(t)

    def set_default_renderers(self, app, config: Config) -> None:
        """Bind the default pass executors for every role the current
        Config selects (RendererSuite::set_default_renderers).  `app`
        is the SceneViewerApplication owning the pass methods."""
        self.config = config
        self.set_renderer(Type.ForwardOpaque, app._forward_pass)
        self.set_renderer(Type.ForwardTransparent,
                          app._apply_transparent)
        self.set_renderer(Type.Deferred, app._gbuffer_pass)
        self.set_renderer(Type.DeferredLighting, app._lighting_pass)
        # MotionVector is a G-buffer VARIANT here (the MV target rides
        # the geometry pass) — same binding, flagged by the pass setup.
        self.set_renderer(Type.MotionVector, app._gbuffer_pass)
        # Depth prepass is satisfied BY DESIGN (the visibility-buffer
        # raster IS a depth prepass); expose the shadow executor so a
        # custom graph can still add an explicit one.
        self.set_renderer(Type.PrepassDepth, app._shadow_pass)
        if config.directional_light_vsm:
            self.set_renderer(Type.ShadowDepthDirectionalVSM,
                              app._shadow_pass)
            self.set_renderer(Type.ShadowDepthPositionalVSM,
                              app._shadow_pass)
        else:
            self.set_renderer(Type.ShadowDepthDirectionalPCF,
                              app._shadow_pass)
            # fallback = the non-cascaded single-map path
            self.set_renderer(Type.ShadowDepthDirectionalFallbackPCF,
                              app._shadow_pass)
            self.set_renderer(Type.ShadowDepthPositionalPCF,
                              app._shadow_pass)

    def shadow_renderer(self) -> Optional[Callable]:
        """The directional-shadow role the Config selects."""
        if self.config.directional_light_vsm:
            return self.get(Type.ShadowDepthDirectionalVSM)
        return self.get(Type.ShadowDepthDirectionalPCF)

    def main_geometry_renderer(self, deferred: bool,
                               motion_vectors: bool) -> Callable:
        if deferred:
            return self.get(Type.MotionVector if motion_vectors
                            else Type.Deferred)
        return self.get(Type.ForwardOpaque)
