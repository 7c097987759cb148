"""tpu_renderer — a TPU-native 3D rendering framework.

Brand-new implementation of the capabilities of MacSpain/cpu-renderer (an
AVX + multithreaded scanline software rasterizer) redesigned for TPU:
vertex transform / culling / Gouraud lighting / triangle setup and tile
binning run as XLA ops; rasterization (coverage + depth + attribute interpolation,
fused) runs as Pallas kernels over VMEM-resident framebuffer tiles;
texture/Phong shading runs as a dense deferred XLA pass; multi-chip scaling uses
jax.sharding.Mesh + shard_map (framebuffer tiles and/or triangle shards)
with ICI collectives. See SURVEY.md for the reference analysis and
golden/cpu_reference.py for the behavioral spec + documented divergences.

Quick start:

    from tpu_renderer import (Renderer, make_object, make_transform,
                              make_lights, ObjectConfig)
    r = Renderer(height=512, width=512, backend="pallas")
    fb = r.render(scene, transform, lights)   # fb.color: (H, W) u32 ARGB
"""

from .core.types import (
    DEPTH_CLEAR,
    Framebuffer,
    LightData,
    ObjectConfig,
    ProjectiveTransform,
    RenderObject,
    make_framebuffer,
    make_lights,
    make_object,
    make_transform,
    no_lights,
)
from .engine.renderer import Renderer, render_object, render_scene

__version__ = "0.1.0"

__all__ = [
    "DEPTH_CLEAR",
    "Framebuffer",
    "LightData",
    "ObjectConfig",
    "ProjectiveTransform",
    "RenderObject",
    "Renderer",
    "make_framebuffer",
    "make_lights",
    "make_object",
    "make_transform",
    "no_lights",
    "render_object",
    "render_scene",
    "__version__",
]
