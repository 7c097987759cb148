"""Supersampled rendering (SSAA) — an extension over the reference (which
renders aliased, one sample per pixel).

Renders at an integer multiple of the target resolution by scaling the
camera (meters_to_pixels and screen_center are the only resolution-coupled
parameters of the reference camera model, projekt.cpp:86-90), then
box-filters down. Depth output is the max over subsamples (consistent with
the larger-wins convention).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import pack_argb, unpack_argb
from ..core.types import Framebuffer, ProjectiveTransform, make_framebuffer
from .renderer import render_scene

F32 = jnp.float32


def scale_transform(transform: ProjectiveTransform, factor: int):
    """Camera for a factor-times-larger framebuffer covering the same view."""
    f = F32(factor)
    return ProjectiveTransform(
        distance_above_target=transform.distance_above_target,
        focal_length=transform.focal_length,
        meters_to_pixels=transform.meters_to_pixels * f,
        screen_center=transform.screen_center * f,
    )


def render_scene_ssaa(scene, transform, lights, height: int, width: int,
                      factor: int = 2, backend: str = "pallas",
                      clear_color: int = 0) -> Framebuffer:
    """Render at factor x resolution and box-filter down to (height, width)."""
    hi = make_framebuffer(height * factor, width * factor, clear_color)
    hi = render_scene(
        hi, scene, scale_transform(transform, factor), lights, backend
    )
    rgba = unpack_argb(hi.color).reshape(
        height, factor, width, factor, 4
    )
    inv = F32(1.0) / F32(factor * factor)
    avg = jnp.sum(jnp.sum(rgba, axis=3), axis=1) * inv
    depth = jnp.max(
        jnp.max(
            hi.depth.reshape(height, factor, width, factor), axis=3
        ),
        axis=1,
    )
    return Framebuffer(color=pack_argb(avg), depth=depth)
