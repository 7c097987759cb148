"""Core data model: camera, lights, scene objects, framebuffer.

TPU-native reconstruction of the reference's render state (SURVEY.md §1.2):

- ``ProjectiveTransform``  <- the absent ``projective_transform`` struct used
  by ProjectVertex/UnprojectVertex (projekt.cpp:74-160).
- ``LightData``            <- the absent ``light_data``/``light_info`` structs
  (projekt.cpp:452-481, 4010-4062), vectorized over lights.
- ``RenderObject``         <- ``render_entry_3d_object`` (projekt.h:1-15):
  triangle soup (3 verts per triangle, no index buffer) with interleaved
  per-vertex color/normal/uv arrays and an optional ARGB32 texture.
- ``Framebuffer``          <- ``loaded_bitmap`` + z-buffer + clear semantics
  (``game_render_commands.ZBuffer``; larger stored z wins, projekt.cpp:495).

All leaves are JAX arrays so every structure is a pytree that flows through
jit/shard_map. Per-object booleans that change compiled code (phong shading,
textured) are *static* and live in ``ObjectConfig``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

# Clear value for the depth buffer. The reference's platform layer owns the
# clear (absent from the repo); the z test is "larger wins" (projekt.cpp:495)
# with stored z = camera-space z, which can be negative, so the clear must be
# the most-negative float.
DEPTH_CLEAR = np.float32(-3.4028235e38)

# Near clip plane, hardcoded in ProjectVertex (projekt.cpp:82).
NEAR_CLIP = np.float32(0.2)


class ProjectiveTransform(NamedTuple):
    """Pinhole camera looking down -z from ``distance_above_target``."""

    distance_above_target: jnp.ndarray  # scalar f32
    focal_length: jnp.ndarray  # scalar f32
    meters_to_pixels: jnp.ndarray  # scalar f32
    screen_center: jnp.ndarray  # (2,) f32, pixels


def make_transform(
    distance_above_target: float,
    focal_length: float,
    meters_to_pixels: float,
    screen_center,
) -> ProjectiveTransform:
    return ProjectiveTransform(
        distance_above_target=jnp.asarray(distance_above_target, F32),
        focal_length=jnp.asarray(focal_length, F32),
        meters_to_pixels=jnp.asarray(meters_to_pixels, F32),
        screen_center=jnp.asarray(screen_center, F32),
    )


class LightData(NamedTuple):
    """Ambient + N point lights (vectorized ``light_data``)."""

    ambient: jnp.ndarray  # (4,) f32 rgba intensity
    light_p: jnp.ndarray  # (L, 3) f32 camera-space positions
    light_intensity: jnp.ndarray  # (L, 4) f32 rgba intensities

    @property
    def count(self) -> int:
        return self.light_p.shape[0]


def make_lights(ambient, positions, intensities) -> LightData:
    positions = jnp.asarray(positions, F32).reshape(-1, 3)
    intensities = jnp.asarray(intensities, F32).reshape(-1, 4)
    assert positions.shape[0] == intensities.shape[0]
    return LightData(
        ambient=jnp.asarray(ambient, F32).reshape(4),
        light_p=positions,
        light_intensity=intensities,
    )


def no_lights() -> LightData:
    """Zero lights: ambient never applied (the reference's per-light loop
    multiplies ambient only on light index 0, so 0 lights => raw colors)."""
    return LightData(
        ambient=jnp.ones((4,), F32),
        light_p=jnp.zeros((0, 3), F32),
        light_intensity=jnp.zeros((0, 4), F32),
    )


class RenderObject(NamedTuple):
    """One model: triangle soup + per-vertex attributes (+ optional texture).

    ``vertices`` are model-space; ``p`` is the model's camera-space position,
    added per-vertex exactly as the reference does (projekt.cpp:3900-3903) —
    there is no rotation in the reference's object transform.

    Device arrays are CHANNEL-MAJOR: shape (C, 3, T) — component, vertex-
    within-triangle, triangle — with the TRIANGLE axis minor. TPU tiles are
    (8, 128)-lane: a classic (V, 3)-minor soup is either stored ~42x padded
    or compute-transposed by XLA every frame, and the whole downstream
    pipeline (edge setup, packed records, binning) wants per-triangle
    vectors. ``make_object`` accepts the classic (V, C) NumPy form and
    converts once at construction.
    """

    p: jnp.ndarray  # (3,) f32
    vertices: jnp.ndarray  # (3, 3, T) f32 [xyz][vertex 0..2][triangle]
    colors: jnp.ndarray  # (4, 3, T) f32 rgba
    normals: jnp.ndarray  # (3, 3, T) f32
    uvs: jnp.ndarray  # (2, 3, T) f32
    texture: Optional[jnp.ndarray] = None  # (Ht, Wt) u32 ARGB or None

    @property
    def num_triangles(self) -> int:
        return self.vertices.shape[2]


def _to_channel_major(arr, channels: int):
    """(V, C) classic soup -> (C, 3, T) channel-major device layout."""
    arr = jnp.asarray(arr, F32).reshape(-1, channels)
    v = arr.shape[0]
    assert v % 3 == 0, "triangle soup requires a multiple of 3 vertices"
    return jnp.transpose(arr.reshape(v // 3, 3, channels), (2, 1, 0))


def make_object(p, vertices, colors, normals, uvs, texture=None) -> RenderObject:
    """Build a RenderObject from classic (V, C) triangle-soup arrays
    (vertex-major, as the reference and the golden use them); arrays are
    converted to the channel-major device layout once, here."""
    return RenderObject(
        p=jnp.asarray(p, F32).reshape(3),
        vertices=_to_channel_major(vertices, 3),
        colors=_to_channel_major(colors, 4),
        normals=_to_channel_major(normals, 3),
        uvs=_to_channel_major(uvs, 2),
        texture=None if texture is None else jnp.asarray(texture, jnp.uint32),
    )


def classic_arrays(obj: RenderObject) -> dict:
    """The object's soup back in classic (V, C) vertex-major NumPy form
    (serialization, goldens, debugging)."""
    out = {}
    for name in ("vertices", "colors", "normals", "uvs"):
        a = np.asarray(getattr(obj, name))
        c = a.shape[0]
        out[name] = a.transpose(2, 1, 0).reshape(-1, c)
    return out


@dataclasses.dataclass(frozen=True)
class ObjectConfig:
    """Static (trace-time) per-object rendering switches.

    phong:     per-pixel Blinn-Phong (reference ``PhongShading`` flag,
               projekt.h:8). False => Gouraud baked at the vertex stage.
    textured:  perspective-correct nearest texture sampling (reference
               ``Object->Bitmap != 0``).
    uv_mode:   'scalar' = round texcoords, scale by dim-1, clamp indices
               (projekt.cpp:429-445); 'avx' = truncate, scale by dim,
               discard fragments with uv outside [0,1] (projekt.cpp:1044-1060).
               The reference's two paths genuinely differ here (SURVEY §2.1);
               both are implemented, 'scalar' is the parity default.
    filter_mode: 'nearest' (reference-faithful default) or 'bilinear'
               (extension; BASELINE config 3 calls for bilinear sampling).
    """

    phong: bool = False
    textured: bool = False
    uv_mode: str = "scalar"
    filter_mode: str = "nearest"


class Framebuffer(NamedTuple):
    """Color (u32 ARGB) + depth (f32, larger wins)."""

    color: jnp.ndarray  # (H, W) u32
    depth: jnp.ndarray  # (H, W) f32

    @property
    def height(self) -> int:
        return self.color.shape[0]

    @property
    def width(self) -> int:
        return self.color.shape[1]


def make_framebuffer(height: int, width: int, clear_color: int = 0) -> Framebuffer:
    return Framebuffer(
        color=jnp.full((height, width), clear_color, jnp.uint32),
        depth=jnp.full((height, width), DEPTH_CLEAR, F32),
    )
