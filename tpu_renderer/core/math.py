"""Scalar/vector math primitives shared by every stage.

These are the TPU-native equivalents of the reference's implied platform math
library (SURVEY.md L7): ``Normalize``, ``Inner``, ``Cross``, ``Hadamard``,
``Clamp01``, ``RoundR32ToS32``/``RoundR32ToU32`` (half-away-from-zero rounding,
matching MSVC ``roundf``), and the ARGB32 pixel pack used by the reference
framebuffer (reference: projekt.cpp:490-493).

Everything is float32 end-to-end. Operation ORDER is part of the spec: the
NumPy golden reference (tpu_renderer.golden) uses the same formulas with the
same ordering, so the JAX path is bit-exact against it on an IEEE backend.
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32


def round_half_away(x):
    """Round to nearest, halves away from zero — C ``roundf`` semantics.

    The reference's ``RoundR32ToS32``/``RoundR32ToU32`` (used for span bounds
    at projekt.cpp:402-403, texel coords at projekt.cpp:433-434, and the ARGB
    pack at projekt.cpp:490-493) behave like ``roundf``: round(0.5)=1,
    round(-0.5)=-1, round(2.5)=3 (not banker's rounding).
    """
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + F32(0.5))


def round_to_s32(x):
    """``RoundR32ToS32``: roundf then truncate to int32."""
    return round_half_away(x).astype(jnp.int32)


def clamp01(x):
    """``Clamp01``: clamp to [0, 1] (reference light model, projekt.cpp:483)."""
    return jnp.clip(x, F32(0.0), F32(1.0))


def inner(a, b):
    """``Inner``: dot product along the last axis.

    Unrolled left-to-right (((a0*b0 + a1*b1) + a2*b2) ...) so the float32
    accumulation order is fixed — reduction primitives (jnp.sum, np.dot/BLAS)
    are free to reassociate, which breaks bit-parity between the JAX path and
    the NumPy golden.
    """
    n = a.shape[-1]
    acc = a[..., 0] * b[..., 0]
    for i in range(1, n):
        acc = acc + a[..., i] * b[..., i]
    return acc


def cross(a, b):
    """``Cross``: 3D cross product along the last axis."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def normalize(v):
    """``Normalize``: v * (1/sqrt(dot(v, v))) along the last axis.

    Written as an explicit 1.0/sqrt (NOT lax.rsqrt, which is approximate on
    TPU) with an unrolled fixed-order dot so the result is IEEE and matches
    the golden reference bit-for-bit on CPU. A zero vector yields inf/nan
    exactly like the reference would.
    """
    d = inner(v, v)[..., None]
    return v * (F32(1.0) / jnp.sqrt(d))


def hadamard(a, b):
    """``Hadamard``: elementwise product (kept for reference-map clarity)."""
    return a * b


def pow16(x):
    """x**16 via four squarings.

    The reference computes the Blinn-Phong specular exponent two ways: scalar
    ``pow(x, 16)`` (projekt.cpp:478) and four squarings in the AVX path
    (projekt.cpp:1261-1266). We standardize on the squaring form (the flagship
    path's semantics) in both the golden and the TPU implementation.
    """
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    return x8 * x8


def pack_argb(color_rgba):
    """Pack float RGBA in [0,1] into a u32 ARGB pixel.

    Matches projekt.cpp:490-493: round(A*255)<<24 | round(R*255)<<16 |
    round(G*255)<<8 | round(B*255). ``color_rgba`` has shape (..., 4) in
    (r, g, b, a) order.
    """
    c = round_half_away(color_rgba * F32(255.0)).astype(jnp.uint32)
    return (
        (c[..., 3] << 24) | (c[..., 0] << 16) | (c[..., 1] << 8) | c[..., 2]
    )


def unpack_argb(pixel_u32):
    """Unpack u32 ARGB into float RGBA in [0,1].

    Matches the texel unpack at projekt.cpp:440-443: bits[31:24]=A,
    [23:16]=R, [15:8]=G, [7:0]=B, each divided by 255.
    """
    p = pixel_u32.astype(jnp.uint32)
    inv = F32(1.0) / F32(255.0)
    a = ((p >> 24) & 0xFF).astype(F32) * inv
    r = ((p >> 16) & 0xFF).astype(F32) * inv
    g = ((p >> 8) & 0xFF).astype(F32) * inv
    b = (p & 0xFF).astype(F32) * inv
    return jnp.stack([r, g, b, a], axis=-1)
