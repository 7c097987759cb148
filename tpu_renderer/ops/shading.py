"""Deferred shading: texture sampling + per-pixel Blinn-Phong as dense XLA ops.

The reference shades inside the span fill (per fragment, projekt.cpp:427-529).
On TPU we rasterize first (G-buffer of interpolants) and shade the *winning*
fragment of every pixel once, as full-frame vector math — identical output
(only winners' colors ever reach the framebuffer) and strictly less shading
work. The texture fetch becomes one big XLA gather; the per-light loop
unrolls at trace time like the reference's light loop (projekt.cpp:460-481).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import (
    clamp01,
    inner,
    normalize,
    pow16,
    round_half_away,
    unpack_argb,
)
from ..core.types import LightData, ObjectConfig, ProjectiveTransform
from ..geometry.vertex import unproject_vertices

F32 = jnp.float32


def sample_texture(texture, u, v, uv_mode: str = "scalar",
                   filter_mode: str = "nearest"):
    """ARGB texture fetch.

    Nearest (reference-faithful): scalar mode rounds uv * (dim-1) with
    clamped indices (projekt.cpp:429-445); avx mode truncates uv * dim plus
    a uv-in-[0,1] fragment mask (projekt.cpp:1044-1060).
    Bilinear (extension, BASELINE config 3): 4-texel lerp on the scalar
    addressing convention. Returns (rgba, mask).
    """
    th, tw = texture.shape
    if filter_mode == "bilinear":
        tu = u * F32(tw - 1)
        tv = v * F32(th - 1)
        x0 = jnp.floor(tu)
        y0 = jnp.floor(tv)
        fx = (tu - x0)[..., None]
        fy = (tv - y0)[..., None]
        xi = jnp.clip(x0.astype(jnp.int32), 0, tw - 1)
        yi = jnp.clip(y0.astype(jnp.int32), 0, th - 1)
        xi1 = jnp.minimum(xi + 1, tw - 1)
        yi1 = jnp.minimum(yi + 1, th - 1)
        c00 = unpack_argb(texture[yi, xi])
        c10 = unpack_argb(texture[yi, xi1])
        c01 = unpack_argb(texture[yi1, xi])
        c11 = unpack_argb(texture[yi1, xi1])
        top = c00 + fx * (c10 - c00)
        bot = c01 + fx * (c11 - c01)
        rgba = top + fy * (bot - top)
        if uv_mode == "avx":
            mask = (u >= F32(0)) & (u <= F32(1)) & (v >= F32(0)) & (v <= F32(1))
        else:
            mask = jnp.ones(jnp.shape(u), bool)
        return rgba, mask
    if filter_mode != "nearest":
        raise ValueError(f"unknown filter_mode: {filter_mode}")
    if uv_mode == "scalar":
        tx = jnp.clip(
            round_half_away(u * F32(tw - 1)).astype(jnp.int32), 0, tw - 1
        )
        ty = jnp.clip(
            round_half_away(v * F32(th - 1)).astype(jnp.int32), 0, th - 1
        )
        mask = jnp.ones(jnp.shape(u), bool)
    elif uv_mode == "avx":
        mask = (u >= F32(0)) & (u <= F32(1)) & (v >= F32(0)) & (v <= F32(1))
        tx = jnp.clip(jnp.trunc(u * F32(tw)).astype(jnp.int32), 0, tw - 1)
        ty = jnp.clip(jnp.trunc(v * F32(th)).astype(jnp.int32), 0, th - 1)
    else:
        raise ValueError(f"unknown uv_mode: {uv_mode}")
    texel = texture[ty, tx]
    return unpack_argb(texel), mask


def phong_shade(pos, nrm, base, lights: LightData):
    """Blinn-Phong: ambient (once) + per-light diffuse + white specular^16,
    clamped at the end (projekt.cpp:450-483). Zero lights => black (the
    reference's FinalColor stays zero-initialized)."""
    white = jnp.ones((4,), F32)
    final = jnp.zeros_like(base)
    view = normalize(-pos)
    for k in range(lights.count):
        if k == 0:
            final = base * lights.ambient
        to_light = normalize(lights.light_p[k] - pos)
        cosi = clamp01(inner(nrm, to_light))
        half = normalize(to_light + view)
        spec = pow16(clamp01(inner(nrm, half)))
        final = final + cosi[..., None] * (base * lights.light_intensity[k]) \
            + spec[..., None] * (white * lights.light_intensity[k])
    return clamp01(final)


def _inner3_planes(a, b):
    """core.math.inner for 3 channel planes, identical accumulation order."""
    acc = a[0] * b[0]
    acc = acc + a[1] * b[1]
    acc = acc + a[2] * b[2]
    return acc


def _normalize3_planes(v):
    """core.math.normalize for 3 channel planes, identical op order
    (explicit 1/sqrt of the fixed-order dot, one reciprocal shared)."""
    d = _inner3_planes(v, v)
    inv = F32(1.0) / jnp.sqrt(d)
    return [v[0] * inv, v[1] * inv, v[2] * inv]


def shade_planes(z, col, nrm, px, py, cam, ambient, light_p, light_i,
                 phong: bool, n_lights: int):
    """Channel-unrolled (plane-wise) shading for UNTEXTURED configs.

    The exact computation of ``shade``/``phong_shade`` with the channel
    axis unrolled into separate (R, W) planes, so it runs inside Pallas
    kernels (which want 2D lane-major arrays, not trailing size-3/4 dims).
    Elementwise op order is identical to the array forms — results are
    bit-equal on the same backend; tests assert it.

    z/px/py: (R, W) planes (global pixel coords); col: 4 planes; nrm: 3
    planes (ignored unless phong); cam: (dat, fl, m2p, cx, cy) f32 scalars;
    ambient: 4 scalars; light_p/light_i: per-light 3/4 scalar tuples.
    Returns 4 rgba planes — the PHONG result where lit; the caller selects
    covered pixels (mirroring shade()'s jnp.where) and packs.
    """
    if not phong:
        return list(col)
    dat, fl, m2p, cx, cy = cam
    # unproject_vertices (geometry.vertex), channel-wise
    dz = dat - z
    inv_m2p = F32(1.0) / m2p
    ax = (px - cx) * inv_m2p
    ay = (py - cy) * inv_m2p
    s = dz / fl
    pos = [s * ax, s * ay, z]
    nrm = _normalize3_planes(list(nrm))  # divergence #3: single normalize
    base = list(col)
    view = _normalize3_planes([-pos[0], -pos[1], -pos[2]])
    final = [jnp.zeros_like(z) for _ in range(4)]
    for k in range(n_lights):
        if k == 0:
            final = [base[c] * ambient[c] for c in range(4)]
        to_light = _normalize3_planes(
            [light_p[k][i] - pos[i] for i in range(3)]
        )
        cosi = clamp01(_inner3_planes(nrm, to_light))
        half = _normalize3_planes(
            [to_light[i] + view[i] for i in range(3)]
        )
        spec = pow16(clamp01(_inner3_planes(nrm, half)))
        final = [
            final[c] + cosi * (base[c] * light_i[k][c])
            + spec * (F32(1.0) * light_i[k][c])
            for c in range(4)
        ]
    return [clamp01(f) for f in final]


def pack_argb_planes(r, g, b, a):
    """core.math.pack_argb with the channel axis unrolled into planes.

    Casts via int32 (Mosaic has no f32->u32 cast); identical values for the
    in-range [0, 255] rounded channels."""

    def chan(x):
        return round_half_away(x * F32(255.0)).astype(jnp.int32).astype(
            jnp.uint32
        )

    ri, gi, bi, ai = chan(r), chan(g), chan(b), chan(a)
    return (ai << 24) | (ri << 16) | (gi << 8) | bi


def shade(covered, gbuf, transform: ProjectiveTransform, lights: LightData,
          cfg: ObjectConfig, texture=None, row0=0, col0=0):
    """Shade a channel-first (11, H, W) G-buffer; returns
    (rgba(H,W,4), covered).

    Mirrors golden.cpu_reference.shade: texture replaces the interpolated
    color (so Gouraud+texture = unlit texture, the reference quirk at
    projekt.cpp:427-445 + 513); Phong consumes the (textured or vertex)
    base color per pixel. (row0, col0): global origin of the local rect
    (Phong unprojection needs global pixel coordinates).
    """
    height, width = covered.shape
    col = jnp.moveaxis(gbuf[1:5], 0, -1)  # (H, W, 4) for the vector math
    if cfg.textured:
        assert texture is not None
        inv_oz = F32(1.0) / gbuf[10]
        u = jnp.where(covered, inv_oz * gbuf[8], F32(0.0))
        v = jnp.where(covered, inv_oz * gbuf[9], F32(0.0))
        tex_rgba, tmask = sample_texture(
            texture, u, v, cfg.uv_mode, cfg.filter_mode
        )
        col = jnp.where(covered[..., None], tex_rgba, col)
        if cfg.uv_mode == "avx":
            covered = covered & tmask

    if not cfg.phong:
        return col, covered

    px = jnp.broadcast_to(
        (jnp.arange(width, dtype=F32) + jnp.asarray(col0, F32))[None, :],
        covered.shape,
    )
    py = jnp.broadcast_to(
        (jnp.arange(height, dtype=F32) + jnp.asarray(row0, F32))[:, None],
        covered.shape,
    )
    pos = unproject_vertices(px, py, gbuf[0], transform)
    nrm = normalize(jnp.moveaxis(gbuf[5:8], 0, -1))  # div. #3: 1 normalize
    final = phong_shade(pos, nrm, col, lights)
    return jnp.where(covered[..., None], final, col), covered
