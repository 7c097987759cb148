"""Vertex stage: projection, backface cull, Gouraud lighting, edge setup.

TPU-native (vectorized over all triangles as one XLA op batch) equivalent of
``ProjectVertex`` (projekt.cpp:74-93) + ``FillEdgeTable``
(projekt.cpp:3882-4121). Produces the per-triangle ``EdgeTable`` consumed by
the rasterizers. Bit-exact against the NumPy golden
(tpu_renderer.golden.cpu_reference.setup_edges) on IEEE backends: identical
formulas in identical float32 operation order.

The reference builds one flat, Y-sorted edge array per model and rasterizes
spans between adjacent active edges of the whole model; we keep the three
edges attached to their triangle (a (T, 3) table) because the TPU rasterizer
processes triangles independently (SURVEY.md §7 "scatter-free depth
composition"). The sort becomes unnecessary — triangle submission order is
preserved by the sequential z-merge, which is what the sort + strict-greater
z test achieved.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math import clamp01, inner, normalize, round_half_away
from ..core.types import NEAR_CLIP, LightData, ObjectConfig, ProjectiveTransform, RenderObject

F32 = jnp.float32
EDGE_INDICES = ((0, 1), (1, 2), (2, 0))  # projekt.cpp:3936-3941


class EdgeTable(NamedTuple):
    """Closed-form per-triangle edge records (3 candidate edges each).

    Float fields are (T, 3); col0/colg are (T, 3, 4); n0/ng are (T, 3, 3).
    ``valid`` already folds in the triangle's backface cull.
    """

    valid: jnp.ndarray  # (T, 3) bool
    ymin: jnp.ndarray
    ymax: jnp.ndarray
    x0: jnp.ndarray
    xg: jnp.ndarray
    z0: jnp.ndarray
    zg: jnp.ndarray
    oz0: jnp.ndarray
    ozg: jnp.ndarray
    u0: jnp.ndarray
    ug: jnp.ndarray
    v0: jnp.ndarray
    vg: jnp.ndarray
    left: jnp.ndarray
    col0: jnp.ndarray
    colg: jnp.ndarray
    n0: jnp.ndarray
    ng: jnp.ndarray

    @property
    def num_triangles(self) -> int:
        return self.valid.shape[0]


def concat_edge_tables(tables) -> "EdgeTable":
    """Concatenate per-object edge tables along the triangle axis.

    Row index in the result IS the scene-global triangle id: objects in
    submission order, triangles in object order — so the packed-record
    GID lane and every (z, gid) merge preserve the reference's
    submission-order depth-tie rule across a whole multi-object scene
    (projekt.cpp:495 strict-greater test, applied scene-wide)."""
    tables = list(tables)
    if len(tables) == 1:
        return tables[0]
    return EdgeTable(
        *[jnp.concatenate(cols, axis=0) for cols in zip(*tables)]
    )


def project_vertices(cam: jnp.ndarray, transform: ProjectiveTransform):
    """Perspective projection, vectorized (ProjectVertex, projekt.cpp:74-93).

    cam: (..., 3) camera-space. Returns (..., 3) with z = DistanceToPZ;
    points behind the near plane degenerate to the zero vector.
    """
    dz = transform.distance_above_target - cam[..., 2]
    s = (F32(1.0) / dz) * transform.focal_length
    px = transform.screen_center[0] + transform.meters_to_pixels * (s * cam[..., 0])
    py = transform.screen_center[1] + transform.meters_to_pixels * (s * cam[..., 1])
    out = jnp.stack([px, py, dz], axis=-1)
    return jnp.where((dz > NEAR_CLIP)[..., None], out, F32(0.0))


def unproject_vertices(px, py, z, transform: ProjectiveTransform):
    """Inverse projection (UnprojectVertex, projekt.cpp:147-160).

    px/py are screen pixel coordinates, z is camera-space z. The 8-wide AVX
    variant (UnprojectVertex_8x, projekt.cpp:102-145) is the same math over
    a pixel vector — here the vectorization is over arbitrary leading axes.
    """
    dz = transform.distance_above_target - z
    inv_m2p = F32(1.0) / transform.meters_to_pixels
    ax = (px - transform.screen_center[0]) * inv_m2p
    ay = (py - transform.screen_center[1]) * inv_m2p
    s = dz / transform.focal_length
    return jnp.stack([s * ax, s * ay, z], axis=-1)


def backface_visible(proj: jnp.ndarray):
    """Screen-space cull (projekt.cpp:3926-3943): visible iff
    dot(Eye=(0,0,-1), cross(n(p1-p0), n(p2-p0))) > 0."""
    e1 = normalize(proj[:, 1] - proj[:, 0])
    e2 = normalize(proj[:, 2] - proj[:, 0])
    return -(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]) > F32(0.0)


def gouraud_vertex_colors(
    colors, normals, cam, lights: LightData, textured: bool
):
    """Per-vertex ambient + clamped diffuse accumulation
    (projekt.cpp:4022-4063), vectorized over any leading axes.

    The light loop is unrolled at trace time (light count is static), which
    preserves the reference's sequential clamp-per-light order.
    """
    white = jnp.ones((4,), F32)
    base = jnp.broadcast_to(white, colors.shape) if textured else colors
    if lights.count == 0:
        return base  # divergence #6: raw color passthrough
    out = base * lights.ambient
    for k in range(lights.count):
        to_light = normalize(lights.light_p[k] - cam)
        d = clamp01(inner(to_light, normals))
        out = clamp01(out + d[..., None] * (base * lights.light_intensity[k]))
    return out


def setup_triangles(
    obj: RenderObject,
    transform: ProjectiveTransform,
    lights: LightData,
    cfg: ObjectConfig,
) -> EdgeTable:
    """FillEdgeTable (projekt.cpp:3882-4121), all triangles at once."""
    verts = obj.vertices.reshape(-1, 3, 3)
    colors = obj.colors.reshape(-1, 3, 4)
    normals = obj.normals.reshape(-1, 3, 3)
    uvs = obj.uvs.reshape(-1, 3, 2)

    cam = verts + obj.p  # projekt.cpp:3900-3903
    proj = project_vertices(cam, transform)
    visible = backface_visible(proj)

    if cfg.phong:
        gcol = colors
    else:
        gcol = gouraud_vertex_colors(colors, normals, cam, lights, cfg.textured)

    # All 3 edges at once on a (T, 3) edge axis (EDGE_INDICES order:
    # endpoint pairs (0,1), (1,2), (2,0) — the lo endpoint is the vertex
    # itself, the hi endpoint the next vertex, so `roll` builds the pairs
    # without gathers). Elementwise op order is identical to the golden's
    # per-edge scalar code, so bit-parity is preserved.
    def endpoints(arr):
        a_lo = arr  # vertex i0 per edge
        a_hi = jnp.roll(arr, -1, axis=1)  # vertex i1 per edge
        sel = swap.reshape(swap.shape + (1,) * (arr.ndim - 2))
        return (
            jnp.where(sel, a_hi, a_lo),  # y-min endpoint
            jnp.where(sel, a_lo, a_hi),  # y-max endpoint
        )

    y_lo = proj[:, :, 1]
    swap = y_lo > jnp.roll(y_lo, -1, axis=1)  # order endpoints by y, (T, 3)
    minv, maxv = endpoints(proj)  # (T, 3, 3)
    cam_mn, cam_mx = endpoints(cam)
    col_mn, col_mx = endpoints(gcol)
    n_mn, n_mx = endpoints(normals)
    uv_mn, uv_mx = endpoints(uvs)

    keep = (
        visible[:, None]
        & (maxv[..., 1] > F32(0.0))  # offscreen-top reject cpp:3968
        & (minv[..., 1] - maxv[..., 1] != F32(0.0))  # horizontal cpp:4066
    )  # (T, 3)

    ymax = round_half_away(maxv[..., 1])  # cpp:3988
    ymin = jnp.maximum(F32(0.0), round_half_away(minv[..., 1]))  # cpp:3999
    neg = minv[..., 1] < F32(0.0)
    clipped_y = jnp.where(neg, -minv[..., 1], F32(0.0))
    tt = jnp.where(
        neg, (-minv[..., 1]) / (maxv[..., 1] - minv[..., 1]), F32(0.0)
    )

    ydiff = ymax - ymin
    xg = (maxv[..., 0] - minv[..., 0]) / (maxv[..., 1] - minv[..., 1])  # cpp:4073
    zg = (cam_mx[..., 2] - cam_mn[..., 2]) / ydiff  # cpp:4072 (rounded diff)
    x0 = minv[..., 0] + clipped_y * xg  # cpp:4075
    z0 = cam_mn[..., 2] + clipped_y * zg  # cpp:4076

    oz0 = F32(1.0) / minv[..., 2]  # cpp:4004 (inf when degenerate)
    u0 = uv_mn[..., 0] / minv[..., 2]
    v0 = uv_mn[..., 1] / minv[..., 2]
    if cfg.textured:  # cpp:4078-4089
        u1 = uv_mx[..., 0] * (F32(1.0) / maxv[..., 2])
        v1 = uv_mx[..., 1] * (F32(1.0) / maxv[..., 2])
        ug = (u1 - u0) / ydiff
        vg = (v1 - v0) / ydiff
        ozg = ((F32(1.0) / maxv[..., 2]) - oz0) / ydiff
        u0 = u0 + clipped_y * ug
        v0 = v0 + clipped_y * vg
        oz0 = oz0 + clipped_y * ozg
    else:
        ug = vg = ozg = jnp.zeros_like(oz0)  # divergence #5

    # Top-clip color lerp (cpp:4091); normals are NOT lerped (quirk).
    col0 = (F32(1.0) - tt)[..., None] * col_mn + tt[..., None] * col_mx
    colg = (col_mx - col0) / ydiff[..., None]
    if cfg.phong:
        n0, ng = n_mn, (n_mx - n_mn) / ydiff[..., None]
    else:
        n0 = ng = jnp.zeros_like(n_mn)

    left = jnp.where(
        ymin == round_half_away(y_lo), F32(1.0), F32(0.0)
    )  # cpp:4093

    vals = dict(
        valid=keep, ymin=ymin, ymax=ymax, x0=x0, xg=xg, z0=z0, zg=zg,
        oz0=oz0, ozg=ozg, u0=u0, ug=ug, v0=v0, vg=vg, left=left,
        col0=col0, colg=colg, n0=n0, ng=ng,
    )
    out = {}
    for name, val in vals.items():
        if name == "valid":
            out[name] = val
        else:
            mask = keep.reshape(keep.shape + (1,) * (val.ndim - 2))
            out[name] = jnp.where(mask, val, F32(0.0))
    return EdgeTable(**out)
