"""Vertex stage: projection, backface cull, Gouraud lighting, edge setup.

TPU-native (vectorized over all triangles as one XLA op batch) equivalent of
``ProjectVertex`` (projekt.cpp:74-93) + ``FillEdgeTable``
(projekt.cpp:3882-4121). Bit-exact against the NumPy golden
(tpu_renderer.golden.cpu_reference.setup_edges) on IEEE backends: identical
formulas in identical float32 operation order.

CHANNEL-MAJOR CORE (round 3): the computation runs on (T,)-minor rows —
every scalar field of every edge is one (T,) vector — and the primary
output is the PACKED RECORD TABLE itself (``setup_records``: (85, T),
lane-major), which a trivial Pallas transpose turns into the row-major
(T, 128) table the rasterizer's row gathers want. The old pipeline
materialized an EdgeTable of (T, 3)-minor fields and re-assembled them
into records afterwards; XLA moved those ~85 columns at ~8 GB/s
(strided (T, 3)-minor layouts), costing ~16 ms at 250k triangles and
~64 ms at 1M — the single largest frame cost. Here the fields fuse
directly into the record write and the EdgeTable (``setup_triangles``)
becomes a derived VIEW used by the pure-JAX reference path and the tests.

The reference builds one flat, Y-sorted edge array per model and rasterizes
spans between adjacent active edges of the whole model; we keep the three
edges attached to their triangle because the TPU rasterizer processes
triangles independently (SURVEY.md §7 "scatter-free depth composition").
The sort becomes unnecessary — triangle submission order is preserved by
the sequential z-merge, which is what the sort + strict-greater z test
achieved.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math import clamp01, inner, normalize, round_half_away
from ..core.types import NEAR_CLIP, LightData, ObjectConfig, ProjectiveTransform, RenderObject

F32 = jnp.float32
EDGE_INDICES = ((0, 1), (1, 2), (2, 0))  # projekt.cpp:3936-3941

# Packed-record layout (shared with ops.raster_pallas): 3 edges x 28 field
# lanes + the global triangle id, padded to one 128-lane f32 row. Per-edge
# lane order: [valid, ymin, ymax, x0, xg, z0, zg, oz0, ozg, u0, ug, v0, vg,
# left, col0 rgba, colg rgba, n0 xyz, ng xyz].
EDGE_STRIDE = 28
GID_LANE = 84  # 3 * EDGE_STRIDE
REC_ROWS = 85  # field rows incl. gid (pad to REC_LANES in the table)
REC_LANES = 128


class EdgeTable(NamedTuple):
    """Closed-form per-triangle edge records (3 candidate edges each).

    Float fields are (T, 3); col0/colg are (T, 3, 4); n0/ng are (T, 3, 3).
    ``valid`` already folds in the triangle's backface cull. This is the
    (T, 3)-minor VIEW of the channel-major setup — consumed by the pure-JAX
    reference rasterizer, the mask-strategy packers, and the tests; the
    sorted Pallas path consumes ``setup_records`` directly.
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


def _norm3(x, y, z):
    """normalize() on separate component rows — identical op order to
    core.math.normalize's unrolled inner: ((x*x + y*y) + z*z)."""
    d = x * x + y * y
    d = d + z * z
    inv = F32(1.0) / jnp.sqrt(d)
    return x * inv, y * inv, z * inv


def _setup_fields(
    obj: RenderObject,
    transform: ProjectiveTransform,
    lights: LightData,
    cfg: ObjectConfig,
):
    """FillEdgeTable (projekt.cpp:3882-4121), channel-major.

    Everything is batched over the EDGE axis as (3, T) rows (edge-channel
    arrays as (C, 3, T)) — per-element formulas and float32 op order are
    identical to the NumPy golden's per-edge scalar code (golden
    divergences apply as documented there). The batched form matters for
    compile time, not values: an earlier revision unrolled the 3 edges,
    4 channels, and the light loop into ~300 scalar-row HLO ops, which
    doubled every pipeline compile (the test suite went 20 -> 45+ min).

    Returns (fields, keep): ``fields`` is (28, 3, T) f32 — packed-record
    field f of edge e at [f, e] (EDGE_STRIDE lane order, masked to 0
    outside ``keep``); ``keep`` the (3, T) per-edge validity bools.
    """
    T = obj.num_triangles

    # Camera-space vertices (projekt.cpp:3900-3903): (3c, 3v, T).
    cam = obj.vertices + obj.p[:, None, None]

    # ProjectVertex (projekt.cpp:74-93), all 3 vertices at once ((3v, T)
    # rows); near-plane degenerate vertices zero all three components.
    dat = transform.distance_above_target
    fl = transform.focal_length
    m2p = transform.meters_to_pixels
    dz = dat - cam[2]
    s = (F32(1.0) / dz) * fl
    x = transform.screen_center[0] + m2p * (s * cam[0])
    y = transform.screen_center[1] + m2p * (s * cam[1])
    good = dz > NEAR_CLIP
    px = jnp.where(good, x, F32(0.0))
    py = jnp.where(good, y, F32(0.0))
    pz = jnp.where(good, dz, F32(0.0))

    # Screen-space backface cull (projekt.cpp:3926-3943).
    e1 = _norm3(px[1] - px[0], py[1] - py[0], pz[1] - pz[0])
    e2 = _norm3(px[2] - px[0], py[2] - py[0], pz[2] - pz[0])
    visible = -(e1[0] * e2[1] - e1[1] * e2[0]) > F32(0.0)  # (T,)

    # Per-vertex colors: raw under Phong, Gouraud-baked otherwise
    # (projekt.cpp:4022-4063; textured => white base). (4, 3v, T).
    if cfg.phong:
        gcol = obj.colors
    else:
        base = (jnp.ones((4, 3, T), F32) if cfg.textured else obj.colors)
        if lights.count == 0:
            gcol = base  # divergence #6: raw color passthrough
        else:
            out = base * lights.ambient[:, None, None]
            for li in range(lights.count):
                tl = _norm3(
                    lights.light_p[li, 0] - cam[0],
                    lights.light_p[li, 1] - cam[1],
                    lights.light_p[li, 2] - cam[2],
                )
                d = tl[0] * obj.normals[0]
                d = d + tl[1] * obj.normals[1]
                d = d + tl[2] * obj.normals[2]
                d = clamp01(d)  # (3v, T)
                out = clamp01(
                    out
                    + d[None]
                    * (base * lights.light_intensity[li][:, None, None])
                )
            gcol = out

    # Edge e pairs vertex e (lo) with vertex (e+1)%3 (hi): the vertex axis
    # IS the edge axis once 'hi' comes from a roll (EDGE_INDICES order).
    y_lo = py
    swap = y_lo > jnp.roll(py, -1, axis=0)  # order endpoints by y, (3e, T)

    def sel(arr, axis=0):
        hi = jnp.roll(arr, -1, axis=axis)
        sw = swap if axis == 0 else swap[None]
        return jnp.where(sw, hi, arr), jnp.where(sw, arr, hi)

    minv_x, maxv_x = sel(px)
    minv_y, maxv_y = sel(py)
    minv_z, maxv_z = sel(pz)
    camz_mn, camz_mx = sel(cam[2])
    uvu_mn, uvu_mx = sel(obj.uvs[0])
    uvv_mn, uvv_mx = sel(obj.uvs[1])

    keep = (
        visible[None]
        & (maxv_y > F32(0.0))  # offscreen-top reject cpp:3968
        & (minv_y - maxv_y != F32(0.0))  # horizontal cpp:4066
    )  # (3e, T)

    ymax = round_half_away(maxv_y)  # cpp:3988
    ymin = jnp.maximum(F32(0.0), round_half_away(minv_y))  # cpp:3999
    neg = minv_y < F32(0.0)
    clipped_y = jnp.where(neg, -minv_y, F32(0.0))
    tt = jnp.where(neg, (-minv_y) / (maxv_y - minv_y), F32(0.0))

    ydiff = ymax - ymin
    xg = (maxv_x - minv_x) / (maxv_y - minv_y)  # cpp:4073
    zg = (camz_mx - camz_mn) / ydiff  # cpp:4072 (rounded diff)
    x0 = minv_x + clipped_y * xg  # cpp:4075
    z0 = camz_mn + clipped_y * zg  # cpp:4076

    if cfg.textured:  # cpp:4078-4089
        oz0 = F32(1.0) / minv_z  # cpp:4004 (inf when degenerate)
        u0 = uvu_mn / minv_z
        v0 = uvv_mn / minv_z
        ozmax = F32(1.0) / maxv_z
        u1 = uvu_mx * ozmax
        v1 = uvv_mx * ozmax
        ug = (u1 - u0) / ydiff
        vg = (v1 - v0) / ydiff
        ozg = (ozmax - oz0) / ydiff
        u0 = u0 + clipped_y * ug
        v0 = v0 + clipped_y * vg
        oz0 = oz0 + clipped_y * ozg
    else:
        # divergence #5: all six u/v/1-z fields are 0 untextured (never
        # consumed; skips 3 divides per edge — spec'd in the golden).
        u0 = v0 = oz0 = ug = vg = ozg = jnp.zeros((3, T), F32)

    left = jnp.where(
        ymin == round_half_away(y_lo), F32(1.0), F32(0.0)
    )  # cpp:4093

    # Top-clip color lerp (cpp:4091); normals are NOT lerped (quirk).
    col_mn, col_mx = sel(gcol, axis=1)  # (4, 3e, T)
    col0 = (F32(1.0) - tt)[None] * col_mn + tt[None] * col_mx
    colg = (col_mx - col0) / ydiff[None]
    if cfg.phong:
        n_mn, n_mx = sel(obj.normals, axis=1)  # (3, 3e, T)
        n0 = n_mn
        ng = (n_mx - n_mn) / ydiff[None]
    else:
        n0 = ng = jnp.zeros((3, 3, T), F32)

    fields = jnp.concatenate(
        [
            jnp.stack([keep.astype(F32), ymin, ymax, x0, xg, z0, zg,
                       oz0, ozg, u0, ug, v0, vg, left]),
            col0, colg, n0, ng,
        ],
        axis=0,
    )  # (EDGE_STRIDE, 3e, T)
    # Mask every lane to 0 outside keep (the valid lane already is).
    return jnp.where(keep[None], fields, F32(0.0)), keep


def setup_records(
    obj: RenderObject,
    transform: ProjectiveTransform,
    lights: LightData,
    cfg: ObjectConfig,
    gid0: int = 0,
) -> jnp.ndarray:
    """Channel-major packed record table: (85, T) f32, lane-major.

    Row r < 84 is record field lane r (see EDGE_STRIDE layout above); row
    84 is the GLOBAL triangle id ``gid0 + arange(T)`` (f32-exact to 2**24
    scene triangles). ``ops.raster_pallas.finish_records`` pads and
    transposes this into the row-major (T, 128) table the sorted strategy
    gathers from; ``ops.binning.triangle_bbox_rows`` derives binning
    bboxes straight from its rows. The field math fuses into this single
    write — no (T, 3)-minor EdgeTable materializes on the fast path."""
    fields, _ = _setup_fields(obj, transform, lights, cfg)
    T = obj.num_triangles
    # (EDGE_STRIDE, 3, T) -> lane order e * EDGE_STRIDE + f: edge-major.
    rec = jnp.transpose(fields, (1, 0, 2)).reshape(3 * EDGE_STRIDE, T)
    gid = jnp.arange(T, dtype=jnp.int32) + jnp.int32(gid0)
    return jnp.concatenate([rec, gid.astype(F32)[None]], axis=0)


def setup_triangles(
    obj: RenderObject,
    transform: ProjectiveTransform,
    lights: LightData,
    cfg: ObjectConfig,
) -> EdgeTable:
    """FillEdgeTable (projekt.cpp:3882-4121) as the (T, 3)-minor EdgeTable
    view — same channel-major core as ``setup_records``, re-stacked for the
    pure-JAX reference rasterizer / golden comparisons (bit-identical
    values; only the layout differs)."""
    fields, keep = _setup_fields(obj, transform, lights, cfg)

    def f(j):  # scalar field j -> (T, 3)
        return fields[j].T

    def fvec(j0, n):  # n-channel field at lane j0 -> (T, 3, n)
        return jnp.transpose(fields[j0:j0 + n], (2, 1, 0))

    return EdgeTable(
        valid=keep.T,
        ymin=f(1), ymax=f(2), x0=f(3), xg=f(4), z0=f(5), zg=f(6),
        oz0=f(7), ozg=f(8), u0=f(9), ug=f(10), v0=f(11), vg=f(12),
        left=f(13),
        col0=fvec(14, 4), colg=fvec(18, 4), n0=fvec(22, 3), ng=fvec(25, 3),
    )
