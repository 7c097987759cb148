"""Fused Pallas vertex/setup stage: triangle soup -> packed record table.

One kernel replaces the XLA chain setup_records -> finish_records ->
triangle_bbox_rows. The XLA form of that chain moved every (3, T)-row
intermediate through HBM (~16 ms at 1M triangles, ~35% of the whole frame);
here each grid step keeps one triangle block VMEM-resident, runs the entire
FillEdgeTable math (projekt.cpp:3882-4121 — projection, backface cull,
Gouraud bake, edge gradients), and writes BOTH rasterizer inputs directly:

- the ROW-MAJOR (Tp, 128) packed record table (the layout the sorted
  strategy's per-entry row gather wants, see finish_records), and
- the (8, Tp) binning bbox rows (ops.binning._bbox_core outputs).

Formulas are the channel-unrolled restatement of geometry.vertex's
_setup_fields — identical float32 op order per element (the channel axis
only batches independent lanes), so outputs are BIT-IDENTICAL; tests
compare against the XLA path exactly (tests/test_setup_fused.py).

The scalar camera/light/position parameters ride one SMEM vector (the
shade_params pattern); per-vertex arrays stream as channel-major blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import clamp01, round_half_away
from ..core.types import (
    NEAR_CLIP,
    LightData,
    ObjectConfig,
    ProjectiveTransform,
    RenderObject,
)
from ..geometry.vertex import EDGE_STRIDE, GID_LANE, REC_LANES
from .binning import _bbox_core

F32 = jnp.float32

SETUP_BLK = 1024  # triangles per grid step
# Below this triangle count the XLA setup chain is used instead: the
# assembly tax it pays is linear in T (~64 ns/triangle) while the kernel
# has fixed per-launch/per-block costs, and tiny objects would pad a
# whole block.
FUSED_SETUP_MIN = 4096

# Sublane packing: run the field math on (channels, 3, 8, blk/8) blocks
# instead of (channels, 3, blk). The flat form's (3, blk) vectors occupy
# 3 of 8 sublanes in every vreg (37.5% utilization on the ~200-op field
# chain); the packed form fills all 8. The relayout is FREE on both
# ends: the host-side (c, 3, Tp) -> (c, 3, Tp/L, L) reshape is
# contiguous, 4D BlockSpecs deliver (c, 3, 8, L) blocks directly, and
# every op in the kernel is elementwise over the triangle axis, so the
# math is bit-identical — only the record/bbox assembly at the end
# differs (8 (128, L) transposes instead of 1 (128, blk)). Requires
# blk >= 1024 so L = blk/8 keeps full 128-lane rows. The round-3
# hardware A/B (.ab_setup_packed.py) measured the packed form slightly
# SLOWER (setup-only 10.98 vs 10.70 ms at 1M triangles, 22.46 vs
# 21.63 ms at 2M; end-to-end a wash at 124.2 vs 124.0 ms) — Mosaic
# evidently already packs the flat (3, blk) layout well, and the 4D
# indexing + extra transposes eat the theoretical vreg win — so the
# default stays False; the variant stays tested for future toolchains.
SETUP_PACKED = False

# Probe hook (timing-only; outputs are WRONG except 'rowmajor'): what the
# fused kernel emits, to attribute the ~3x-over-BW-floor setup cost
# (VERDICT r4 item 4) between field math, the in-kernel (128, blk)
# transpose, and the HBM write.
#   'rowmajor'    shipped behavior (transpose + row-major write)
#   'rowmajor128' transpose in (128, 128) chunks (Mosaic-native tiles)
#   'chanmajor'   write the channel-major block untransposed
#   'none'        skip the record write entirely (math + bbox only)
_PROBE_EMIT = "rowmajor"


@jax.tree_util.register_pytree_node_class
class SetupOut:
    """Fused setup products, accepted by the raster entry points in place
    of an EdgeTable / channel-major record table.

    recs: (Tp, REC_LANES) row-major packed records
    bbox: (tri_valid, ylo, yhi, xlo, xhi), rows (Tp,)
    num_triangles: true (unpadded) T — static aux data, so it survives a
    jit boundary as a Python int (policy decisions branch on it).
    """

    def __init__(self, recs, bbox, num_triangles: int):
        self.recs = recs
        self.bbox = tuple(bbox)
        self.num_triangles = int(num_triangles)

    def tree_flatten(self):
        return (self.recs, self.bbox), self.num_triangles

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


def _setup_blk(T: int) -> int:
    """Grid block: small enough not to over-pad, large enough to amortize
    per-step overhead (must stay a multiple of 128 for the in-kernel
    (lanes, blk) transpose)."""
    if T >= 16384:
        return SETUP_BLK
    if T >= 1024:
        return 512
    return 128


def setup_for_raster(
    obj: RenderObject,
    transform: ProjectiveTransform,
    lights: LightData,
    cfg: ObjectConfig,
    gid0: int = 0,
    frame_height: int | None = None,
    frame_width: int | None = None,
):
    """Vertex stage for the Pallas raster paths: the fused kernel above
    FUSED_SETUP_MIN triangles (returns SetupOut), the XLA chain below it
    (returns the channel-major (85, T) table)."""
    from ..geometry.vertex import setup_records

    T = obj.num_triangles
    if T < FUSED_SETUP_MIN or frame_height is None:
        return setup_records(obj, transform, lights, cfg, gid0)
    recs, bbox = setup_records_fused(
        obj, transform, lights, cfg, gid0, frame_height, frame_width,
        _setup_blk(T),
    )
    return SetupOut(recs, bbox, T)


def _roll_up(a, axis=0):
    """jnp.roll(a, -1, axis) via static slices (Mosaic-friendly)."""
    if axis == 0:
        return jnp.concatenate([a[1:], a[:1]], axis=0)
    raise ValueError(axis)


def _norm3(x, y, z):
    """Identical op order to geometry.vertex._norm3."""
    d = x * x + y * y
    d = d + z * z
    inv = F32(1.0) / jnp.sqrt(d)
    return x * inv, y * inv, z * inv


def setup_params(
    obj_p, transform: ProjectiveTransform, lights: LightData
) -> jnp.ndarray:
    """Flat f32 SMEM vector: [dat, fl, m2p, cx, cy, p xyz, ambient rgba,
    (light_p xyz, light_I rgba) per light]."""
    parts = [
        jnp.asarray(transform.distance_above_target, F32).reshape(1),
        jnp.asarray(transform.focal_length, F32).reshape(1),
        jnp.asarray(transform.meters_to_pixels, F32).reshape(1),
        jnp.asarray(transform.screen_center, F32).reshape(2),
        jnp.asarray(obj_p, F32).reshape(3),
        jnp.asarray(lights.ambient, F32).reshape(4),
    ]
    for k in range(lights.count):
        parts.append(jnp.asarray(lights.light_p[k], F32).reshape(3))
        parts.append(jnp.asarray(lights.light_intensity[k], F32).reshape(4))
    return jnp.concatenate(parts)


def _setup_kernel(params, verts_ref, cols_ref, nrms_ref, uvs_ref,
                  recs_ref, bbox_ref, *, n_lights, phong, textured, gid0,
                  frame_height, frame_width, blk, packed=False):
    """One SETUP_BLK-triangle block: full edge setup + record/bbox write.

    The math mirrors geometry.vertex._setup_fields line-for-line with the
    color/normal channel axis unrolled into Python loops (same per-element
    op order — any change THERE must be mirrored HERE and in the NumPy
    golden). ``packed`` (SETUP_PACKED): the triangle axis arrives
    pre-split as (8, blk/8) — every op below is elementwise over it, so
    the math is untouched and bit-identical; only the final record/bbox
    assembly branches."""
    b = pl.program_id(0)
    dat, fl, m2p = params[0], params[1], params[2]
    cx, cy = params[3], params[4]
    p = (params[5], params[6], params[7])
    amb = tuple(params[8 + c] for c in range(4))
    lp = [tuple(params[12 + 7 * k + i] for i in range(3))
          for k in range(n_lights)]
    li = [tuple(params[12 + 7 * k + 3 + c] for c in range(4))
          for k in range(n_lights)]

    verts = verts_ref[:]  # (3c, 3v, B)
    cam = [verts[c] + p[c] for c in range(3)]  # (3v, B) each component

    # ProjectVertex (projekt.cpp:74-93).
    dz = dat - cam[2]
    s = (F32(1.0) / dz) * fl
    x = cx + m2p * (s * cam[0])
    y = cy + m2p * (s * cam[1])
    good = dz > NEAR_CLIP
    px = jnp.where(good, x, F32(0.0))
    py = jnp.where(good, y, F32(0.0))
    pz = jnp.where(good, dz, F32(0.0))

    def row(a, i):
        return a[i:i + 1]  # (1, B) — keep everything 2D for Mosaic

    # Screen-space backface cull (projekt.cpp:3926-3943).
    e1 = _norm3(row(px, 1) - row(px, 0), row(py, 1) - row(py, 0),
                row(pz, 1) - row(pz, 0))
    e2 = _norm3(row(px, 2) - row(px, 0), row(py, 2) - row(py, 0),
                row(pz, 2) - row(pz, 0))
    visible = -(e1[0] * e2[1] - e1[1] * e2[0]) > F32(0.0)  # (1, B)

    colors = [cols_ref[c] for c in range(4)]  # (3v, B) each
    normals = [nrms_ref[c] for c in range(3)]
    uvu, uvv = uvs_ref[0], uvs_ref[1]

    # Per-vertex colors: raw under Phong, Gouraud-baked otherwise
    # (projekt.cpp:4022-4063; textured => white base).
    if phong:
        gcol = colors
    else:
        ones = jnp.ones_like(colors[0])
        base = [ones] * 4 if textured else colors
        if n_lights == 0:
            gcol = base  # divergence #6: raw color passthrough
        else:
            out = [base[c] * amb[c] for c in range(4)]
            for k in range(n_lights):
                tl = _norm3(lp[k][0] - cam[0], lp[k][1] - cam[1],
                            lp[k][2] - cam[2])
                d = tl[0] * normals[0]
                d = d + tl[1] * normals[1]
                d = d + tl[2] * normals[2]
                d = clamp01(d)  # (3v, B)
                out = [clamp01(out[c] + d * (base[c] * li[k][c]))
                       for c in range(4)]
            gcol = out

    # Edge e = (vertex e, vertex (e+1)%3), endpoints ordered by y.
    y_lo = py
    swap = y_lo > _roll_up(py)  # (3e, B)

    def sel(arr):
        hi = _roll_up(arr)
        return jnp.where(swap, hi, arr), jnp.where(swap, arr, hi)

    minv_x, maxv_x = sel(px)
    minv_y, maxv_y = sel(py)
    minv_z, maxv_z = sel(pz)
    camz_mn, camz_mx = sel(cam[2])
    uvu_mn, uvu_mx = sel(uvu)
    uvv_mn, uvv_mx = sel(uvv)

    keep = (
        visible
        & (maxv_y > F32(0.0))  # offscreen-top reject cpp:3968
        & (minv_y - maxv_y != F32(0.0))  # horizontal cpp:4066
    )  # (3e, B)

    ymax = round_half_away(maxv_y)  # cpp:3988
    ymin = jnp.maximum(F32(0.0), round_half_away(minv_y))  # cpp:3999
    neg = minv_y < F32(0.0)
    clipped_y = jnp.where(neg, -minv_y, F32(0.0))
    tt = jnp.where(neg, (-minv_y) / (maxv_y - minv_y), F32(0.0))

    ydiff = ymax - ymin
    xg = (maxv_x - minv_x) / (maxv_y - minv_y)  # cpp:4073
    zg = (camz_mx - camz_mn) / ydiff  # cpp:4072
    x0 = minv_x + clipped_y * xg  # cpp:4075
    z0 = camz_mn + clipped_y * zg  # cpp:4076

    if textured:  # cpp:4078-4089
        oz0 = F32(1.0) / minv_z  # cpp:4004
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
        # divergence #5: all six u/v/1-z fields are 0 untextured — the
        # trim saves 3 VPU divides (Newton chains) per edge per
        # triangle in this kernel's hot loop.
        zero = jnp.zeros_like(ydiff)
        u0 = v0 = oz0 = ug = vg = ozg = zero

    left = jnp.where(
        ymin == round_half_away(y_lo), F32(1.0), F32(0.0)
    )  # cpp:4093

    # Top-clip color lerp (cpp:4091); normals are NOT lerped (quirk).
    col0, colg = [], []
    for c in range(4):
        mn, mx = sel(gcol[c])
        c0 = (F32(1.0) - tt) * mn + tt * mx
        col0.append(c0)
        colg.append((mx - c0) / ydiff)
    if phong:
        n0, ng = [], []
        for c in range(3):
            mn, mx = sel(normals[c])
            n0.append(mn)
            ng.append((mx - mn) / ydiff)
    else:
        zero = jnp.zeros_like(ydiff)
        n0 = [zero] * 3
        ng = [zero] * 3

    fields = [keep.astype(F32), ymin, ymax, x0, xg, z0, zg,
              oz0, ozg, u0, ug, v0, vg, left] + col0 + colg + n0 + ng
    assert len(fields) == EDGE_STRIDE
    fields = [jnp.where(keep, f, F32(0.0)) for f in fields]

    # Assemble (REC_LANES, B) in edge-major lane order e * EDGE_STRIDE + f,
    # then transpose to the row-major block (finish_records layout).
    stacked = jnp.stack(fields, axis=0)  # (28, 3, B) / (28, 3, 8, L)
    if packed:
        sub, L = 8, blk // 8
        r84 = jnp.transpose(stacked, (1, 0, 2, 3)).reshape(
            3 * EDGE_STRIDE, sub, L
        )
        # Triangle t (block-local) sits at (sublane t // L, lane t % L).
        gid_row = (
            jax.lax.broadcasted_iota(jnp.int32, (1, sub, L), 1) * L
            + jax.lax.broadcasted_iota(jnp.int32, (1, sub, L), 2)
            + (b * blk + gid0)
        ).astype(F32)
        pad = jnp.zeros((REC_LANES - GID_LANE - 1, sub, L), F32)
        full = jnp.concatenate([r84, gid_row, pad], axis=0)  # (128, 8, L)
        for s in range(sub):
            recs_ref[s * L:(s + 1) * L, :] = jnp.transpose(full[:, s, :])
    else:
        r84 = jnp.transpose(stacked, (1, 0, 2)).reshape(
            3 * EDGE_STRIDE, blk
        )
        gid_row = (
            jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
            + (b * blk + gid0)
        ).astype(F32)
        pad = jnp.zeros((REC_LANES - GID_LANE - 1, blk), F32)
        full = jnp.concatenate([r84, gid_row, pad], axis=0)  # (128, B)
        if _PROBE_EMIT == "chanmajor":
            recs_ref[:] = full  # probe-only: untransposed layout
        elif _PROBE_EMIT == "none":
            # probe-only: skip the record write (one tiny token write so
            # the output is not dead-coded away with the math).
            recs_ref[0:8, :] = jnp.transpose(full[:, 0:8])
        elif _PROBE_EMIT == "rowmajor128":
            for j in range(blk // 128):
                recs_ref[j * 128:(j + 1) * 128, :] = jnp.transpose(
                    full[:, j * 128:(j + 1) * 128]
                )
        else:
            recs_ref[:] = jnp.transpose(full)

    # Binning bbox (ops.binning._bbox_core — identical op order to
    # triangle_bbox_rows' use of it).
    tri_valid, ylo, yhi, xlo, xhi = _bbox_core(
        [row(keep, e) for e in range(3)],
        [row(ymin, e) for e in range(3)],
        [row(ymax, e) for e in range(3)],
        [row(x0, e) for e in range(3)],
        [row(xg, e) for e in range(3)],
        frame_height, frame_width,
    )
    zero_rows = (
        jnp.zeros((3, 8, blk // 8), F32) if packed
        else jnp.zeros((3, blk), F32)
    )
    bbox_ref[:] = jnp.concatenate(
        [tri_valid.astype(F32), ylo, yhi, xlo, xhi, zero_rows], axis=0,
    )


def setup_records_fused(
    obj: RenderObject,
    transform: ProjectiveTransform,
    lights: LightData,
    cfg: ObjectConfig,
    gid0: int = 0,
    frame_height: int | None = None,
    frame_width: int | None = None,
    blk: int = SETUP_BLK,
):
    """Fused vertex stage -> (recs (Tp, 128) row-major, bbox 5-tuple).

    Tp pads T to a ``blk`` multiple; padded rows are invalid records
    (all-zero inputs fail the backface test) and bbox-invalid, so every
    downstream consumer treats them as empty. ``bbox`` is
    (tri_valid bool, ylo, yhi, xlo, xhi), each (Tp,) — exactly
    ops.binning.triangle_bbox_rows' output for the same table."""
    if frame_height is None or frame_width is None:
        raise ValueError("setup_records_fused needs the global frame dims")
    gid0 = int(gid0)  # static: baked into the kernel's gid iota
    T = obj.num_triangles
    tp = -(-max(T, 1) // blk) * blk
    packed = SETUP_PACKED and blk >= 1024
    L = blk // 8

    if packed:
        # (c, 3, Tp) -> (c, 3, Tp/L, L) is a contiguous (free) reshape;
        # the 4D BlockSpec then delivers (c, 3, 8, L) blocks whose
        # (sublane, lane) pair (s, l) is block-local triangle s * L + l —
        # no in-kernel relayout anywhere.
        def padt(a):
            a = jnp.pad(a, ((0, 0), (0, 0), (0, tp - T)))
            return a.reshape(a.shape[0], 3, tp // L, L)

        def in_spec(c):
            return pl.BlockSpec((c, 3, 8, L), lambda b: (0, 0, b, 0))

        bbox_spec = pl.BlockSpec((8, 8, L), lambda b: (0, b, 0))
        bbox_shape = jax.ShapeDtypeStruct((8, tp // L, L), F32)
    else:
        def padt(a):
            return jnp.pad(a, ((0, 0), (0, 0), (0, tp - T)))

        def in_spec(c):
            return pl.BlockSpec((c, 3, blk), lambda b: (0, 0, b))

        bbox_spec = pl.BlockSpec((8, blk), lambda b: (0, b))
        bbox_shape = jax.ShapeDtypeStruct((8, tp), F32)

    params = setup_params(obj.p, transform, lights)
    kernel = functools.partial(
        _setup_kernel, n_lights=lights.count, phong=cfg.phong,
        textured=cfg.textured, gid0=gid0, frame_height=frame_height,
        frame_width=frame_width, blk=blk, packed=packed,
    )
    if _PROBE_EMIT == "chanmajor":  # probe-only: untransposed output
        rec_spec = pl.BlockSpec((REC_LANES, blk), lambda b: (0, b))
        rec_shape = jax.ShapeDtypeStruct((REC_LANES, tp), F32)
    else:
        rec_spec = pl.BlockSpec((blk, REC_LANES), lambda b: (b, 0))
        rec_shape = jax.ShapeDtypeStruct((tp, REC_LANES), F32)
    recs, bbox = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(tp // blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            in_spec(3), in_spec(4), in_spec(3), in_spec(2),
        ],
        out_specs=[
            rec_spec,
            bbox_spec,
        ],
        out_shape=[
            rec_shape,
            bbox_shape,
        ],
    )(
        params, padt(obj.vertices), padt(obj.colors), padt(obj.normals),
        padt(obj.uvs),
    )
    if packed:
        bbox = bbox.reshape(8, tp)  # contiguous merge, free
    bbox5 = (bbox[0] > F32(0.5), bbox[1], bbox[2], bbox[3], bbox[4])
    return recs, bbox5
