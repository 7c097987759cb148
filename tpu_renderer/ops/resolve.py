"""Attribute resolve: visibility buffer -> full G-buffer (dense XLA).

Given the winning triangle id per pixel (from ops.raster_pallas), gather that
triangle's edge records and re-evaluate all interpolants (color, normal,
u/z, v/z, 1/z) at the pixel with the identical closed forms the rasterizers
use (ops.spans semantics, projekt.cpp:306-539). This is pure gather + dense
vector math — the TPU-friendly inversion of the reference's per-fragment
scatter — and it runs exactly once per visible pixel.

Performance shape:
- all per-triangle fields are packed into ONE (T, 128) f32 record row so the
  per-pixel gather is a single contiguous row fetch (TPU row-gathers cost
  per-row, not per-byte; per-field scalar gathers measured 30x slower);
- all per-edge intermediates are plain (R, W) arrays — trailing size-3 dims
  force padded layouts/relayouts on TPU (same pathology as in the
  visibility kernel).
Row-chunked with lax.map so the gathered (rows, W, 128) block stays bounded
(row_block=32 measured best; bigger blocks thrash).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import round_half_away
from ..geometry.vertex import EdgeTable
from .raster_reference import GBUF_CHANNELS

F32 = jnp.float32
_BIG = 3.4028235e38

# Per-edge field layout inside the packed record (28 floats per edge).
_F_VALID, _F_YMIN, _F_YMAX, _F_X0, _F_XG, _F_Z0, _F_ZG = range(7)
_F_OZ0, _F_OZG, _F_U0, _F_UG, _F_V0, _F_VG, _F_LEFT = range(7, 14)
_F_COL0 = 14  # 4 floats
_F_COLG = 18  # 4 floats
_F_N0 = 22  # 3 floats
_F_NG = 25  # 3 floats
EDGE_STRIDE = 28
REC_LANES = 128  # 3 * 28 = 84, padded to one full lane row


def pack_attr_records(edges: EdgeTable) -> jnp.ndarray:
    """(T, 128) f32 packed records (3 edges x 28 fields, lane-padded)."""
    cols = []
    for e in range(3):
        cols += [
            edges.valid[:, e].astype(F32),
            edges.ymin[:, e],
            edges.ymax[:, e],
            edges.x0[:, e],
            edges.xg[:, e],
            edges.z0[:, e],
            edges.zg[:, e],
            edges.oz0[:, e],
            edges.ozg[:, e],
            edges.u0[:, e],
            edges.ug[:, e],
            edges.v0[:, e],
            edges.vg[:, e],
            edges.left[:, e],
        ]
        cols += [edges.col0[:, e, c] for c in range(4)]
        cols += [edges.colg[:, e, c] for c in range(4)]
        cols += [edges.n0[:, e, c] for c in range(3)]
        cols += [edges.ng[:, e, c] for c in range(3)]
    rec = jnp.stack(cols, axis=1)  # (T, 84)
    return jnp.pad(rec, ((0, 0), (0, REC_LANES - rec.shape[1])))


def _resolve_rows(rec_rows, z_rows, idx_rows, y_rows, width: int,
                  frame_width: int, col0):
    """Resolve one block of rows from gathered records.

    rec_rows: (R, W, 128) per-pixel packed records; idx_rows: (R, W) global
    ids (-1 empty); y_rows: global frame rows; col0: global column origin.
    All intermediates are (R, W) arrays (lists of 3 per edge).
    """
    covered = idx_rows >= 0

    def f(e, j):
        return rec_rows[..., e * EDGE_STRIDE + j]  # (R, W)

    yf = y_rows[:, None].astype(F32)  # (R, 1)
    xf = (
        jnp.arange(width, dtype=F32) + jnp.asarray(col0, F32)
    )[None, :]  # (1, W) global frame cols

    act, xs, dys = [], [], []
    for e in range(3):
        valid_e = f(e, _F_VALID) > F32(0.5)
        ymin_e = f(e, _F_YMIN)
        ymax_e = f(e, _F_YMAX)
        dy = yf - ymin_e
        act.append(valid_e & (ymin_e <= yf) & (yf < ymax_e))
        xs.append(f(e, _F_X0) + dy * f(e, _F_XG))
        dys.append(dy)

    # AET ordering (projekt.cpp:212-216): lexicographic (x, xg, left, e).
    big = F32(_BIG)
    kx = [jnp.where(act[e], xs[e], big) for e in range(3)]
    kg = [jnp.where(act[e], f(e, _F_XG), big) for e in range(3)]
    kl = [jnp.where(act[e], f(e, _F_LEFT), big) for e in range(3)]

    def less(i, j):
        return (kx[i] < kx[j]) | (
            (kx[i] == kx[j])
            & (
                (kg[i] < kg[j])
                | (
                    (kg[i] == kg[j])
                    & ((kl[i] < kl[j]) | ((kl[i] == kl[j]) & (i < j)))
                )
            )
        )

    rank = []
    for i in range(3):
        cnt = None
        for j in range(3):
            if j == i:
                continue
            t = less(j, i).astype(jnp.int32)
            cnt = t if cnt is None else cnt + t
        rank.append(cnt)

    isL = [rank[e] == 0 for e in range(3)]
    isR = [rank[e] == 1 for e in range(3)]

    def pick(vals, sel):
        return jnp.where(sel[0], vals[0], jnp.where(sel[1], vals[1], vals[2]))

    def attr_lr(j0, jg):
        vals = [f(e, j0) + dys[e] * f(e, jg) for e in range(3)]
        return pick(vals, isL), pick(vals, isR)

    xl, xr = pick(xs, isL), pick(xs, isR)  # (R, W)

    # Span setup at this pixel (projekt.cpp:306-421 closed form).
    xd = round_half_away(xr - xl)
    nz = xd != F32(0.0)
    w_f = F32(frame_width)
    xoff = jnp.where(xl < F32(0.0), -xl, F32(0.0))
    lx = jnp.where(
        xl < F32(0.0), F32(0.0), jnp.where(xl >= w_f, w_f - F32(1.0), xl)
    )
    minx = jnp.minimum(round_half_away(lx), w_f - F32(1.0))
    k = xoff + (xf - minx)  # (R, W)

    def interp(j0, jg):
        al, ar = attr_lr(j0, jg)
        inc = jnp.where(nz, (ar - al) / xd, F32(0.0))
        return al + k * inc

    u = interp(_F_U0, _F_UG)
    v = interp(_F_V0, _F_VG)
    oz = interp(_F_OZ0, _F_OZG)
    col = [interp(_F_COL0 + c, _F_COLG + c) for c in range(4)]
    nrm = [interp(_F_N0 + c, _F_NG + c) for c in range(3)]

    zero = F32(0.0)
    gbuf = jnp.stack(
        [
            z_rows,
            jnp.where(covered, col[0], zero),
            jnp.where(covered, col[1], zero),
            jnp.where(covered, col[2], zero),
            jnp.where(covered, col[3], zero),
            jnp.where(covered, nrm[0], zero),
            jnp.where(covered, nrm[1], zero),
            jnp.where(covered, nrm[2], zero),
            jnp.where(covered, u, zero),
            jnp.where(covered, v, zero),
            jnp.where(covered, oz, zero),
        ],
        axis=-1,
    )
    return covered, gbuf


def resolve_gbuffer(edges: EdgeTable, z, idx, height: int, width: int,
                    row_block: int = 32, frame_width: int | None = None,
                    row0=0, col0=0):
    """(z, idx) visibility buffer -> (covered, gbuf(H, W, 11)).

    (row0, col0): traced global origin of the local rect; frame_width: the
    global width spans clamp against."""
    if frame_width is None:
        frame_width = width
    packed = pack_attr_records(edges)  # (T, 128)
    pad = (-height) % row_block
    if pad:
        z = jnp.pad(z, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)), constant_values=-1)
    nb = (height + pad) // row_block
    zb = z.reshape(nb, row_block, width)
    ib = idx.reshape(nb, row_block, width)
    yb = (
        jnp.arange(nb * row_block, dtype=jnp.int32) + jnp.asarray(
            row0, jnp.int32
        )
    ).reshape(nb, row_block)

    def fn(args):
        zr, ir, yr = args
        rec_rows = packed[jnp.maximum(ir, 0)]  # one row-gather per pixel
        return _resolve_rows(rec_rows, zr, ir, yr, width, frame_width, col0)

    covered, gbuf = jax.lax.map(fn, (zb, ib, yb))
    covered = covered.reshape(-1, width)[:height]
    gbuf = gbuf.reshape(-1, width, GBUF_CHANNELS)[:height]
    return covered, gbuf
