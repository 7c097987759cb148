"""Attribute resolve: visibility buffer -> full G-buffer (dense XLA).

Given the winning triangle id per pixel (from ops.raster_pallas), gather that
triangle's edge records and re-evaluate all interpolants (color, normal,
u/z, v/z, 1/z) at the pixel with the identical closed forms the rasterizers
use (ops.spans semantics, projekt.cpp:306-539). This is pure gather + dense
vector math — the TPU-friendly inversion of the reference's per-fragment
scatter — and it runs exactly once per visible pixel.

Row-chunked with lax.map so the (rows, W, 3, fields) gather stays bounded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import round_half_away
from ..geometry.vertex import EdgeTable
from .raster_reference import GBUF_CHANNELS

F32 = jnp.float32
_BIG = 3.4028235e38


def _resolve_rows(edges: EdgeTable, z_rows, idx_rows, y_rows, width: int,
                  frame_width: int, col0):
    """Resolve one block of rows. idx_rows: (R, W) global ids (-1 empty);
    y_rows are global frame rows, col0 the global column origin."""
    covered = idx_rows >= 0
    safe = jnp.maximum(idx_rows, 0)  # (R, W)

    g = lambda a: a[safe]  # (T, 3, ...) -> (R, W, 3, ...)
    valid = g(edges.valid)
    ymin, ymax = g(edges.ymin), g(edges.ymax)
    x0, xg = g(edges.x0), g(edges.xg)
    left = g(edges.left)

    yf = y_rows[:, None, None].astype(F32)  # (R, 1, 1)
    xf = (
        jnp.arange(width, dtype=F32) + jnp.asarray(col0, F32)
    )[None, :, None]  # (1, W, 1) global frame cols

    act = valid & (ymin <= yf) & (yf < ymax)  # (R, W, 3)
    dy = yf - ymin
    xs = x0 + dy * xg

    big = F32(_BIG)
    kx = jnp.where(act, xs, big)
    kg = jnp.where(act, xg, big)
    kl = jnp.where(act, left, big)

    def less(i, j):
        return (kx[..., i] < kx[..., j]) | (
            (kx[..., i] == kx[..., j])
            & (
                (kg[..., i] < kg[..., j])
                | (
                    (kg[..., i] == kg[..., j])
                    & (
                        (kl[..., i] < kl[..., j])
                        | ((kl[..., i] == kl[..., j]) & (i < j))
                    )
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

    def pick(vals, r):
        """vals (R,W,3) or (R,W,3,C); select the rank-r edge."""
        if vals.ndim == 4:
            sel = [rk[..., None] for rk in rank]
        else:
            sel = rank
        return jnp.where(
            sel[0] == r, vals[..., 0, :] if vals.ndim == 4 else vals[..., 0],
            jnp.where(
                sel[1] == r,
                vals[..., 1, :] if vals.ndim == 4 else vals[..., 1],
                vals[..., 2, :] if vals.ndim == 4 else vals[..., 2],
            ),
        )

    def attr_at(a0_field, ag_field):
        vals = g(a0_field) + (dy[..., None] * g(ag_field)
                              if a0_field.ndim == 3 else dy * g(ag_field))
        return pick(vals, 0), pick(vals, 1)

    xl, xr = pick(xs, 0), pick(xs, 1)  # (R, W)
    zl, zr = attr_at(edges.z0, edges.zg)
    ozl, ozr = attr_at(edges.oz0, edges.ozg)
    ul, ur = attr_at(edges.u0, edges.ug)
    vl, vr = attr_at(edges.v0, edges.vg)
    cl, cr = attr_at(edges.col0, edges.colg)  # (R, W, 4)
    nl, nr = attr_at(edges.n0, edges.ng)  # (R, W, 3)

    # Span setup at this pixel (projekt.cpp:306-421 closed form).
    xd = round_half_away(xr - xl)
    nz = xd != F32(0.0)
    w_f = F32(frame_width)
    xoff = jnp.where(xl < F32(0.0), -xl, F32(0.0))
    lx = jnp.where(
        xl < F32(0.0), F32(0.0), jnp.where(xl >= w_f, w_f - F32(1.0), xl)
    )
    minx = jnp.minimum(round_half_away(lx), w_f - F32(1.0))
    k = xoff + (xf[..., 0] - minx)  # (R, W)

    def interp(al, ar):
        if al.ndim == 3:  # vector channels
            inc = jnp.where(nz[..., None], (ar - al) / xd[..., None], F32(0.0))
            return al + k[..., None] * inc
        inc = jnp.where(nz, (ar - al) / xd, F32(0.0))
        return al + k * inc

    col = interp(cl, cr)
    nrm = interp(nl, nr)
    u = interp(ul, ur)
    v = interp(vl, vr)
    oz = interp(ozl, ozr)

    c1 = covered[..., None]
    gbuf = jnp.concatenate(
        [
            z_rows[..., None],
            jnp.where(c1, col, F32(0.0)),
            jnp.where(c1, nrm, F32(0.0)),
            jnp.where(covered, u, F32(0.0))[..., None],
            jnp.where(covered, v, F32(0.0))[..., None],
            jnp.where(covered, oz, F32(0.0))[..., None],
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
        return _resolve_rows(edges, zr, ir, yr, width, frame_width, col0)

    covered, gbuf = jax.lax.map(fn, (zb, ib, yb))
    covered = covered.reshape(-1, width)[:height]
    gbuf = gbuf.reshape(-1, width, GBUF_CHANNELS)[:height]
    return covered, gbuf
