"""Closed-form span evaluation — the heart of the rasterizer.

Evaluates, for one triangle over a block of rows x columns, exactly what the
reference's active-edge-table walk computes sequentially (DrawModel span
setup + pixel loop, projekt.cpp:303-539), but as dense vector math:

  per row y:   which 2 of the 3 edges are active, ordered by the AET rules
               (x, then dx/dy, then Left flag — projekt.cpp:212-216)
  per span:    increments = (right - left) / roundf(xr - xl), the XOffset
               left-clip advance, the [round(lx), round(rx)] inclusive
               pixel range (projekt.cpp:306-421)
  per pixel:   attr = left_attr + (XOffset + (x - minx)) * increment

Shared verbatim by the pure-JAX reference rasterizer (ops.raster_reference)
and the Pallas tile kernel (ops.raster_pallas): both paths call these
functions, so they are bit-identical by construction. All ops map onto the
TPU VPU (8x128 lanes) — this is the AVX 8-wide fill loop
(projekt.cpp:1028-1452) widened to a full tile.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math import round_half_away

F32 = jnp.float32
_BIG = 3.4028235e38  # inactive-edge sort key


class TriangleSlice(NamedTuple):
    """One triangle's 3 candidate edges (fields shaped (3,), (3,4), (3,3))."""

    valid: jnp.ndarray
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


class SpanBlock(NamedTuple):
    """Per-pixel fragment data for a (R, W) block: coverage + interpolants."""

    mask: jnp.ndarray  # (R, W) bool
    z: jnp.ndarray  # (R, W)
    col: jnp.ndarray  # (R, W, 4)
    n: jnp.ndarray  # (R, W, 3)
    u: jnp.ndarray  # (R, W) u/viewz
    v: jnp.ndarray  # (R, W) v/viewz
    oz: jnp.ndarray  # (R, W) 1/viewz


def _edge_order(xs, xg, left, act):
    """Rank the 3 candidate edges per row by the AET insertion key
    (x, gradient, left; index as the final tie-break). Inactive edges sort
    last. Returns (rank0_is, rank1_is): two (R, 3) boolean selectors."""
    big = F32(_BIG)
    kx = jnp.where(act, xs, big)
    kg = jnp.where(act, xg, big)
    kl = jnp.where(act, left, big)

    def less(i, j):
        lt = kx[..., i] < kx[..., j]
        eq = kx[..., i] == kx[..., j]
        lt2 = kg[..., i] < kg[..., j]
        eq2 = kg[..., i] == kg[..., j]
        lt3 = kl[..., i] < kl[..., j]
        eq3 = kl[..., i] == kl[..., j]
        tie = jnp.array(i < j)
        return lt | (eq & (lt2 | (eq2 & (lt3 | (eq3 & tie)))))

    before = []
    for i in range(3):
        cnt = None
        for j in range(3):
            if j == i:
                continue
            term = less(j, i).astype(jnp.int32)
            cnt = term if cnt is None else cnt + term
        before.append(cnt)
    before = jnp.stack(before, axis=-1)  # (R, 3)
    return before == 0, before == 1


def _sel(isL, isR, vals):
    """Select the rank-0 and rank-1 edge's value.

    vals: (R, 3) or (R, 3, C); selectors are (R, 3) bool with exactly one
    true entry each."""

    def pick(sel):
        if vals.ndim > sel.ndim:
            sel = sel[..., None]
        return jnp.where(
            sel[..., 0, :] if vals.ndim > 2 else sel[..., 0],
            vals[..., 0, :] if vals.ndim > 2 else vals[..., 0],
            jnp.where(
                sel[..., 1, :] if vals.ndim > 2 else sel[..., 1],
                vals[..., 1, :] if vals.ndim > 2 else vals[..., 1],
                vals[..., 2, :] if vals.ndim > 2 else vals[..., 2],
            ),
        )

    return pick(isL), pick(isR)


def span_block(tri: TriangleSlice, rows: jnp.ndarray, cols: jnp.ndarray,
               width: int) -> SpanBlock:
    """Rasterize one triangle over a row/column block.

    rows: (R,) f32 integer-valued frame rows; cols: (W,) f32 integer-valued
    frame columns; width: full framebuffer width (the reference clamps spans
    against the frame, not the tile — projekt.cpp:381-400).
    """
    yf = rows[:, None]  # (R, 1)
    act = tri.valid[None, :] & (tri.ymin[None, :] <= yf) & (yf < tri.ymax[None, :])
    dy = yf - tri.ymin[None, :]  # (R, 3)

    xs = tri.x0[None, :] + dy * tri.xg[None, :]
    z = tri.z0[None, :] + dy * tri.zg[None, :]
    oz = tri.oz0[None, :] + dy * tri.ozg[None, :]
    u = tri.u0[None, :] + dy * tri.ug[None, :]
    v = tri.v0[None, :] + dy * tri.vg[None, :]
    col = tri.col0[None, :, :] + dy[..., None] * tri.colg[None, :, :]
    nrm = tri.n0[None, :, :] + dy[..., None] * tri.ng[None, :, :]

    isL, isR = _edge_order(
        xs,
        jnp.broadcast_to(tri.xg[None, :], xs.shape),
        jnp.broadcast_to(tri.left[None, :], xs.shape),
        act,
    )
    span_ok = jnp.sum(act.astype(jnp.int32), axis=-1) >= 2  # (R,)

    xl, xr = _sel(isL, isR, xs)
    zl, zr = _sel(isL, isR, z)
    ozl, ozr = _sel(isL, isR, oz)
    ul, ur = _sel(isL, isR, u)
    vl, vr = _sel(isL, isR, v)
    cl, cr = _sel(isL, isR, col)
    nl, nr = _sel(isL, isR, nrm)

    # Span setup (projekt.cpp:306-421).
    xd = round_half_away(xr - xl)
    nz = xd != F32(0.0)
    zinc = jnp.where(nz, (zr - zl) / xd, F32(0.0))
    ozinc = jnp.where(nz, (ozr - ozl) / xd, F32(0.0))
    uinc = jnp.where(nz, (ur - ul) / xd, F32(0.0))
    vinc = jnp.where(nz, (vr - vl) / xd, F32(0.0))
    cinc = jnp.where(nz[:, None], (cr - cl) / xd[:, None], F32(0.0))
    ninc = jnp.where(nz[:, None], (nr - nl) / xd[:, None], F32(0.0))

    w_f = F32(width)
    xoff = jnp.where(xl < F32(0.0), -xl, F32(0.0))
    lx = jnp.where(xl < F32(0.0), F32(0.0), jnp.where(xl >= w_f, w_f - F32(1.0), xl))
    rx = jnp.where(xr < F32(0.0), F32(0.0), jnp.where(xr >= w_f, w_f - F32(1.0), xr))
    # divergence #7: clamp the rounded index back into the row (the
    # reference writes one past the row when x in (W-1, W)).
    minx = jnp.minimum(round_half_away(lx), w_f - F32(1.0))
    maxx = jnp.minimum(round_half_away(rx), w_f - F32(1.0))

    xc = cols[None, :]  # (1, W)
    inspan = (
        span_ok[:, None] & (xc >= minx[:, None]) & (xc <= maxx[:, None])
    )
    k = xoff[:, None] + (xc - minx[:, None])  # (R, W)

    return SpanBlock(
        mask=inspan,
        z=zl[:, None] + k * zinc[:, None],
        col=cl[:, None, :] + k[..., None] * cinc[:, None, :],
        n=nl[:, None, :] + k[..., None] * ninc[:, None, :],
        u=ul[:, None] + k * uinc[:, None],
        v=vl[:, None] + k * vinc[:, None],
        oz=ozl[:, None] + k * ozinc[:, None],
    )
