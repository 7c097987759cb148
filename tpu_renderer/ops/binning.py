"""Tile binning: triangle bboxes -> per-tile triangle ID lists (XLA ops).

The reference distributes work by pushing spans/rows/models onto a CPU work
queue (SURVEY.md L3, projekt.cpp:3609/3809). The TPU-native equivalent is a
static tile grid: each framebuffer tile owns a fixed-capacity list of the
triangles whose screen bbox overlaps it, built with dense XLA ops (masks +
cumsum + one scatter), no atomics. Capacity overflow is counted and reported,
never silently truncated (drops are returned for the engine to log).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geometry.vertex import EdgeTable

F32 = jnp.float32


class TileBins(NamedTuple):
    ids: jnp.ndarray  # (tiles_y, tiles_x, K) i32 triangle ids, -1 = empty
    counts: jnp.ndarray  # (tiles_y, tiles_x) i32 binned (kept) triangles
    n_dropped: jnp.ndarray  # () i32 total overflow drops


def triangle_bbox(edges: EdgeTable, height: int, width: int):
    """Conservative per-triangle screen bbox from the edge table.

    Row range comes straight from the ymin/ymax fields; the column range
    evaluates each edge's x at its first and last active row (x is linear in
    y) with a +/-1 rounding margin. Offscreen geometry clamps into the frame
    exactly like the reference's span clamping, so border-column smears
    (SURVEY §2.1) bin correctly.
    """
    valid = edges.valid & (edges.ymax > edges.ymin)  # edges with active rows
    big = F32(3.4028235e38)

    ylo = jnp.min(jnp.where(valid, edges.ymin, big), axis=1)
    yhi = jnp.max(jnp.where(valid, edges.ymax, -big), axis=1)
    yhi = jnp.minimum(yhi, F32(height))

    xa = edges.x0
    xb = edges.x0 + (edges.ymax - F32(1.0) - edges.ymin) * edges.xg
    xlo = jnp.min(jnp.where(valid, jnp.minimum(xa, xb), big), axis=1)
    xhi = jnp.max(jnp.where(valid, jnp.maximum(xa, xb), -big), axis=1)
    # NaN-proof: degenerate values force the triangle invalid below.
    tri_valid = (
        (jnp.sum(valid.astype(jnp.int32), axis=1) >= 2)
        & (yhi > ylo)
        & jnp.isfinite(ylo) & jnp.isfinite(yhi)
    )
    xlo = jnp.clip(
        jnp.nan_to_num(xlo, nan=0.0, posinf=F32(width - 1), neginf=0.0)
        - F32(1.0), F32(0.0), F32(width - 1),
    )
    xhi = jnp.clip(
        jnp.nan_to_num(xhi, nan=F32(width - 1), posinf=F32(width - 1),
                       neginf=0.0) + F32(1.0),
        F32(0.0), F32(width - 1),
    )
    ylo = jnp.clip(ylo, F32(0.0), F32(height))
    yhi = jnp.clip(yhi, F32(0.0), F32(height))
    return tri_valid, ylo, yhi, xlo, xhi


def bin_triangles(
    edges: EdgeTable,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    capacity: int,
    frame_height: int | None = None,
    frame_width: int | None = None,
    row0=0,
    col0=0,
) -> TileBins:
    """Build per-tile triangle lists (submission order preserved).

    (height, width) is the local tile-grid extent with origin (row0, col0)
    in the global (frame_height, frame_width) frame; bboxes are computed
    against the global frame and intersected with the local rect.
    """
    if frame_height is None:
        frame_height = height
    if frame_width is None:
        frame_width = width
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    T = edges.num_triangles

    tri_valid, ylo, yhi, xlo, xhi = triangle_bbox(
        edges, frame_height, frame_width
    )
    # shift into local tile coordinates
    ylo = ylo - jnp.asarray(row0, F32)
    yhi = yhi - jnp.asarray(row0, F32)
    xlo = xlo - jnp.asarray(col0, F32)
    xhi = xhi - jnp.asarray(col0, F32)

    ty_lo = jnp.floor(ylo / F32(tile_h)).astype(jnp.int32)
    ty_hi = jnp.ceil(yhi / F32(tile_h)).astype(jnp.int32)  # exclusive
    tx_lo = jnp.floor(xlo / F32(tile_w)).astype(jnp.int32)
    tx_hi = (jnp.floor(xhi / F32(tile_w)).astype(jnp.int32) + 1)  # exclusive

    ty_ids = jnp.arange(tiles_y, dtype=jnp.int32)
    tx_ids = jnp.arange(tiles_x, dtype=jnp.int32)
    in_y = (ty_ids[None, :] >= ty_lo[:, None]) & (ty_ids[None, :] < ty_hi[:, None])
    in_x = (tx_ids[None, :] >= tx_lo[:, None]) & (tx_ids[None, :] < tx_hi[:, None])
    mask = (
        tri_valid[:, None, None] & in_y[:, :, None] & in_x[:, None, :]
    ).reshape(T, tiles_y * tiles_x)

    # Stable compaction per tile: position of triangle i in tile t's list is
    # the number of earlier binned triangles (cumsum), preserving submission
    # order — the property the depth tie-break relies on.
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=0) - 1  # (T, tiles)
    total = jnp.where(mask.any(axis=0), pos[-1] + 1, 0)  # (tiles,)
    n_dropped = jnp.sum(jnp.maximum(total - capacity, 0))

    keep = mask & (pos < capacity)
    scatter_pos = jnp.where(keep, pos, capacity)  # capacity row = discard
    tri_ids = jnp.arange(T, dtype=jnp.int32)

    ids = jnp.full((tiles_y * tiles_x, capacity + 1), -1, jnp.int32)
    ids = ids.at[
        jnp.arange(tiles_y * tiles_x, dtype=jnp.int32)[None, :],
        scatter_pos.astype(jnp.int32),
    ].set(jnp.broadcast_to(tri_ids[:, None], scatter_pos.shape), mode="drop")
    ids = ids[:, :capacity]

    counts = jnp.minimum(total, capacity).astype(jnp.int32)
    return TileBins(
        ids=ids.reshape(tiles_y, tiles_x, capacity),
        counts=counts.reshape(tiles_y, tiles_x),
        n_dropped=n_dropped,
    )
