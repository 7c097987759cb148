"""Pallas tile rasterizer — the production (flagship) draw path.

Visibility-buffer design, TPU-first (SURVEY.md §7):

1. The frame is a static grid of VMEM-resident tiles (the Pallas grid), the
   TPU-native replacement for the reference's span/row work queue
   (projekt.cpp:3609/3809). One grid program owns one tile — no cross-thread
   z races, so the reference's per-8-pixel ZMask spinlock
   (projekt.cpp:1378-1409) becomes a plain in-register merge.
2. Per tile, the kernel walks its binned triangle list in submission order,
   vectorized CHUNK_T triangles at a time, evaluating only coverage + depth
   per pixel — ~10 VPU ops per fragment on (tile_h, 128)-lane tiles, the
   8-wide AVX fill loop (projekt.cpp:1028-1452) widened to the 8x128 VPU
   shape. It merges (z, slot) with the reference's rules: strict greater
   wins, earlier submission keeps ties (projekt.cpp:495).
3. Attribute interpolation + shading happen AFTER visibility, once per
   pixel, as dense XLA gathers over the winning ids (ops.resolve) — the
   per-fragment color/uv/normal work the CPU renderer did for losing
   fragments is never done at all.

The kernel consumes a packed per-triangle "z-record": 3 edges x 8 scalars
[valid, ymin, ymax, x0, xg, z0, zg, left] = 24 f32 lanes padded to a
(K, 32) VMEM block. Coverage/z formulas are the closed forms of ops.spans,
so results match the pure-JAX reference path exactly (modulo backend FMA
rounding, golden divergence #8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import round_half_away
from ..core.types import DEPTH_CLEAR
from ..geometry.vertex import EdgeTable
from .binning import TileBins, bin_triangles
from .resolve import resolve_gbuffer

F32 = jnp.float32

TILE_H = 32
TILE_W = 128
CHUNK_T = 8  # triangles evaluated per vector step
REC_WIDTH = 32  # padded record lanes (24 used)
_BIG = 3.4028235e38


def pack_z_records(edges: EdgeTable) -> jnp.ndarray:
    """(T, 32) f32: per edge e, lanes [8e..8e+8) hold
    [valid, ymin, ymax, x0, xg, z0, zg, left]."""
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
            edges.left[:, e],
        ]
    rec = jnp.stack(cols, axis=1)  # (T, 24)
    return jnp.pad(rec, ((0, 0), (0, REC_WIDTH - rec.shape[1])))


def _visibility_kernel(count_ref, origin_ref, rec_ref, z_ref, idx_ref, *,
                       frame_width, capacity):
    """One framebuffer tile: merge all binned triangles' coverage+z.

    Outputs: z (tile) and the winning *slot* index into the tile's bin list
    (-1 = empty); slots are in submission order, so smaller slot == earlier
    triangle and the strict-greater merge reproduces the reference's
    first-writer-wins tie rule.
    """
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, 1), 0)
        + (origin_ref[0] + ty * TILE_H)
    ).astype(F32)  # (R, 1) global frame rows
    cols = (
        jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
        + (origin_ref[1] + tx * TILE_W)
    ).astype(F32)  # (1, W) global frame cols

    z_ref[:] = jnp.full((TILE_H, TILE_W), DEPTH_CLEAR, F32)
    idx_ref[:] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

    n = count_ref[ty * pl.num_programs(1) + tx]  # whole counts array in SMEM
    w_f = F32(frame_width)
    yf = rows[None, :, :]  # (1, R, 1)
    xc = cols[None, :, :]  # (1, 1, W)

    def chunk_body(c, _):
        base = c * CHUNK_T
        rec = rec_ref[0, 0, pl.ds(base, CHUNK_T), :]  # (C, 32)

        def field(e, j):
            return rec[:, e * 8 + j][:, None, None]  # (C, 1, 1)

        # Per-edge row values (lists of (C, R, 1) arrays).
        act, xs, zs, xgs, lefts = [], [], [], [], []
        for e in range(3):
            valid_e = field(e, 0) > F32(0.5)
            ymin_e, ymax_e = field(e, 1), field(e, 2)
            dy = yf - ymin_e
            act.append(valid_e & (ymin_e <= yf) & (yf < ymax_e))
            xs.append(field(e, 3) + dy * field(e, 4))
            zs.append(field(e, 5) + dy * field(e, 6))
            xgs.append(field(e, 4))
            lefts.append(field(e, 7))

        # AET ordering (projekt.cpp:212-216): lexicographic (x, xg, left, e).
        big = F32(_BIG)
        kx = [jnp.where(act[e], xs[e], big) for e in range(3)]
        kg = [jnp.where(act[e], xgs[e], big) for e in range(3)]
        kl = [jnp.where(act[e], lefts[e], big) for e in range(3)]

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

        def pick(vals, r):
            return jnp.where(
                rank[0] == r, vals[0],
                jnp.where(rank[1] == r, vals[1], vals[2]),
            )

        xl, xr = pick(xs, 0), pick(xs, 1)  # (C, R, 1)
        zl, zr = pick(zs, 0), pick(zs, 1)
        nact = (
            act[0].astype(jnp.int32)
            + act[1].astype(jnp.int32)
            + act[2].astype(jnp.int32)
        )
        span_ok = nact >= 2  # (C, R, 1)

        # Span setup + pixel coverage/z (projekt.cpp:306-529, closed form).
        xd = round_half_away(xr - xl)
        zinc = jnp.where(xd != F32(0.0), (zr - zl) / xd, F32(0.0))
        xoff = jnp.where(xl < F32(0.0), -xl, F32(0.0))
        lx = jnp.where(
            xl < F32(0.0), F32(0.0),
            jnp.where(xl >= w_f, w_f - F32(1.0), xl),
        )
        rx = jnp.where(
            xr < F32(0.0), F32(0.0),
            jnp.where(xr >= w_f, w_f - F32(1.0), xr),
        )
        minx = jnp.minimum(round_half_away(lx), w_f - F32(1.0))
        maxx = jnp.minimum(round_half_away(rx), w_f - F32(1.0))

        inspan = span_ok & (xc >= minx) & (xc <= maxx)  # (C, R, W)
        k = xoff + (xc - minx)
        zfrag = zl + k * zinc  # (C, R, W)

        # Fold the chunk: earlier (smaller slot) wins ties.
        best_z = jnp.full((TILE_H, TILE_W), DEPTH_CLEAR, F32)
        best_i = jnp.full((TILE_H, TILE_W), jnp.int32(-1))
        for c in range(CHUNK_T):
            zc = jnp.where(inspan[c], zfrag[c], DEPTH_CLEAR)
            win = zc > best_z
            best_z = jnp.where(win, zc, best_z)
            best_i = jnp.where(win, base + c, best_i)

        win = best_z > z_ref[:]
        z_ref[:] = jnp.where(win, best_z, z_ref[:])
        idx_ref[:] = jnp.where(win, best_i, idx_ref[:])
        return 0

    num_chunks = (n + CHUNK_T - 1) // CHUNK_T  # only populated slots
    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def visibility_pass(edges: EdgeTable, bins: TileBins, height: int,
                    width: int, frame_width: int | None = None,
                    row0=0, col0=0):
    """Run the tile kernel over the local tile grid.

    (height, width): local extent; (row0, col0): traced origin in the global
    frame; frame_width: global width for span clamping.
    Returns (z(H,W) f32, idx(H,W) i32 global triangle ids, -1 = empty).
    """
    if frame_width is None:
        frame_width = width
    tiles_y, tiles_x, capacity = bins.ids.shape
    assert capacity % CHUNK_T == 0

    recs = pack_z_records(edges)  # (T, 32)
    safe_ids = jnp.maximum(bins.ids, 0)
    tile_recs = recs[safe_ids.reshape(-1)].reshape(
        tiles_y, tiles_x, capacity, REC_WIDTH
    )
    # Empty slots: zeroed records (valid=0) can never cover a pixel.
    tile_recs = jnp.where((bins.ids >= 0)[..., None], tile_recs, F32(0.0))

    kernel = functools.partial(
        _visibility_kernel, frame_width=frame_width, capacity=capacity
    )
    padded_h = tiles_y * TILE_H
    padded_w = tiles_x * TILE_W

    # Off-TPU (CPU test backend) the kernel runs in interpreter mode.
    interpret = jax.default_backend() != "tpu"

    z, slot = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts, whole array
            pl.BlockSpec(memory_space=pltpu.SMEM),  # origin [row0, col0]
            pl.BlockSpec(
                (1, 1, capacity, REC_WIDTH),
                lambda ty, tx: (ty, tx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (TILE_H, TILE_W), lambda ty, tx: (ty, tx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_H, TILE_W), lambda ty, tx: (ty, tx),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_h, padded_w), F32),
            jax.ShapeDtypeStruct((padded_h, padded_w), jnp.int32),
        ],
    )(
        bins.counts.reshape(-1).astype(jnp.int32),
        jnp.stack(
            [jnp.asarray(row0, jnp.int32), jnp.asarray(col0, jnp.int32)]
        ),
        tile_recs,
    )

    z = z[:height, :width]
    slot = slot[:height, :width]

    # Map winning slot -> global triangle id via the bin lists.
    py = jnp.arange(height, dtype=jnp.int32)[:, None] // TILE_H
    px = jnp.arange(width, dtype=jnp.int32)[None, :] // TILE_W
    flat = bins.ids.reshape(tiles_y, tiles_x, capacity)
    gid = flat[py, px, jnp.maximum(slot, 0)]
    return z, jnp.where(slot >= 0, gid, -1)


def rasterize_pallas(
    edges: EdgeTable,
    height: int,
    width: int,
    capacity: int | None = None,
    frame_height: int | None = None,
    frame_width: int | None = None,
    row0=0,
    col0=0,
):
    """Full fast-path rasterization -> (covered, gbuf), same API as
    ops.raster_reference.rasterize_reference. ``capacity`` is the per-tile
    triangle list size (default: all triangles, rounded to the chunk);
    (row0, col0)/(frame_height, frame_width) support rendering a local
    sub-rect of a larger frame (mesh sharding)."""
    T = edges.num_triangles
    if capacity is None:
        # Per-tile list capacity: all triangles for small scenes, else a cap
        # that keeps the kernel's record block comfortably inside VMEM
        # (4096 * 128 lanes * 4 B = 2 MB). Drops are counted in the returned
        # stats — raise `capacity` if stats['bins_dropped'] is nonzero.
        capacity = min(max(CHUNK_T, -(-T // CHUNK_T) * CHUNK_T), 4096)
    if frame_height is None:
        frame_height = height
    if frame_width is None:
        frame_width = width
    bins = bin_triangles(
        edges, height, width, TILE_H, TILE_W, capacity,
        frame_height, frame_width, row0, col0,
    )
    z, idx = visibility_pass(
        edges, bins, height, width, frame_width, row0, col0
    )
    covered, gbuf = resolve_gbuffer(
        edges, z, idx, height, width, frame_width=frame_width,
        row0=row0, col0=col0,
    )
    stats = {"bins_dropped": bins.n_dropped}
    return covered, gbuf, stats
