"""Tile binning: triangle bboxes -> per-tile triangle ID lists (XLA ops).

The reference distributes work by pushing spans/rows/models onto a CPU work
queue (SURVEY.md L3, projekt.cpp:3609/3809). The TPU-native equivalent is a
static tile grid: each framebuffer tile owns a fixed-capacity list of the
triangles whose screen bbox overlaps it, built with dense XLA ops (masks +
cumsum + one scatter), no atomics. Capacity overflow is counted and reported,
never silently truncated (drops are returned for the engine to log).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.vertex import EdgeTable

F32 = jnp.float32


class TileBins(NamedTuple):
    ids: jnp.ndarray  # (tiles_y, tiles_x, K) i32 triangle ids, -1 = empty
    counts: jnp.ndarray  # (tiles_y, tiles_x) i32 binned (kept) triangles
    n_dropped: jnp.ndarray  # () i32 total overflow drops


def _bbox_core(valids, ymins, ymaxs, x0s, xgs, height: int, width: int):
    """Bbox math shared by the EdgeTable and record-row forms.

    Inputs are length-3 lists of per-edge (T,) rows. Same formulas as the
    original (T, 3)-column form — unrolled min/max chains over the 3 edges
    are value-identical to axis reductions."""
    big = F32(3.4028235e38)
    valid = [v & (ymaxs[e] > ymins[e]) for e, v in enumerate(valids)]

    def mn3(vals, fill):
        a = [jnp.where(valid[e], vals[e], fill) for e in range(3)]
        return jnp.minimum(jnp.minimum(a[0], a[1]), a[2])

    def mx3(vals, fill):
        a = [jnp.where(valid[e], vals[e], fill) for e in range(3)]
        return jnp.maximum(jnp.maximum(a[0], a[1]), a[2])

    ylo = mn3(ymins, big)
    yhi = mx3(ymaxs, -big)
    yhi = jnp.minimum(yhi, F32(height))

    xa = x0s
    xb = [x0s[e] + (ymaxs[e] - F32(1.0) - ymins[e]) * xgs[e]
          for e in range(3)]
    xlo = mn3([jnp.minimum(xa[e], xb[e]) for e in range(3)], big)
    xhi = mx3([jnp.maximum(xa[e], xb[e]) for e in range(3)], -big)
    # NaN-proof: degenerate values force the triangle invalid below.
    nvalid = (
        valid[0].astype(jnp.int32)
        + valid[1].astype(jnp.int32)
        + valid[2].astype(jnp.int32)
    )
    tri_valid = (
        (nvalid >= 2)
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


def triangle_bbox(edges: EdgeTable, height: int, width: int):
    """Conservative per-triangle screen bbox from the edge table.

    Row range comes straight from the ymin/ymax fields; the column range
    evaluates each edge's x at its first and last active row (x is linear in
    y) with a +/-1 rounding margin. Offscreen geometry clamps into the frame
    exactly like the reference's span clamping, so border-column smears
    (SURVEY §2.1) bin correctly.
    """
    return _bbox_core(
        [edges.valid[:, e] for e in range(3)],
        [edges.ymin[:, e] for e in range(3)],
        [edges.ymax[:, e] for e in range(3)],
        [edges.x0[:, e] for e in range(3)],
        [edges.xg[:, e] for e in range(3)],
        height, width,
    )


def triangle_bbox_rows(rec_t, height: int, width: int):
    """Same bbox straight from the channel-major record table (85+, T)
    (geometry.vertex.setup_records): the fast path's binning never touches
    an EdgeTable. Lane layout per EDGE_STRIDE: valid 0, ymin 1, ymax 2,
    x0 3, xg 4."""
    from ..geometry.vertex import EDGE_STRIDE

    def row(e, j):
        return rec_t[e * EDGE_STRIDE + j]

    return _bbox_core(
        [row(e, 0) > F32(0.5) for e in range(3)],
        [row(e, 1) for e in range(3)],
        [row(e, 2) for e in range(3)],
        [row(e, 3) for e in range(3)],
        [row(e, 4) for e in range(3)],
        height, width,
    )


def _bin_from_bbox(
    tri_valid, ylo, yhi, xlo, xhi, tri_ids, tiles_y, tiles_x, tile_h,
    tile_w, capacity, row0, col0,
) -> TileBins:
    """Dense-mask binning core over precomputed (local-frame) bboxes.

    ``tri_ids`` are the values stored in the per-tile lists (global
    triangle ids — callers binning a compacted subset pass the subset's
    global ids so downstream record gathers stay id-addressed)."""
    T = tri_valid.shape[0]
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


def bin_triangles(
    edges: EdgeTable | None,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    capacity: int,
    frame_height: int | None = None,
    frame_width: int | None = None,
    row0=0,
    col0=0,
    bbox=None,
) -> TileBins:
    """Build per-tile triangle lists (submission order preserved).

    (height, width) is the local tile-grid extent with origin (row0, col0)
    in the global (frame_height, frame_width) frame; bboxes are computed
    against the global frame and intersected with the local rect. Pass
    ``bbox`` (triangle_bbox/triangle_bbox_rows output) to skip the EdgeTable
    entirely (the records fast path).
    """
    if frame_height is None:
        frame_height = height
    if frame_width is None:
        frame_width = width
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)

    if bbox is None:
        bbox = triangle_bbox(edges, frame_height, frame_width)
    tri_valid, ylo, yhi, xlo, xhi = bbox
    T = tri_valid.shape[0]
    return _bin_from_bbox(
        tri_valid, ylo, yhi, xlo, xhi, jnp.arange(T, dtype=jnp.int32),
        tiles_y, tiles_x, tile_h, tile_w, capacity, row0, col0,
    )


def count_subset_per_tile(
    subset_ids,
    edges: EdgeTable | None,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    frame_height: int | None = None,
    frame_width: int | None = None,
    row0=0,
    col0=0,
    bbox=None,
):
    """Per-tile overlap counts for a compacted triangle subset — the
    (tiles_y * tiles_x,) i32 gate the sorted strategy uses to skip the
    large-list walk on tiles no large triangle touches."""
    if frame_height is None:
        frame_height = height
    if frame_width is None:
        frame_width = width
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)

    if bbox is None:
        bbox = triangle_bbox(edges, frame_height, frame_width)
    tri_valid, ylo, yhi, xlo, xhi = bbox
    ok = subset_ids >= 0
    safe = jnp.maximum(subset_ids, 0)
    valid = ok & tri_valid[safe]
    ylo = ylo[safe] - jnp.asarray(row0, F32)
    yhi = yhi[safe] - jnp.asarray(row0, F32)
    xlo = xlo[safe] - jnp.asarray(col0, F32)
    xhi = xhi[safe] - jnp.asarray(col0, F32)

    ty_lo = jnp.floor(ylo / F32(tile_h)).astype(jnp.int32)
    ty_hi = jnp.ceil(yhi / F32(tile_h)).astype(jnp.int32)
    tx_lo = jnp.floor(xlo / F32(tile_w)).astype(jnp.int32)
    tx_hi = jnp.floor(xhi / F32(tile_w)).astype(jnp.int32) + 1

    ty_ids = jnp.arange(tiles_y, dtype=jnp.int32)
    tx_ids = jnp.arange(tiles_x, dtype=jnp.int32)
    in_y = (ty_ids[None, :] >= ty_lo[:, None]) & (ty_ids[None, :] < ty_hi[:, None])
    in_x = (tx_ids[None, :] >= tx_lo[:, None]) & (tx_ids[None, :] < tx_hi[:, None])
    mask = valid[:, None, None] & in_y[:, :, None] & in_x[:, None, :]
    return jnp.sum(mask.astype(jnp.int32), axis=0).reshape(-1)


def bin_triangle_subset(
    subset_ids,
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
    emit_positions: bool = False,
) -> TileBins:
    """Mask-bin a COMPACTED triangle subset (e.g. the sorted strategy's
    large-triangle list): ``subset_ids`` is (K,) global triangle ids, -1 =
    empty slot. The mask matrix is (K, tiles) — independent of the scene's
    total triangle count, so this stays cheap next to a multi-million-
    triangle main stream. Lists hold GLOBAL ids, or positions 0..K-1
    within the subset when ``emit_positions`` (for kernels indexing a
    resident copy of the compacted records)."""
    if frame_height is None:
        frame_height = height
    if frame_width is None:
        frame_width = width
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    K = subset_ids.shape[0]

    tri_valid, ylo, yhi, xlo, xhi = triangle_bbox(
        edges, frame_height, frame_width
    )
    ok = subset_ids >= 0
    safe = jnp.maximum(subset_ids, 0)
    values = (
        jnp.arange(K, dtype=jnp.int32) if emit_positions else subset_ids
    )
    return _bin_from_bbox(
        ok & tri_valid[safe], ylo[safe], yhi[safe], xlo[safe], xhi[safe],
        values, tiles_y, tiles_x, tile_h, tile_w, capacity, row0, col0,
    )



FORCE_PAIR_SORT = False  # test hook: force the two-array stable sort
# Compact real entries into the budget-sized array BEFORE the sort (one
# cumsum + scatter) so the sort runs over entry_budget elements instead of
# T*expansion mostly-sentinel slots (~2.7x fewer at the dense-grid default
# expansion 4 / budget 1.5T). Default chosen by on-chip A/B; either value
# is bit-identical when nothing overflows the budget (tested). On
# overflow, drop SELECTION differs: latest submissions drop (generation-
# order clip) instead of highest tile ids (sorted-prefix clip) — both
# counted, never silent.
COMPACT_ENTRIES = False
# Point dead (past-prefix) entries' gather indices at record row 0 so the
# budget-length record gather fetches duplicates instead of scattered rows
# for the dead tail. Output-bit-identical either way (tested); ONLY a win
# if duplicate-row gathers are cheaper on the chip (.probe_gather.py).
MASK_DEAD_GATHER = False


class QueueBins(NamedTuple):
    """Work-queue bins for large triangle counts (no per-tile capacity).

    Each triangle expands to <= ``expansion`` (tile, id) entries, stably
    sorted by tile; the sorted entry order IS the record layout — tile
    ranges are NOT block-aligned. The rasterizer is a 1D grid over work
    items, one per (tile, record-block) the tile's entry range touches:
    scalar-prefetched arrays steer which record block and which output tile
    each grid step reads (consecutive items share a tile, so the output
    block stays resident in VMEM), and the kernel masks the head/tail
    entries of boundary blocks that belong to neighboring tiles.

    Unaligned ranges keep the downstream record gather at ~#entries rows
    (the earlier block-aligned relayout paid ``ntiles * blk`` extra gather
    rows — ~33k rows of pure padding at 1080p — plus a binary-search
    scatter; TPU row-gathers cost per-row, so that padding dominated small
    scenes) and eliminate per-tile fragmentation drops entirely: the only
    drop condition is total entries exceeding the static budget.

    Derivations in-kernel for work item g:
      tile = wi_tile[g]; s = starts[tile]; ci = g - item_start[tile]
      block = s // blk + ci; base = block * blk
      head = s - base (mask entries before the tile's range, first item
      only); n = s + counts[tile] - base (tail bound). Tile index
      ``ntiles`` is the dummy-tail sentinel absorbing padding work items.

    Triangles whose bbox covers more tiles than ``expansion`` go to the
    fixed-capacity ``large_ids`` side list (rasterized by a broadcast pass
    over every tile and merged by (z, global id)).
    """

    sorted_tri: jnp.ndarray  # (EB,) i32 triangle id per sorted entry
    starts: jnp.ndarray  # (ntiles + 1,) i32 first entry per tile (clipped)
    counts: jnp.ndarray  # (ntiles + 1,) i32 kept entries per tile (last 0)
    item_start: jnp.ndarray  # (ntiles + 1,) i32 first work item per tile
    wi_tile: jnp.ndarray  # (MAXW,) i32 work item -> tile (ntiles = dummy)
    large_ids: jnp.ndarray  # (Lcap,) i32, -1 padded
    n_large: jnp.ndarray  # () i32
    n_dropped: jnp.ndarray  # () i32 entry-budget + large-list drops
    n_real: jnp.ndarray  # () i32 real entries pre-budget (all streams)
    budget_util: jnp.ndarray  # () f32 max-stream real / per-stream budget


# Large-triangle side-list compaction form. True = cumsum + searchsorted
# (no scatter); False = the round-2 T-length scatter, kept for A/B
# (scatter measured ~5.8 ns/elem on this chip — probe_sort.log).
LARGE_LIST_SEARCHSORTED = True


def _large_side_list(large, large_capacity):
    """Compact the large-triangle mask into a fixed-capacity id list in
    submission order, WITHOUT a scatter.

    The obvious ``.at[pos].set(arange(T))`` form is a T-length scatter
    (~5.8 ns/elem on this chip — ~12 ms at 2M triangles, measured in
    measurements/r3/probe_sort.log) just to fill a <= large_capacity
    list. Instead: slot i's triangle is the first t whose INCLUSIVE
    cumsum of ``large`` reaches i + 1 — a searchsorted of
    ``large_capacity`` sorted queries over the (T,) cumsum (the cumsum
    costs ~1.1 ns/elem, the binary searches are negligible). Output is
    bit-identical to the scatter form: ids in submission order, -1
    padding past n_large (unit-compared in tests/test_binning.py).

    Returns (large_ids (large_capacity,) i32, n_large () i32 — the
    UNCLAMPED total, as before; callers clamp and count drops)."""
    T = large.shape[0]
    if not LARGE_LIST_SEARCHSORTED:
        pos = jnp.cumsum(large.astype(jnp.int32)) - 1
        n_large = jnp.sum(large.astype(jnp.int32))
        keep = large & (pos < large_capacity)
        scatter_pos = jnp.where(keep, pos, large_capacity)
        large_ids = jnp.full((large_capacity + 1,), -1, jnp.int32)
        large_ids = large_ids.at[scatter_pos].set(
            jnp.arange(T, dtype=jnp.int32), mode="drop"
        )[:large_capacity]
        return large_ids, n_large
    pos_incl = jnp.cumsum(large.astype(jnp.int32))  # (T,) inclusive
    n_large = pos_incl[-1]
    targets = jnp.arange(1, large_capacity + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(pos_incl, targets, side="left").astype(jnp.int32)
    large_ids = jnp.where(targets <= n_large, idx, jnp.int32(-1))
    return large_ids, n_large


def _bin_queue_rows(
    bbox, height, width, tile_h, tile_w, blk, budget_factor,
    large_capacity, row0, col0, row_split, visit_empty,
):
    """Per-parity strip binning for row packing (PACK_ROWS; rs =
    row_split streams).

    Entries are binned to (tile_h/rs)-row strips and split into one
    stream per strip PARITY (strip index mod rs within the framebuffer
    tile), each independently expanded, keyed by FRAMEBUFFER tile,
    sorted, and budgeted:

    - Each stream needs only 2 expansion slots per triangle (a triangle
      small enough to pack spans at most 2 same-parity strips x 2 tile
      columns), so the rs sorts total rs * 2T keys vs a single-stream
      flow's 2*rs*T — and the key packs (fb_tile, tri) into u32 at the
      UNSPLIT tile count (multiplying the bin count by rs overflowed the
      packed key at 2M triangles and fell back to the ~1.5x pair sort:
      .ab_rows.py round 3).
    - A tile's rs strip ranges live in different stream REGIONS, so
      their block offsets are independent — the packed kernel's lockstep
      walk actually overlaps the runs. (The first row-packing layout
      numbered strips adjacently in ONE stream; a tile's halves then
      occupied disjoint lane ranges of the same blocks and slots almost
      never carried two real entries — the .ab_rows.py wash/loss.)

    The streams are CONCATENATED (stream s offset by s budgets) with
    starts/counts interleaved at rs*tile + side, so the split kernel's
    indexing and index maps apply verbatim.

    ``budget_factor`` is per STREAM: each side keeps budget_factor * T
    entries (parities are statistically balanced; a pathological mesh
    binning everything into one parity drops-and-counts, and
    BUDGET_FACTOR_OVERRIDE remains the escape hatch).
    """
    rs = row_split
    exp_h = 2
    strip_h = tile_h // rs
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    nfb = tiles_y * tiles_x
    n_strips = tiles_y * rs

    tri_valid, ylo, yhi, xlo, xhi = bbox
    T = tri_valid.shape[0]
    ylo = ylo - jnp.asarray(row0, F32)
    yhi = yhi - jnp.asarray(row0, F32)
    xlo = xlo - jnp.asarray(col0, F32)
    xhi = xhi - jnp.asarray(col0, F32)

    sy_lo = jnp.clip(
        jnp.floor(ylo / F32(strip_h)).astype(jnp.int32), 0, n_strips
    )
    sy_hi = jnp.clip(
        jnp.ceil(yhi / F32(strip_h)).astype(jnp.int32), 0, n_strips
    )  # exclusive
    tx_lo = jnp.clip(
        jnp.floor(xlo / F32(tile_w)).astype(jnp.int32), 0, tiles_x
    )
    tx_hi = jnp.clip(
        jnp.floor(xhi / F32(tile_w)).astype(jnp.int32) + 1, 0, tiles_x
    )
    wx = jnp.maximum(tx_hi - tx_lo, 0)
    covers = tri_valid & (sy_hi > sy_lo) & (wx > 0)

    # Per-parity strip slots: parity h's strips within [sy_lo, sy_hi)
    # start at base_h and step rs (one strip per framebuffer tile per
    # parity, so the packed key stays at the unsplit tile count for any
    # rs).
    bases, nslots = [], []
    for h in range(rs):
        base = sy_lo + ((h - sy_lo) % rs)
        ns = jnp.where(
            sy_hi > base, (sy_hi - base + (rs - 1)) // rs, 0
        ) * wx
        bases.append(base)
        nslots.append(ns)

    small = covers
    for ns in nslots:
        small = small & (ns <= exp_h)
    large = covers & ~small

    entry_budget = int(-(-(budget_factor * max(T, blk)) // blk)) * blk
    entry_budget = min(entry_budget, -(-(T * exp_h) // blk) * blk)

    # Emission is SLOT-MAJOR — (exp_h, T) arrays, minor dim = triangles on
    # full 128 lanes, flattened row-major. The tri-major (T, exp_h)
    # .reshape(-1) form materialized a cross-lane relayout of a
    # 2-valid-lane array as the sort's operand copy (~3 ms per 4M-key
    # sort on this chip: .probe_emitlayout.py — jnp.sum consumers never
    # paid it, which hid the tax in the sort stage). Emission order is
    # free here: the packed key totally orders entries by (tile, tri),
    # and the pair fallback sorts num_keys=2 for the same total order.
    j = jnp.arange(exp_h, dtype=jnp.int32)[:, None]
    wx_safe = jnp.maximum(wx, 1)[None, :]
    entry_tri = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None, :], (exp_h, T)
    ).reshape(-1)
    tri_bits = max(1, int(T - 1).bit_length()) if T > 1 else 1
    packed_ok = not FORCE_PAIR_SORT and (nfb + 1) << tri_bits < (1 << 32)

    starts_sides, counts_sides, nblocks_sides, tris_sides = [], [], [], []
    drops = jnp.zeros((), jnp.int32)
    n_real = jnp.zeros((), jnp.int32)
    max_stream_real = jnp.zeros((), jnp.int32)
    for h in range(rs):
        strip = bases[h][None, :] + rs * (j // wx_safe)
        tile = (strip // rs) * tiles_x + (tx_lo[None, :] + j % wx_safe)
        slot_ok = small[None, :] & (j < nslots[h][None, :])
        entry_tile = jnp.where(slot_ok, tile, nfb).reshape(-1)
        if packed_ok:
            key = (
                (entry_tile.astype(jnp.uint32) << tri_bits)
                | entry_tri.astype(jnp.uint32)
            )
            (skey,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
            bounds = jnp.arange(nfb + 1, dtype=jnp.uint32) << tri_bits
            starts_full = jnp.searchsorted(
                skey, bounds, side="left"
            ).astype(jnp.int32)
            sorted_tri = (
                skey & jnp.uint32((1 << tri_bits) - 1)
            ).astype(jnp.int32)
        else:
            # num_keys=2: slot-major emission is not submission order, so
            # order by (tile, tri) explicitly — identical output to the
            # old stable-by-tile sort of tri-major entries (real
            # (tile, tri) pairs are distinct; duplicate sentinel pairs
            # are value-identical in both operands).
            sorted_tile, sorted_tri = jax.lax.sort(
                (entry_tile, entry_tri), num_keys=2, is_stable=False
            )
            starts_full = jnp.searchsorted(
                sorted_tile, jnp.arange(nfb + 1, dtype=jnp.int32),
                side="left",
            ).astype(jnp.int32)
        drops = drops + jnp.maximum(starts_full[nfb] - entry_budget, 0)
        n_real = n_real + starts_full[nfb]
        max_stream_real = jnp.maximum(max_stream_real, starts_full[nfb])
        starts_h = jnp.minimum(starts_full, entry_budget)
        keep_h = starts_h[1:] - starts_h[:-1]
        sorted_tri = jax.lax.slice(
            jnp.pad(
                sorted_tri, (0, max(0, entry_budget - sorted_tri.shape[0]))
            ),
            (0,), (entry_budget,),
        )
        # Dead tail: positions past the kept prefix are sentinel-key low
        # bits — ascending tri ids with DUPLICATES (every triangle's
        # unused slots), and duplicate-heavy index streams gather ~1.5x
        # slower than distinct ones on this chip (.probe_gather.py).
        # Point them at distinct sequential rows instead; no kernel step
        # ever reads those rows (tile ranges end inside the kept
        # prefix), so this is output-neutral.
        idx = jnp.arange(entry_budget, dtype=jnp.int32)
        sorted_tri = jnp.where(idx < starts_h[nfb], sorted_tri, idx % T)
        starts_g = starts_h + jnp.int32(h * entry_budget)
        b_lo = starts_g[:-1] // blk
        b_hi = -(-starts_g[1:] // blk)
        nblocks_sides.append(jnp.where(keep_h > 0, b_hi - b_lo, 0))
        starts_sides.append(starts_g)
        counts_sides.append(
            jnp.concatenate([keep_h, jnp.zeros((1,), jnp.int32)])
        )
        tris_sides.append(sorted_tri)

    sorted_tri = jnp.concatenate(tris_sides)
    starts = jnp.stack(starts_sides, axis=1).reshape(-1)  # 2*tile + side
    counts_out = jnp.stack(counts_sides, axis=1).reshape(-1).astype(
        jnp.int32
    )

    large_ids, n_large = _large_side_list(large, large_capacity)

    # Work items: the rs streams walk in LOCKSTEP per tile, so the item
    # count is the max over the sides' block counts.
    nwi0 = functools.reduce(jnp.maximum, nblocks_sides)
    maxw = rs * (entry_budget // blk) + (rs + 1) * nfb
    if visit_empty:
        nwi = jnp.maximum(nwi0, 1)
    else:
        nwi = jnp.where(n_large > 0, jnp.maximum(nwi0, 1), nwi0)
    cum_wi = jnp.cumsum(nwi).astype(jnp.int32)
    total_items = cum_wi[-1]
    item_start = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum_wi])
    g = jnp.arange(maxw, dtype=jnp.int32)
    tile_of_g = jnp.searchsorted(cum_wi, g, side="right").astype(jnp.int32)
    wi_tile = jnp.where(g < total_items, tile_of_g, nfb)

    return QueueBins(
        sorted_tri=sorted_tri,
        starts=starts,
        counts=counts_out,
        item_start=item_start,
        wi_tile=wi_tile,
        large_ids=large_ids,
        n_large=jnp.minimum(n_large, large_capacity),
        n_dropped=drops + jnp.maximum(n_large - large_capacity, 0),
        n_real=n_real,
        budget_util=max_stream_real.astype(F32) / F32(entry_budget),
    )


def bin_triangles_queue(
    edges: EdgeTable | None,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    blk: int,
    expansion: int = 8,
    budget_factor: float = 2,
    large_capacity: int = 2048,
    frame_height: int | None = None,
    frame_width: int | None = None,
    row0=0,
    col0=0,
    bbox=None,
    col_split: int = 1,
    row_split: int = 1,
    visit_empty: bool = True,
) -> QueueBins:
    """Scalable binning: expand + stable-sort; no relayout.

    O(T log T) instead of the mask strategy's O(T * tiles). The static
    entry budget is ``budget_factor * T`` (block-rounded) — entries beyond
    it are dropped and counted (raise budget_factor if n_dropped > 0;
    average tile coverage above ``budget_factor`` tiles/triangle is rare
    below ~30 px triangles).

    ``col_split``: split-bin mode (dual = 2, quad = 4) — ``tile_w`` is
    1/col_split of the rasterizer's output tile width, and work items
    group the col_split column bins of each output tile (bins
    col_split*i + s -> framebuffer tile i). starts/counts stay at BIN
    granularity (the kernel indexes them at col_split*tile + s);
    item_start/wi_tile are at FRAMEBUFFER-tile granularity with
    nwi = max(max_s blocks_s, 1) items per tile, so one grid step
    streams one record block from EACH sub-bin into a shared fold.

    ``row_split``: row packing (PACK_ROWS) — routes to the two-stream
    strip binning (_bin_queue_rows): entries binned to
    (tile_h/row_split)-row strips, one independently sorted stream per
    strip parity, concatenated with interleaved starts/counts so the
    split kernel's 2*tile + side indexing applies verbatim.
    ``budget_factor`` is then PER STREAM (each stream's budget =
    budget_factor * T) and ``expansion`` is ignored (each half-stream
    needs only 2 slots per triangle). Exclusive with col_split.
    """
    assert col_split == 1 or row_split == 1, "col/row split are exclusive"
    if frame_height is None:
        frame_height = height
    if frame_width is None:
        frame_width = width
    if row_split > 1:
        if bbox is None:
            bbox = triangle_bbox(edges, frame_height, frame_width)
        return _bin_queue_rows(
            bbox, height, width, tile_h, tile_w, blk, budget_factor,
            large_capacity, row0, col0, row_split, visit_empty,
        )
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    ntiles = tiles_y * tiles_x

    if bbox is None:
        bbox = triangle_bbox(edges, frame_height, frame_width)
    tri_valid, ylo, yhi, xlo, xhi = bbox
    T = tri_valid.shape[0]
    ylo = ylo - jnp.asarray(row0, F32)
    yhi = yhi - jnp.asarray(row0, F32)
    xlo = xlo - jnp.asarray(col0, F32)
    xhi = xhi - jnp.asarray(col0, F32)

    ty_lo = jnp.clip(jnp.floor(ylo / F32(tile_h)).astype(jnp.int32), 0, tiles_y)
    ty_hi = jnp.clip(jnp.ceil(yhi / F32(tile_h)).astype(jnp.int32), 0, tiles_y)
    tx_lo = jnp.clip(jnp.floor(xlo / F32(tile_w)).astype(jnp.int32), 0, tiles_x)
    tx_hi = jnp.clip(
        jnp.floor(xhi / F32(tile_w)).astype(jnp.int32) + 1, 0, tiles_x
    )
    wy = jnp.maximum(ty_hi - ty_lo, 0)
    wx = jnp.maximum(tx_hi - tx_lo, 0)
    n_tiles = jnp.where(tri_valid, wy * wx, 0)  # (T,)

    small = (n_tiles > 0) & (n_tiles <= expansion)
    large = n_tiles > expansion

    # Expansion slots: slot j covers tile (ty_lo + j // wx, tx_lo + j % wx).
    # SLOT-MAJOR emission — (expansion, T) arrays flattened row-major, so
    # the sort's operand copy reads full-lane rows instead of relayouting
    # a (T, expansion) 4-valid-lane array (~3 ms per 4M-key sort:
    # .probe_emitlayout.py). Order is free: the packed key totally orders
    # by (tile, tri); the pair fallback sorts num_keys=2 to match.
    j = jnp.arange(expansion, dtype=jnp.int32)[:, None]
    wx_safe = jnp.maximum(wx, 1)[None, :]
    tile = (ty_lo[None, :] + j // wx_safe) * tiles_x + (
        tx_lo[None, :] + j % wx_safe
    )
    slot_ok = small[None, :] & (j < n_tiles[None, :])
    entry_tile = jnp.where(slot_ok, tile, ntiles).reshape(-1)  # sentinel last
    entry_tri = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None, :], (expansion, T)
    ).reshape(-1)

    # Static entry budget: the kept record layout is exactly entry_budget
    # sorted entries; anything beyond drops, counted.
    entry_budget = int(-(-(budget_factor * max(T, blk)) // blk)) * blk
    entry_budget = min(entry_budget, -(-(T * expansion) // blk) * blk)

    compact_drops = jnp.zeros((), jnp.int32)
    precompact_real = None
    if COMPACT_ENTRIES:
        keepm = entry_tile < ntiles
        # A triangle's kept slots are a prefix (slot_ok = j < n_tiles), so
        # entry (t, j)'s compacted position is base[t] + j with base the
        # exclusive cumsum of per-triangle kept counts — a T-length scan
        # instead of one over all T*expansion slots.
        kept_n = jnp.where(small, n_tiles, 0)
        base = jnp.cumsum(kept_n) - kept_n  # exclusive, (T,)
        pos = (base[None, :] + j).reshape(-1)  # slot-major, matches entries
        precompact_real = base[-1] + kept_n[-1]
        compact_drops = jnp.maximum(precompact_real - entry_budget, 0)
        tgt = jnp.where(keepm & (pos < entry_budget), pos, entry_budget)
        entry_tile = jnp.full(
            (entry_budget + 1,), ntiles, jnp.int32
        ).at[tgt].set(entry_tile, mode="drop")[:entry_budget]
        entry_tri = jnp.zeros(
            (entry_budget + 1,), jnp.int32
        ).at[tgt].set(entry_tri, mode="drop")[:entry_budget]

    # Stable sort by tile keeps triangle-major (= submission) order per tile.
    # When (tile, tri) packs into one u32 — tri in the LOW bits, so plain
    # key order == stable-by-tile with submission order per tile — a single
    # u32 key sort halves the sort payload (the dominant binning cost at
    # multi-M triangle counts: the two-array i32 sort measured ~10 ms of
    # the 19 ms binning stage at 1M triangles). The two-array fallback
    # covers (bins, T) combinations past 32 bits (e.g. 2M triangles on a
    # split-column 1080p grid); FORCE_PAIR_SORT lets tests pin both paths
    # to identical outputs at test scale.
    tri_bits = max(1, int(T - 1).bit_length()) if T > 1 else 1
    if not FORCE_PAIR_SORT and (ntiles + 1) << tri_bits < (1 << 32):
        key = (
            (entry_tile.astype(jnp.uint32) << tri_bits)
            | entry_tri.astype(jnp.uint32)
        )
        (skey,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
        bounds = (
            jnp.arange(ntiles + 1, dtype=jnp.uint32) << tri_bits
        )
        starts_full = jnp.searchsorted(skey, bounds, side="left").astype(
            jnp.int32
        )
        sorted_tri = (
            skey & jnp.uint32((1 << tri_bits) - 1)
        ).astype(jnp.int32)
    else:
        # num_keys=2 (not stable-by-tile): slot-major emission is not
        # submission order, so order by (tile, tri) explicitly — output
        # identical to the old stable sort of tri-major entries.
        sorted_tile, sorted_tri = jax.lax.sort(
            (entry_tile, entry_tri), num_keys=2, is_stable=False
        )
        starts_full = jnp.searchsorted(
            sorted_tile, jnp.arange(ntiles + 1, dtype=jnp.int32),
            side="left",
        ).astype(jnp.int32)
    # Under COMPACT_ENTRIES the sort input was already clipped to the
    # budget, so starts_full[ntiles] understates real demand exactly when
    # it overflows — report the pre-clip count so n_real / budget_util
    # describe the scene, not the clip.
    total_real = (precompact_real if precompact_real is not None
                  else starts_full[ntiles])

    # The sorted prefix [0, EB) is kept verbatim as the record layout;
    # real entries past it (sentinel-tile entries sort last, so the
    # prefix is exactly the first EB real entries) drop. Under
    # COMPACT_ENTRIES the clip already happened pre-sort (compact_drops).
    starts = jnp.minimum(starts_full, entry_budget)  # (ntiles + 1,) clipped
    keep_t = starts[1:] - starts[:-1]
    # compact_drops IS the budget overflow when compaction pre-clipped the
    # sort input (total_real - budget would double-count it).
    entry_drops = (compact_drops if precompact_real is not None
                   else jnp.maximum(total_real - entry_budget, 0))
    sorted_tri = jax.lax.slice(
        jnp.pad(sorted_tri, (0, max(0, entry_budget - sorted_tri.shape[0]))),
        (0,), (entry_budget,),
    )
    if MASK_DEAD_GATHER:
        # Entries past the kept-real prefix carry arbitrary triangle ids
        # (sentinel-key low bits) that the record gather still fetches;
        # no kernel step ever reads those rows (tile ranges end at
        # starts[ntiles], block tails are masked in-kernel), so pointing
        # them all at row 0 is output-neutral. Whether duplicate rows
        # gather cheaper is a hardware question (.probe_gather.py).
        sorted_tri = jnp.where(
            jnp.arange(entry_budget, dtype=jnp.int32) < starts[ntiles],
            sorted_tri, 0,
        )

    large_ids, n_large = _large_side_list(large, large_capacity)

    # Work items: one per record block a tile's (unaligned) entry range
    # touches. With visit_empty, >= 1 per tile so every output tile gets
    # initialized; without it, entry-less tiles get NO grid step (the
    # caller masks their uninitialized output blocks back to the clear
    # values — bit-identical, minus one ~1 us DMA-latency-bound step per
    # empty tile, which dominated sparse scenes at 1080p). The skip
    # disables itself when the large side list is non-empty: the
    # in-kernel large fold runs at each tile's LAST item, and a large
    # triangle can cover tiles that have no small entries.
    b_lo = starts[:-1] // blk
    b_hi = -(-starts[1:] // blk)
    nblocks_bin = jnp.where(keep_t > 0, b_hi - b_lo, 0)
    if col_split > 1:
        # Split mode: one item unit per FRAMEBUFFER tile covers a block
        # from each of its col_split column bins; the group runs in
        # lockstep so the item count is the max over the sub-bins.
        nfb = ntiles // col_split
        nwi0 = nblocks_bin.reshape(nfb, col_split).max(axis=1)
        sentinel = nfb
        # sum(max_s(b_s, 1)) <= sum(blocks per bin) + nfb; each bin adds
        # <= 1 straddle block beyond its entries/blk.
        maxw = entry_budget // blk + ntiles + nfb
    else:
        nwi0 = nblocks_bin
        sentinel = ntiles
        maxw = entry_budget // blk + ntiles
    if visit_empty:
        nwi = jnp.maximum(nwi0, 1)
    else:
        nwi = jnp.where(n_large > 0, jnp.maximum(nwi0, 1), nwi0)
    cum_wi = jnp.cumsum(nwi).astype(jnp.int32)  # inclusive
    total_items = cum_wi[-1]
    item_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), cum_wi]
    )  # (sentinel + 1,); [sentinel] = total_items = first dummy item
    g = jnp.arange(maxw, dtype=jnp.int32)
    tile_of_g = jnp.searchsorted(cum_wi, g, side="right").astype(jnp.int32)
    wi_tile = jnp.where(g < total_items, tile_of_g, sentinel)

    counts_out = jnp.concatenate(
        [keep_t, jnp.zeros((1,), jnp.int32)]
    ).astype(jnp.int32)
    if col_split > 1:
        # The split kernel indexes bins at col_split*tile + s; the
        # sentinel tile's sub-bins land at indices up to
        # ntiles + col_split - 1, so pad col_split - 1 extra empty-bin
        # entries.
        pad = col_split - 1
        starts = jnp.concatenate([starts] + [starts[-1:]] * pad)
        counts_out = jnp.concatenate(
            [counts_out, jnp.zeros((pad,), jnp.int32)]
        )
    return QueueBins(
        sorted_tri=sorted_tri,
        starts=starts,
        counts=counts_out,
        item_start=item_start,
        wi_tile=wi_tile,
        large_ids=large_ids,
        n_large=jnp.minimum(n_large, large_capacity),
        n_dropped=entry_drops + jnp.maximum(n_large - large_capacity, 0),
        n_real=total_real,
        budget_util=total_real.astype(F32) / F32(entry_budget),
    )
