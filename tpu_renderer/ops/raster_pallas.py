"""Pallas tile rasterizer — the production (flagship) draw path.

Fused visibility + attribute-resolve (+ shading, untextured) design,
TPU-first (SURVEY.md §7):

1. The frame is a static grid of VMEM-resident tiles (the Pallas grid), the
   TPU-native replacement for the reference's span/row work queue
   (projekt.cpp:3609/3809). One grid program owns one tile — no cross-thread
   z races, so the reference's per-8-pixel ZMask spinlock
   (projekt.cpp:1378-1409) becomes a plain in-register merge.
2. Per tile, the kernel walks its binned triangle list in submission order,
   vectorized CHUNK_T triangles at a time, evaluating coverage, depth, AND
   the config's interpolants per fragment on (tile_h, 128)-lane tiles — the
   8-wide AVX fill loop (projekt.cpp:1028-1452) widened to the 8x128 VPU
   shape. It folds fragments with the reference's depth rules: strict
   greater wins, earlier submission keeps ties (projekt.cpp:495).
3. Shading:
   - UNTEXTURED objects (Gouraud or per-pixel Blinn-Phong) shade INSIDE the
     kernel, once per pixel at tile finalize, and emit packed ARGB directly
     — the G-buffer never round-trips HBM (that write+read was ~180 MB per
     1080p frame). Formulas are ops.shading.shade_planes — the exact
     channel-unrolled shade()/phong_shade() computation.
   - TEXTURED objects emit the channel-first (11, H, W) G-buffer and shade
     deferred in XLA (the texture fetch is one big XLA gather; per-lane
     gathers inside a TPU kernel are pathological).
   Both ways, the per-fragment lighting the CPU renderer did for LOSING
   fragments is never done at all.

The kernel is specialized per ObjectConfig at trace time: only the fields
the config consumes are interpolated and folded (Gouraud: rgba; Phong:
rgba + normal; the G-buffer path carries everything). Tile height is also
static: 32 rows for small scenes, 8 rows for large ones (small triangles
waste fragments on tall tiles; ``tile_h`` quarters that waste).

Two binning strategies feed the kernel (chosen by ``strategy=``, 'auto'
picks by triangle count):

- 'mask'   (small scenes): dense (T, tiles) mask -> padded per-tile lists
  delivered as pipelined VMEM blocks. Simple, zero-latency block delivery,
  but the mask matrix and its scatter scale O(T * tiles).
- 'sorted' (large scenes): each triangle expands to <= 8 (tile, id) entries,
  stably sorted by tile; the sorted order IS the record stream (tile ranges
  unaligned — boundary blocks mask neighbors' entries in-kernel), and the
  kernel becomes a 1D grid over (tile, block) work items whose record
  blocks are steered by scalar-prefetched indices (PrefetchScalarGridSpec)
  — the Pallas pipeline streams each tile's contiguous range,
  double-buffered. No per-tile capacity, no relayout, O(T log T) total.
  Triangles spanning more tiles than the expansion go to a small side list
  rasterized by a broadcast pass over all tiles (skipped entirely via
  lax.cond when the list is empty), merged by (z, global id) — which
  preserves the reference's submission-order depth ties exactly. Shading
  commutes with that merge (a fragment's color depends only on its own
  attributes), so the shaded variants merge packed colors by (z, gid).

The kernels consume ONE packed per-triangle record: 3 edges x 28 attribute
scalars + the global triangle id, padded to a single 128-lane f32 row (so
every indexed fetch is one contiguous row — TPU row-gathers cost per-row,
not per-byte; measured ~9 ns/row). Coverage/z/attribute formulas are the
closed forms of ops.spans, so results match the pure-JAX reference path
exactly (modulo backend FMA rounding, golden divergence #8).

On dense fine-tile grids (tile_h = 8, the multi-100k-triangle regime) the
shaded queue kernel splits each block's work in two:

- Stage A (_stage_a_fill): active-edge ordering + span setup per
  (entry, tile-row) — everything that depends on the row but not the
  pixel — computed for the WHOLE 128-entry record block at once with
  entries on the 128-lane axis (one in-kernel transpose of the block).
  Interleaved per 8-entry chunk this same math ran on 8-lane-wide (C, R)
  vectors (~6% VPU utilization) and was ~80% of kernel time; hoisting it
  to XLA outside the kernel was also tried and LOST (HBM-bound
  transposes/materialization cost more than the whole kernel).
- Stage B (_chunk_best_spanex): the chunk loop reads the span-expanded
  VMEM scratch — per-row [minx, maxx, xoff, left values, increments] —
  and keeps only the per-PIXEL work: k = xoff + (xc - minx),
  attr = left + k * inc, and the depth fold. Same formulas, same op
  order, so the split is numerically invisible.

Sparse 32-row grids and the G-buffer (textured-deferred) kernels keep the
interleaved narrow form — their work items mostly hold a handful of
entries, where a full-block stage A would be waste.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math import round_half_away
from ..core.types import DEPTH_CLEAR, LightData, ProjectiveTransform
from ..geometry.vertex import (
    EDGE_STRIDE,
    GID_LANE,
    REC_LANES,
    REC_ROWS,
    EdgeTable,
)
from .binning import (
    QueueBins,
    TileBins,
    bin_triangles,
    bin_triangles_queue,
    count_subset_per_tile,
    triangle_bbox_rows,
)
from .raster_reference import GBUF_CHANNELS
from .shading import pack_argb_planes, shade_planes

F32 = jnp.float32

TILE_W = 128
CHUNK_T = 8  # triangles evaluated per vector step (narrow paths)
# Stage-B chunk size of the WIDE (spanex) kernels. 8 shipped from round 1
# without ever being hardware-chosen; the round-5 A/Bs (measurements/r5/
# chunk.log + chunk2.log, interleaved, medians of 5, bit-equal,
# drop-free) walked the ladder: 8 -> 16 won -7..8.5% end to end (1M
# 33.03 -> 30.22 ms, 2M 55.12 -> 51.16), 16 -> 32 another -3.1..3.3%
# (1M 30.19 -> 29.18, 2M 51.09 -> 49.50) — longer slot runs amortize
# per-chunk scratch reads and loop overhead — while 4 fails the remote
# Mosaic compile. Narrow paths (sparse 16/32-row tiles, the broadcast
# side list) keep CHUNK_T=8: their work items hold a handful of
# entries, and 16 measured a LOSS there (config 4 1.614 -> 1.640 ms,
# config 5 4.883 -> 5.542 — doubled masked work per partial chunk).
WIDE_CHUNK_T = 32
# Sorted-strategy narrow-path (16/32-row tiles) entries per pipelined
# record block. 128 won the r4 A/B, bit-equal (measurements/r4/
# ab_queueblk.log: config 4 1.549 -> 1.536 ms, config 5 4.894 -> 4.854
# — fewer work items; the masked boundary chunks cost less than the
# per-item overhead they replace).
QUEUE_BLK = 128
# Wide-stage-A record-block size (dense grids); >= 128 fills the lanes.
# 256 halves the work items (per-item DMA latency + boundary-entry
# masking amortize better) and won the r4 A/B drop-free + bit-equal at
# both probed scales (measurements/r4/ab_wideblk.log: 41.09 -> 40.34 ms
# @1M, 70.44 -> 69.07 @2M, interleaved medians of 5); 128 was never
# hardware-chosen, just the initial guess.
WIDE_BLK = 256
_BIG = 3.4028235e38
AUTO_SORTED_THRESHOLD = 512  # auto switches to sorted binning above this


# Probe hook: visit every tile (pre-round-3 behavior) instead of
# skipping entry-less ones; lets the empty-tile-skip win be measured in
# one process. Bit-identical output either way (tested).
VISIT_EMPTY_TILES = False

# Probe hook: when set, overrides _queue_expansion's budget factor (the
# static entry budget sets the length of the per-frame record gather at
# ~13 ns/row AND the sort size under COMPACT_ENTRIES, so tightening it is
# a direct stream/raster saving — at the price of a smaller overflow
# margin; drops stay counted, never silent).
BUDGET_FACTOR_OVERRIDE = None


def _queue_expansion(tile_h: int, num_triangles: int, override=None):
    """(expansion, budget_factor) for the sorted strategy's entry stream.

    In the 32-row-tile regime (small scenes) triangles are allowed to span
    up to 32 tiles before falling to the large side list — mid-size
    triangles (a few hundred px) are common there and the side-list walk
    costs ceil(n_large/8) chunk evals on EVERY tile it overlaps; the wider
    expansion keeps them in the per-tile stream at a few extra sort
    entries. Dense scenes (8-row tiles) have tiny triangles; past ~65k
    the bbox of a typical triangle spans <= 2 fine tiles, and the entry
    budget — which sets the length of the per-frame record GATHER, the
    single most expensive XLA stage (~35 ns/row of random HBM access) —
    tightens to 1.2*T: real entries run ~1.2 per *visible* triangle, so
    1.2*T covers a fully-visible (uncullable) mesh at the edge and
    closed meshes (~0.6*T visible after backface culling) with 1.6x
    margin. The round-3 budget A/B (.ab_budget.py, drop-free at every
    factor) measured factors 1.5/1.25/1.2 at 167.9/161.0/144.9 ms per
    2M-triangle 1080p Phong frame and 316.1/272.6/271.4 ms at 4M — the
    old 1.5 default paid ~15% for margin no probed mesh used. Closed
    meshes can push further (0.8 measured 139.0 / 257.9 ms) via
    BUDGET_FACTOR_OVERRIDE. Overflow is counted in
    stats['bins_dropped'], never silent."""
    if tile_h >= 16 and num_triangles <= 16384:
        exp, bf = 32, 4
    elif tile_h <= 8 and num_triangles > 65536:
        exp, bf = 4, 1.2
    else:
        exp, bf = 8, 2
    if override is None:
        override = BUDGET_FACTOR_OVERRIDE
    if override is not None:
        bf = override
    return exp, bf
# Auto-switch to 8-row tiles when the mean frame area per triangle drops
# below this: small triangles make 32-row tiles waste 4x fragment work,
# and dense scenes amortize the finer grid's per-step DMA latency. Below
# the density cut, mid-size triangles would overflow the fine grid's tile
# expansion into the broadcast side pass (measured 2.6 ms vs 22 ms at
# 2.2k tris at 1080p). The cut is AREA-RELATIVE: the old fixed 8192-
# triangle threshold was calibrated at 1080p (~253 px/triangle) and kept
# a 5.4k-triangle 512^2 scene — 48 px/triangle of tiny fragments — on
# coarse tiles (BENCH round 2's config-2 regression, 0.39x the CPU).
TILE8_PX_PER_TRI = 256

# Fine-tile grids MAY bin at sub-tile column granularity (128/PACK_SPLIT
# columns per bin) with the queue kernel folding one entry of each
# sub-bin per chunk slot ("split packing"; 2 = dual 64-column, 4 = quad
# 32-column, 8 = octal 16-column) — the idea being that every (8, 128)
# fragment op serving PACK_SPLIT entries divides stage-B cost for tiny
# triangles. The round-3 hardware A/B (.ab_split.py, measurements/r3/)
# KILLED it: the tree merge's per-plane selects cost more than the
# shared fragment ops save at every split — 1M-triangle 1080p Phong
# measured 82.4 / 90.2 / 112.5 / 149.1 ms at splits 1/2/4/8 (tree), and
# the 'repeat' merge variants fail Mosaic compilation outright — so the
# default is 1 (single full-width bin). The machinery stays (bit-exact,
# tested) for future re-probes. Module flag (trace-time constant) so
# A/B probes can compile variants in one process.
PACK_SPLIT = 1

# Row packing: fine-tile grids MAY bin at (tile_h/PACK_ROWS)-row strip
# granularity and fold one entry per strip per chunk slot — the sublane
# dual of split packing, but with NO merge step: the strips are disjoint
# ROW sets and the span scratch already stores every quantity per
# (entry, row) lane, so stage A simply writes strip 0's entries on
# sublanes [0, tile_h/2) and strip 1's on [tile_h/2, tile_h) of the same
# slot. Each (C, R, W) stage-B fragment op then serves 2 entries — the
# win split packing promised without the lane-select tree that killed it
# (.ab_split.py). The binning side runs TWO per-parity streams
# (binning._bin_queue_rows): two 2T-key sorts instead of one 4T sort,
# packed u32 keys at the unsplit tile count, and independent stream
# offsets so the lockstep walk actually overlaps a tile's two runs.
# Bit-exact vs the unpacked fold (tested). Module flag (trace-time
# constant) for A/B; applied only on wide grids at or below
# PACK_ROWS_MAX_PX_PER_TRI mean pixels per triangle — above it, taller
# triangles overflow the strip expansion into the large side list.
# Hardware verdict (measurements/r3/ab_rows3.log, interleaved A/B,
# medians of 5, 1080p Phong): rows 2 beats rows 1 at every active
# scale — 36.6 vs 40.5 ms @500k, 64.2 vs 71.7 @1M, 116.5 vs 124.5 @2M
# — once the two-stream strip binning + 0.45 per-stream budget landed
# (earlier single-sort/0.75-budget drafts lost at 2M to stream gather
# and binning overhead; rows_stages_2m.log has the attribution).
# rows=4 (quarter strips, 4 entries per fragment op) was the round-4
# candidate to halve stage B again; the hardware A/B KILLED it at every
# scale (measurements/r4/ab_rows4.log, interleaved, medians of 5,
# drop-free, checks bit-equal): 30.2 vs 27.2 ms @500k, 77.9 vs 73.1
# @2M, 179.1 vs 149.1 @4M — the two extra per-parity sorts (4 x 2T keys
# vs 2 x 2T) plus doubled stream walking cost more than the shared
# fragment ops save on this VPU.
PACK_ROWS = 2
# Rows gate: packing applies at or below this mean px/triangle. Was 6
# (round 3); the r4 A/B at the 8.3 and 11.5 px/tri points (250k/180k
# tris at 1080p, measurements/r4/ab_rowsgate.log) measured rows ON
# winning drop-free and bit-equal at both (17.1 -> 15.9 ms and
# 13.2 -> 12.95), so the gate widened to 12 — taller triangles above it
# would overflow the 4-row strip expansion into the large side list.
PACK_ROWS_MAX_PX_PER_TRI = 12
# Per-STREAM entry budget under row packing, as a fraction of the dense
# budget factor: each parity stream holds ~half the entries, with
# headroom for imbalance (drops stay counted, never silent; measured
# strip straddle inflation at 1M/2M is ~zero — .ab_rows.py entry stats).
# The budget drives BOTH the stream gather length and the static
# work-item grid bound, so headroom is paid per frame: 0.75 measured
# +28 ms of stream gather at 2M (measurements/r3/rows_stages_2m.log).
# 0.45 gives each stream ~2.2x headroom at the rows-gate edge; used
# verbatim under BUDGET_FACTOR_OVERRIDE (the escape hatch's semantics
# are unchanged). The DEFAULT budget is density-aware instead — see
# _rows_stream_budget_factor.
PACK_ROWS_STREAM_FRAC = 0.45


def _rows_stream_budget_factor(t_policy, frame_height, frame_width):
    """Per-stream budget factor (fraction of T) for the rows-packed
    streams, scaled to scene DENSITY.

    Real per-stream demand falls with px/triangle — sub-pixel triangles
    whose rounded row span is empty bin NO entries, and at 1 px/tri
    only ~27% of triangles produce one (r4 utilization sweep,
    measurements/r4/probe_util3.log: real/stream/T = 0.272 / 0.248 /
    0.222 / 0.191 / 0.134 / 0.095 at 5.9 / 4.2 / 2.9 / 2.1 / 1.0 / 0.5
    px/tri on 1080p sphere grids). The flat 0.54T per-stream budget was
    therefore ~4x oversized at 2M triangles, and the budget's length is
    paid every frame as stream-gather rows + work-item grid bound.
    This returns a piecewise-linear interpolation of 2x the measured
    demand, clamped to the flat budget above the gate (never looser),
    with a floor for ultra-dense scenes. Unusual meshes (extreme strip
    straddle, single-parity pathologies) can exceed it: drops are
    counted, never silent, and BUDGET_FACTOR_OVERRIDE / the
    calibrate_budget_factor API remain the escape hatches."""
    ppt = (frame_height * frame_width) / max(t_policy, 1)
    pts = (  # (px/tri, per-stream budget = 2x measured demand)
        (0.52, 0.19), (1.04, 0.268), (2.07, 0.382),
        (2.93, 0.444), (4.15, 0.496), (5.88, 0.544),
    )
    flat = 0.54  # the pre-round-4 flat budget: 1.2 * 0.45 per stream
    if ppt <= pts[0][0]:
        return pts[0][1]
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        if ppt <= x1:
            return min(flat, y0 + (y1 - y0) * (ppt - x0) / (x1 - x0))
    return flat

# How the split kernel merges sub-bin quantity planes: 'tree' (lane-select
# tree), 'repeat' (minor-axis stack + lane repeat; bit-equal in
# interpret mode but REJECTED by Mosaic on real TPU — MosaicError at
# compile, .ab_split.py round 3 — so it is a CPU-only curiosity), or
# 'mxu' (ONE block-diagonal expander matmul merges EVERY quantity plane
# of the chunk at once): stack the S sub-bin chunk slices (C, L) on a
# minor axis, reshape to (C*L, S), and multiply by the constant 0/1
# expander E[s, w] = [w // sub_w == s] — output row (c, l) lane w is
# exactly sub-bin (w // sub_w)'s value, i.e. the tree's result, computed
# on the MXU instead of ~(S-1) VPU selects per plane. Exact: each output
# element is one f32 value * 1.0 plus zeros (any per-pass bf16
# decomposition of x*1.0 + 0 reproduces x bit-exactly; the kernel
# requests HIGHEST precision), so outputs stay bit-equal (tested). The
# round-3 verdict killed 'tree' split packing because the merge cost
# grew with S; 'mxu' makes the merge O(1) vector ops + one matmul, which
# re-opened the split-packing question. Hardware verdict (measurements/
# r4/ab_mxu.log, 1M tris 1080p Phong, interleaved, medians of 5,
# drop-free, checks bit-equal): still a CRUSHING loss — split 1 control
# 42.2 ms vs 136.9 (split 4) / 180.6 (split 8); split 16 failed the
# remote compile. The stacked-operand relayout + col-split binning's
# pair-sort fallback + per-tile lockstep block multiplication dwarf the
# fold sharing at every split on this chip. Split packing is dead here
# in BOTH merge forms; the machinery stays bit-exact-tested for chips
# where relayout/matmul issue differently.
SPLIT_MERGE = "tree"

# Occlusion block-skip in the wide kernels: before a work item's chunk
# loop, compare the record block's conservative max interpolated z
# (endpoint z of every entry span, from the stage-A scratch) against the
# tile's current MINIMUM winning z; when even the block's closest
# fragment cannot beat the farthest already-won pixel, the whole chunk
# loop is skipped. EXACTLY output-preserving with no reordering: a
# skipped entry's z is <= block_zmax <= tile_minz <= every pixel's
# current winner, and the depth rule is strict '>' with first-writer
# ties (projekt.cpp:495) — equal z loses to the resident winner anyway.
# A 1e-6 relative safety margin absorbs any 1-ulp divergence between
# this bound's arithmetic and the fold's (e.g. differing FMA
# contraction); the margin only ever FORFEITS skips, never wrongly
# takes one. tile_minz stays DEPTH_CLEAR until every pixel of the tile
# is covered, so the skip fires only on fully-covered tiles — occluded
# geometry submitted after nearer geometry (painter's-order scenes,
# depth-complex interiors). Hardware verdict (measurements/r4/
# ab_zcull.log; interleaved A/B, medians of 5, checks bit-equal,
# drop-free): LOSS on a single-layer 4M-tri sphere (170.9 vs 148.3 ms
# — the cull never fires, and the per-item bound+min-reduce costs
# ~15%), WIN on a 6-deep front-to-back sphere stack at 2.1M tris
# (86.2 vs 98.7 ms, -12.7%). The benchmark scenes are single-layer,
# so the default is OFF; flip it for depth-complex painter's-order
# workloads.
ZCULL_BLOCKS = False

# Stage-B chunk-fold form in the wide (spanex) kernels: False = direct
# (evaluate every slot's attribute fragment planes and fold them slot by
# slot — the measured-safe default), True = deferred (fold only z + the
# winning SLOT index, then select that slot's (left, inc) span values
# with one shared slot-select tree and evaluate each attribute ONCE).
# The winner, its k, and its (left, inc) operands are identical either
# way, so attribute values are bit-equal (tested); losing pixels carry
# garbage attributes in the deferred form, but the tile merge only reads
# attribute planes where best_z won, and best_z = DEPTH_CLEAR never wins.
# Cuts per-chunk attribute work from 2*nf slot-plane evals + nf*CHUNK_T
# fold selects to ~2*nf tree selects + nf evals. The round-3 hardware
# A/B (.ab_fold.py) measured a WASH with a slight consistent loss
# (122.97 vs 122.65 ms at 2M triangles, 256.8 vs 256.4 ms at 4M, split
# 1): the slot-select tree costs what the per-slot fold saves on this
# VPU. Default stays False; the variant stays tested for future chips.
FOLD_DEFERRED = False

# Per-edge field layout inside the packed record (28 floats per edge;
# EDGE_STRIDE/GID_LANE/REC_LANES are owned by geometry.vertex, which WRITES
# this layout directly — setup_records — and re-exported here).
_F_VALID, _F_YMIN, _F_YMAX, _F_X0, _F_XG, _F_Z0, _F_ZG = range(7)
_F_OZ0, _F_OZG, _F_U0, _F_UG, _F_V0, _F_VG, _F_LEFT = range(7, 14)
_F_COL0 = 14  # 4 floats
_F_COLG = 18  # 4 floats
_F_N0 = 22  # 3 floats
_F_NG = 25  # 3 floats
# The gid lane is f32 — exact up to 2**24 triangles PER SCENE
# (concat makes it scene-global; rasterize_scene_shaded enforces this).
MAX_SCENE_TRIANGLES = 2 ** 24

ATTR_CHANNELS = GBUF_CHANNELS - 1  # G-buffer minus the leading z channel

# (j0, jg) record-field pairs for G-buffer channels 1..10, in channel order:
# rgba color, normal xyz, u/z, v/z, 1/z (ops.raster_reference layout).
_COL_FIELDS = tuple((_F_COL0 + c, _F_COLG + c) for c in range(4))
_NRM_FIELDS = tuple((_F_N0 + c, _F_NG + c) for c in range(3))
_UV_FIELDS = ((_F_U0, _F_UG), (_F_V0, _F_VG), (_F_OZ0, _F_OZG))
_ATTR_FIELDS = _COL_FIELDS + _NRM_FIELDS + _UV_FIELDS

# Mask-strategy guard: per-tile record blocks above this VMEM footprint (or
# total materialization above the HBM cap) must use the sorted strategy.
_MASK_BLOCK_VMEM_CAP = 4 * 1024 * 1024
_MASK_TOTAL_HBM_CAP = 512 * 1024 * 1024


def _pick_tile_h(num_triangles: int, height: int = 1080,
                 width: int = 1920) -> int:
    """8-row tiles (wide kernel) for dense scenes, 16-row for sparse.

    Sparse default was 32 through round 2; the round-3 tile-height A/B
    (.ab_tileh.py) measured 16/32/64-row tiles at 1.90/2.03/2.24 ms on
    config 4 (2.2k tris, 1080p Phong) and 9.87/15.43/24.70 ms on a
    40k-tri narrow-path sphere — halving the fragment rows beats the
    doubled grid steps at every probed point (bit-identical outputs).
    """
    return (
        8 if num_triangles * TILE8_PX_PER_TRI > height * width else 16
    )


def pack_records(edges: EdgeTable) -> jnp.ndarray:
    """(T, 128) f32 packed records: 3 edges x 28 fields + the triangle id.

    Embedding the id lets the kernels emit GLOBAL ids directly — a per-pixel
    slot->id gather afterwards costs ~10ms/frame at 1080p (TPU scalar
    gathers), which dominated the whole pipeline before this."""
    T = edges.num_triangles
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
    cols.append(jnp.arange(T, dtype=jnp.int32).astype(F32))  # GID_LANE
    rec = jnp.stack(cols, axis=1)  # (T, 85)
    return jnp.pad(rec, ((0, 0), (0, REC_LANES - rec.shape[1])))


_PACK_T_BLK = 512  # triangles per grid step of the pack-transpose kernel


def finish_records(rec_t: jnp.ndarray) -> jnp.ndarray:
    """Channel-major (85+, T) record table -> (Tp, 128) ROW-MAJOR table.

    Pads to 128 lane rows / _PACK_T_BLK triangles and transposes with a
    trivial Pallas kernel. Pallas outputs always carry the standard
    (sublane, lane) layout, which pins the table row-major for the sorted
    strategy's per-entry row gather: left to itself, XLA either fuses the
    85-row stack into the gather or materializes it column-major; both make
    each row fetch touch ~85 strided locations (measured 35-47 ns/row vs
    ~13 ns/row from a row-major table — at a 1.5M-entry stream that
    difference is ~40 ms/frame). The channel-major input is what
    geometry.vertex.setup_records writes DIRECTLY (fused with the field
    math), so no (T, 3)-minor relayout ever materializes."""
    T = rec_t.shape[1]
    rec_t = jnp.pad(
        rec_t,
        ((0, REC_LANES - rec_t.shape[0]), (0, -T % _PACK_T_BLK)),
    )  # (128, Tp)
    tp = rec_t.shape[1]

    def kern(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:])

    return pl.pallas_call(
        kern,
        interpret=jax.default_backend() != "tpu",
        grid=(tp // _PACK_T_BLK,),
        in_specs=[
            pl.BlockSpec((REC_LANES, _PACK_T_BLK), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec(
            (_PACK_T_BLK, REC_LANES), lambda i: (i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((tp, REC_LANES), F32),
    )(rec_t)


def pack_records_rowmajor(edges: EdgeTable) -> jnp.ndarray:
    """(Tp, 128) row-major packed records from an EdgeTable (compat path —
    the fast path feeds finish_records from setup_records directly)."""
    T = edges.num_triangles
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
    cols.append(jnp.arange(T, dtype=jnp.int32).astype(F32))  # GID_LANE
    return finish_records(jnp.stack(cols, axis=0))


def shade_params(transform: ProjectiveTransform, lights: LightData):
    """Flat f32 scalar array for the in-kernel shader (SMEM):
    [dat, fl, m2p, cx, cy, ambient*4, (light_p*3, light_I*4) per light]."""
    parts = [
        jnp.asarray(transform.distance_above_target, F32).reshape(1),
        jnp.asarray(transform.focal_length, F32).reshape(1),
        jnp.asarray(transform.meters_to_pixels, F32).reshape(1),
        jnp.asarray(transform.screen_center, F32).reshape(2),
        jnp.asarray(lights.ambient, F32).reshape(4),
    ]
    for k in range(lights.count):
        parts.append(jnp.asarray(lights.light_p[k], F32).reshape(3))
        parts.append(jnp.asarray(lights.light_intensity[k], F32).reshape(4))
    return jnp.concatenate(parts)


# In-kernel fused texturing is limited to textures whose channel-blocked
# bf16 form fits comfortably in VMEM alongside the tile buffers. The limits
# apply to the whole per-scene ATLAS (all fused textures stacked row-wise).
MAX_FUSED_TEX_DIM = 512
MAX_FUSED_TEX_PIXELS = 128 * 128


class ObjSpec(NamedTuple):
    """Static (trace-time) per-object spec for the fused scene kernel.

    gid_[lo,hi): the object's global-triangle-id range in the concatenated
    edge table (geometry.vertex.concat_edge_tables); phong selects per-pixel
    Blinn-Phong at tile finalize; tex is None or (v_off, th, tw) or
    (v_off, th, tw, 'bilinear') — the object's texture rows inside the
    packed scene atlas (+ optional filter mode; default nearest). Hashable,
    so it can close over the Pallas kernels as a static."""

    gid_lo: int
    gid_hi: int
    phong: bool
    tex: tuple | None

    @property
    def bilinear(self) -> bool:
        return self.tex is not None and len(self.tex) > 3 and (
            self.tex[3] == "bilinear"
        )


def _scene_fields(objspecs):
    """The union of record fields the scene's finalize consumes, plus the
    static plane offsets of each group (None = group absent). Interpolated
    color is skipped when EVERY object is textured (texture replaces the
    base color entirely — shade()'s quirk, projekt.cpp:427-445 + 513)."""
    want_col = any(o.tex is None for o in objspecs)
    want_nrm = any(o.phong for o in objspecs)
    want_uv = any(o.tex is not None for o in objspecs)
    fields: tuple = ()
    col_off = nrm_off = uv_off = None
    if want_col:
        col_off = 0
        fields += _COL_FIELDS
    if want_nrm:
        nrm_off = len(fields)
        fields += _NRM_FIELDS
    if want_uv:
        uv_off = len(fields)
        fields += _UV_FIELDS
    return fields, col_off, nrm_off, uv_off


def _atlas_dims(objspecs):
    """Static (rows, max-width) of the scene texture atlas."""
    ah = max(o.tex[0] + o.tex[1] for o in objspecs if o.tex is not None)
    aw = max(o.tex[2] for o in objspecs if o.tex is not None)
    return ah, aw


def pack_texture_mxu(texture_u32) -> jnp.ndarray:
    """(th, 4*tw) bf16 channel-blocked INTEGER texel planes [r|g|b|a].

    Texel channel ints (0..255) are exact in bf16, so the kernel's one-hot
    MXU contraction reproduces unpack_argb's values bit-exactly after the
    final f32 multiply by 1/255. Channel order matches unpack_argb
    (projekt.cpp:440-443): r=bits[23:16], g=[15:8], b=[7:0], a=[31:24]."""
    t = texture_u32.astype(jnp.uint32)
    r = ((t >> 16) & 0xFF).astype(jnp.bfloat16)
    g = ((t >> 8) & 0xFF).astype(jnp.bfloat16)
    b = (t & 0xFF).astype(jnp.bfloat16)
    a = ((t >> 24) & 0xFF).astype(jnp.bfloat16)
    return jnp.concatenate([r, g, b, a], axis=1)


def pack_texture_atlas(textures):
    """Stack textures row-wise into one channel-blocked bf16 scene atlas.

    Returns (atlas(AH, 4*AW) bf16, row offsets per texture). Each texture's
    channel c occupies columns [c*AW, c*AW + tw); rows [off, off+th). All
    values are exact integer texels (pack_texture_mxu), so atlas sampling
    stays bit-identical to per-texture sampling."""
    aw = max(int(t.shape[1]) for t in textures)
    rows, offs, off = [], [], 0
    for t in textures:
        th, tw = int(t.shape[0]), int(t.shape[1])
        b = pack_texture_mxu(t)  # (th, 4*tw)
        if tw < aw:
            b = jnp.concatenate(
                [
                    jnp.pad(b[:, c * tw:(c + 1) * tw], ((0, 0), (0, aw - tw)))
                    for c in range(4)
                ],
                axis=1,
            )
        rows.append(b)
        offs.append(off)
        off += th
    return jnp.concatenate(rows, axis=0), offs


_SAMPLE_SLAB = 8  # pixel rows per one-hot contraction slab
# Windowed row contraction (round 5, VERDICT item 5): when a slab's
# REFERENCED atlas-row range fits in this many rows, the one-hot MXU
# contraction runs over a dynamic TEX_ROW_WINDOW-row window of the atlas
# instead of all AH rows — the full contraction paid the whole atlas's
# row space per covered slab regardless of which texels the tile touches
# (r4 probe_tex: bilinear sampling was ~1.6 of config 3's 1.79 ms at 12
# triangles). Exact: every referenced row is inside the window when it
# fits (the range is measured over ``need``-masked pixels only; unneeded
# pixels may fall outside, their one-hot matches nothing, they produce
# zeros, and every consumer selects sampled rgba under tex_mask —
# the same contract SAMPLE_SLAB_SKIP already relies on). Slabs whose
# range exceeds the window fall back to the full contraction. 0 = off.
# Default pending the round-5 hardware A/B (.r5_texwin.py) — bit-equal
# across 0/16/32 in interpret mode (and asserted on-chip by the A/B).
TEX_ROW_WINDOW = 0
# Skip the per-slab texture contraction on slabs with no textured
# coverage (zeros written instead; every consumer selects sampled rgba
# under tex_mask, so output-exact — tested). Hardware verdict
# (measurements/r4/ab_slabskip.log, interleaved, medians of 5, checks
# bit-equal): a WASH on the BASELINE scenes — config 3's covered tiles
# are nearly fully covered so the existing per-tile tex_any gate
# already took the win (1.79 -> 1.76 ms), and dense textured spheres
# run tile_h=8 where the slab loop doesn't exist (16.40 vs 16.43 ms).
# Stays ON: measured free, and pays on sparse textured coverage inside
# 16/32-row tiles.
SAMPLE_SLAB_SKIP = True


def _by_row_slabs(sample_fn, planes, tile_h, tile_w, slab=_SAMPLE_SLAB,
                  need=None, n_mid=0, mid_lanes=0):
    """Apply ``sample_fn`` (N (r, W) f32 planes + need plane (or None) +
    ``n_mid`` (r, W, mid_lanes) f32 VMEM accumulator refs ->
    4 (r, W) rgba planes)
    over ``slab``-row slices of the tile, serialized through a fori_loop
    on scoped VMEM refs. Bounds the one-hot contraction intermediates
    ((r, W, AH) one-hots, (r, W, 4*AW) f32 row texels) to a couple of MB
    TOTAL: a full 32-row tile's bilinear intermediates measured 34 MB of
    scoped VMEM against the 16 MB on-chip limit, and an unrolled slab
    loop still left ~20 MB coexisting (found by bench.py --parity
    config 3 — CPU interpret mode has no such limit; the fori_loop forces
    the allocator to reuse one slab's buffers). Slab order is row order
    and per-element math is untouched, so values are bit-identical.

    ``need`` ((tile_h, tile_w) bool, optional): pixels whose sample is
    actually consumed (the caller's tex_mask — every consumer selects
    sampled rgba under it). Slabs with NO needed pixel skip the
    contraction and write zeros — output-exact, and the dominant cost
    of sparse textured scenes (config 3's cube covers ~26% of the
    frame; r4 probe_tex: bilinear sampling was ~1.6 of its 1.8 ms).

    All planes ride one f32 ref; integer index planes are exact in f32
    for any atlas dimension <= 2**24, and ``sample_fn`` casts back."""
    if tile_h <= slab:
        if n_mid == 0:
            return sample_fn(
                *planes,
                None if need is None
                else jnp.where(need, F32(1.0), F32(0.0)),
            )

        def scoped_direct(*mid_refs):
            return sample_fn(
                *planes,
                None if need is None
                else jnp.where(need, F32(1.0), F32(0.0)),
                *mid_refs,
            )

        return pl.run_scoped(
            scoped_direct,
            *(
                pltpu.VMEM((tile_h, tile_w, mid_lanes), F32)
                for _ in range(n_mid)
            ),
        )
    n = len(planes)

    def scoped(in_ref, out_ref, *mid_refs):
        for i, p in enumerate(planes):
            in_ref[i] = p.astype(F32)
        if need is not None:
            in_ref[n] = jnp.where(need, F32(1.0), F32(0.0))

        def step(s, _):
            rows = pl.ds(s * slab, slab)

            def run():
                outs = sample_fn(
                    *(in_ref[i, rows, :] for i in range(n)),
                    in_ref[n, rows, :] if need is not None else None,
                    *mid_refs,
                )
                for c in range(4):
                    out_ref[c, rows, :] = outs[c]

            if need is None:
                run()
            else:
                slab_any = jnp.any(in_ref[n, rows, :] > F32(0.5))
                pl.when(slab_any)(run)

                @pl.when(jnp.logical_not(slab_any))
                def _():
                    for c in range(4):
                        out_ref[c, rows, :] = jnp.zeros(
                            (slab, tile_w), F32
                        )
            return 0

        jax.lax.fori_loop(0, tile_h // slab, step, 0)
        return [out_ref[c] for c in range(4)]

    return pl.run_scoped(
        scoped,
        pltpu.VMEM((n + (need is not None), tile_h, tile_w), F32),
        pltpu.VMEM((4, tile_h, tile_w), F32),
        *(
            pltpu.VMEM((slab, tile_w, mid_lanes), F32)
            for _ in range(n_mid)
        ),
    )


def _sample_texture_atlas(txi, tyi, tex_ref, ah, aw, tile_h, tile_w,
                          need=None):
    """Nearest-neighbor texel fetch from the scene atlas as an MXU one-hot
    contraction (TPU per-element gathers measured ~15 ms/frame at 1080p;
    this is ~0.3 ms of bf16 matmul).

    txi/tyi: (R, W) i32 atlas indices (column within the owning texture,
    global atlas row — the caller does sample_texture's 'scalar'-mode index
    math per object, projekt.cpp:429-445). The row one-hot contracts against
    the channel-blocked atlas on the MXU (exact: one-hot times ints <= 255,
    f32 accumulate), then a masked sum over the column one-hot picks the
    texel. Returns 4 (R, W) rgba planes in [0, 1]."""
    # One contraction across all 4 channel blocks (N = 4*AW keeps the MXU
    # fuller than per-channel N = AW dots); Mosaic requires a 32-bit
    # accumulator, and the f32 result is exact for texel ints <= 255.
    windowed = TEX_ROW_WINDOW > 0 and ah > TEX_ROW_WINDOW

    def one(txi_s, tyi_s, need_s, *mid_refs):
        r = txi_s.shape[0]
        txi_s = txi_s.astype(jnp.int32)  # exact f32 round-trip via the
        tyi_s = tyi_s.astype(jnp.int32)  # slab ref (no-op when direct)
        if windowed:
            mid = _row_texels_win(tyi_s, tex_ref, ah, r, tile_w, need_s,
                                  mid_refs[0])
        else:
            mid = _row_texels(tyi_s, tex_ref, ah, r, tile_w)
        return _col_pick(txi_s, mid, aw, r, tile_w)

    return _by_row_slabs(one, (txi, tyi), tile_h, tile_w, need=need,
                         n_mid=1 if windowed else 0,
                         mid_lanes=int(tex_ref.shape[1]))


def _row_texels(tyi, tex_ref, ah, tile_h, tile_w):
    """(R, W, 4*AW) exact integer texels of atlas row tyi per pixel — the
    row one-hot MXU contraction shared by nearest and bilinear sampling."""
    oh_v = (
        tyi[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w, ah), 2)
    ).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        oh_v, tex_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=F32,
    )


def _row_texels_win(tyi, tex_ref, ah, tile_h, tile_w, need, mid_ref):
    """Windowed _row_texels (TEX_ROW_WINDOW flag comment): decompose the
    row contraction into STATIC TEX_ROW_WINDOW-row blocks of the atlas
    and skip (pl.when) every block the slab's needed row range misses —
    a covered slab typically references 1-2 of ah/win blocks. Exact: the
    included blocks' contributions sum to the full contraction for every
    row a needed pixel references (rows outside [rmin, rmax] belong only
    to unneeded pixels, whose samples no consumer reads — tex_mask
    select). Static slices + pl.when + a caller-allocated accumulator
    only (a first draft used a data-dependent pl.ds sublane slice +
    nested run_scoped; Mosaic rejected the compile —
    measurements/r5/texwin.log v1). Writes mid into ``mid_ref``
    ((tile_h, tile_w, 4*AW) f32 VMEM) and returns it."""
    win = TEX_ROW_WINDOW
    if win <= 0 or ah <= win:
        return _row_texels(tyi, tex_ref, ah, tile_h, tile_w)
    if need is None:
        rmin = jnp.min(tyi)
        rmax = jnp.max(tyi)
    else:
        nb_m = need > F32(0.5)
        rmin = jnp.min(jnp.where(nb_m, tyi, ah))
        rmax = jnp.max(jnp.where(nb_m, tyi, -1))
    mid_ref[:] = jnp.zeros((tile_h, tile_w, tex_ref.shape[1]), F32)
    n_blocks = -(-ah // win)
    for b in range(n_blocks):
        lo = b * win
        hi = min(ah, lo + win)
        wb = hi - lo

        @pl.when((rmax >= lo) & (rmin < hi))
        def _(lo=lo, wb=wb):
            oh_v = (
                (tyi - lo)[:, :, None]
                == jax.lax.broadcasted_iota(
                    jnp.int32, (tile_h, tile_w, wb), 2
                )
            ).astype(jnp.bfloat16)
            mid_ref[:] += jax.lax.dot_general(
                oh_v, tex_ref[lo:lo + wb, :],
                (((2,), (0,)), ((), ())),
                preferred_element_type=F32,
            )

    return mid_ref[:]


def _col_pick(txi, mid, aw, tile_h, tile_w):
    """4 rgba planes in [0, 1]: select column txi of each channel block of
    ``mid`` (_row_texels output) and scale by 1/255 (exact for texel ints,
    bit-equal to unpack_argb)."""
    oh_u = (
        txi[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w, aw), 2)
    ).astype(F32)
    inv255 = F32(1.0) / F32(255.0)
    return [
        jnp.sum(oh_u * mid[:, :, c * aw:(c + 1) * aw], axis=-1) * inv255
        for c in range(4)
    ]


def _sample_texture_atlas_bilinear(txi0, txi1, tyi0, tyi1, fx, fy, tex_ref,
                                   ah, aw, tile_h, tile_w, need=None):
    """4-texel bilinear fetch from the scene atlas (BASELINE config 3's
    contract): the nearest sampler's one-hot MXU trick twice over rows
    (tyi0, tyi1) and twice over columns (txi0, txi1), then the EXACT lerp
    of ops.shading.sample_texture's bilinear branch — corners unpack to
    [0, 1] first, then top/bot = c0 + fx * (c1 - c0), out = top + fy *
    (bot - top), identical f32 op order. Nearest-mode objects in the same
    scene ride through with fx = fy = 0 and collapsed indices (a zero-t
    lerp returns c00 exactly), so one sampler serves mixed scenes.

    Reference texel fetch analog: projekt.cpp:1035-1142 (nearest); the
    bilinear mode is this framework's documented extension."""
    windowed = TEX_ROW_WINDOW > 0 and ah > TEX_ROW_WINDOW

    def one(txi0_s, txi1_s, tyi0_s, tyi1_s, fx_s, fy_s, need_s,
            *mid_refs):
        r = txi0_s.shape[0]
        txi0_s = txi0_s.astype(jnp.int32)  # exact f32 round-trip via
        txi1_s = txi1_s.astype(jnp.int32)  # the slab ref (no-op when
        tyi0_s = tyi0_s.astype(jnp.int32)  # called direct)
        tyi1_s = tyi1_s.astype(jnp.int32)
        if windowed:
            mid0 = _row_texels_win(tyi0_s, tex_ref, ah, r, tile_w,
                                   need_s, mid_refs[0])
            mid1 = _row_texels_win(tyi1_s, tex_ref, ah, r, tile_w,
                                   need_s, mid_refs[1])
        else:
            mid0 = _row_texels(tyi0_s, tex_ref, ah, r, tile_w)
            mid1 = _row_texels(tyi1_s, tex_ref, ah, r, tile_w)
        c00 = _col_pick(txi0_s, mid0, aw, r, tile_w)
        c10 = _col_pick(txi1_s, mid0, aw, r, tile_w)
        c01 = _col_pick(txi0_s, mid1, aw, r, tile_w)
        c11 = _col_pick(txi1_s, mid1, aw, r, tile_w)
        out = []
        for c in range(4):
            top = c00[c] + fx_s * (c10[c] - c00[c])
            bot = c01[c] + fx_s * (c11[c] - c01[c])
            out.append(top + fy_s * (bot - top))
        return out

    return _by_row_slabs(
        one, (txi0, txi1, tyi0, tyi1, fx, fy), tile_h, tile_w, need=need,
        n_mid=2 if windowed else 0, mid_lanes=int(tex_ref.shape[1]),
    )


def _chunk_best(rec, lo_rel, n_rel, yf, xc, w_f, fields, tile_h, tile_w):
    """Fold CHUNK_T triangles' fragments: coverage + z + the ``fields``
    interpolants, best-per-pixel (earlier entry wins z ties).

    rec: (CHUNK_T, REC_LANES) records; entries with index < lo_rel or >=
    n_rel are masked (in the sorted strategy, boundary blocks contain
    entries belonging to neighboring tiles' ranges). Returns
    (best_z, best_gid, [best_plane per field]), each (tile_h, tile_w).

    The interpolation forms are the closed forms of ops.spans (the exact
    per-pixel values the reference's span walk produces,
    projekt.cpp:306-539): attribute = left + (XOffset + (x - minx)) * inc.
    """

    def field(e, j):
        return rec[:, e * EDGE_STRIDE + j][:, None]  # (C, 1)

    # Per-edge row values as (C, R) — NOT (C, R, 1): a trailing size-1 lane
    # dim is padded to 128 lanes on TPU, making every cheap row op cost as
    # much as a full (C, R, W) fragment op (measured 32x).
    act, xs, dys, xgs, lefts = [], [], [], [], []
    for e in range(3):
        valid_e = field(e, _F_VALID) > F32(0.5)
        ymin_e, ymax_e = field(e, _F_YMIN), field(e, _F_YMAX)
        dy = yf - ymin_e
        act.append(valid_e & (ymin_e <= yf) & (yf < ymax_e))
        xs.append(field(e, _F_X0) + dy * field(e, _F_XG))
        dys.append(dy)
        xgs.append(jnp.broadcast_to(field(e, _F_XG), dy.shape))
        lefts.append(jnp.broadcast_to(field(e, _F_LEFT), dy.shape))

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

    def attr_lr(j0, jg):
        vals = [field(e, j0) + dys[e] * field(e, jg) for e in range(3)]
        return pick(vals, 0), pick(vals, 1)

    xl, xr = pick(xs, 0), pick(xs, 1)  # (C, R)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK_T, 1), 0)
    nact = (
        act[0].astype(jnp.int32)
        + act[1].astype(jnp.int32)
        + act[2].astype(jnp.int32)
    )
    span_ok = (nact >= 2) & (cidx >= lo_rel) & (cidx < n_rel)  # (C, R)

    # Span setup + pixel coverage (projekt.cpp:306-529, closed form).
    xd = round_half_away(xr - xl)
    nz = xd != F32(0.0)
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

    # Pixel expansion — the only (C, R, W) stage. (Minor-dim insertion is
    # only supported for 32-bit types on TPU, so the bool mask expands via
    # an f32 carrier.)
    m3 = lambda a: a[:, :, None]  # (C, R) -> (C, R, 1)
    span_f = jnp.where(span_ok, F32(1.0), F32(0.0))
    inspan = (
        (m3(span_f) > F32(0.5)) & (xc >= m3(minx)) & (xc <= m3(maxx))
    )  # (C, R, W)
    k = m3(xoff) + (xc - m3(minx))

    zl, zr = attr_lr(_F_Z0, _F_ZG)
    zinc = jnp.where(nz, (zr - zl) / xd, F32(0.0))
    zfrag = m3(zl) + k * m3(zinc)  # (C, R, W)

    frags = []
    for j0, jg in fields:
        al, ar = attr_lr(j0, jg)
        inc = jnp.where(nz, (ar - al) / xd, F32(0.0))
        frags.append(m3(al) + k * m3(inc))  # (C, R, W)

    # Fold the chunk: earlier (smaller slot == smaller id) wins ties.
    gids = rec[:, GID_LANE][:, None, None].astype(jnp.int32)  # (C, 1, 1)
    return _fold_chunk(inspan, zfrag, frags, gids, len(fields), tile_h,
                       tile_w)


def _fold_chunk(inspan, zfrag, frags, gids, n_fields, tile_h, tile_w):
    """Fold CHUNK_T fragment layers best-per-pixel (strict greater z wins;
    earlier slot — smaller id in a sorted stream — keeps ties, the
    reference's first-writer rule, projekt.cpp:495)."""
    best_z = jnp.full((tile_h, tile_w), DEPTH_CLEAR, F32)
    best_i = jnp.full((tile_h, tile_w), jnp.int32(-1))
    best_a = [jnp.zeros((tile_h, tile_w), F32) for _ in range(n_fields)]
    for c in range(inspan.shape[0]):
        zc = jnp.where(inspan[c], zfrag[c], DEPTH_CLEAR)
        win = zc > best_z
        best_z = jnp.where(win, zc, best_z)
        best_i = jnp.where(win, gids[c], best_i)  # (1,1) or (1,W) bcast
        for i in range(n_fields):
            best_a[i] = jnp.where(win, frags[i][c], best_a[i])
    return best_z, best_i, best_a


def _fold_chunk_z(inspan, zfrag, gids, tile_h, tile_w):
    """Depth-only chunk fold: (best_z, best_gid, best_slot) with the exact
    _fold_chunk winner rule (strict greater z, earlier slot keeps ties).
    best_slot is 0 where nothing won — harmless, because every consumer
    gates on best_z (DEPTH_CLEAR never beats an initialized tile)."""
    best_z = jnp.full((tile_h, tile_w), DEPTH_CLEAR, F32)
    best_i = jnp.full((tile_h, tile_w), jnp.int32(-1))
    best_s = jnp.zeros((tile_h, tile_w), jnp.int32)
    for c in range(inspan.shape[0]):
        zc = jnp.where(inspan[c], zfrag[c], DEPTH_CLEAR)
        win = zc > best_z
        best_z = jnp.where(win, zc, best_z)
        best_i = jnp.where(win, gids[c], best_i)
        best_s = jnp.where(win, jnp.int32(c), best_s)
    return best_z, best_i, best_s


def _slot_masks(best_s, n):
    """The slot-select tree's internal-node predicates, computed ONCE per
    chunk and shared by every selected quantity (k + 2 per field)."""
    masks = {}

    def walk(lo, hi):
        if hi - lo <= 1:
            return
        mid = (lo + hi) // 2
        masks[(lo, hi)] = best_s < mid
        walk(lo, mid)
        walk(mid, hi)

    walk(0, n)
    return masks


def _slot_select(masks, leaves):
    """Per-pixel select of leaves[best_s] via the shared predicate tree
    (log2(CHUNK_T) levels, len(leaves)-1 vector selects)."""

    def t(lo, hi):
        if hi - lo == 1:
            return leaves[lo]
        mid = (lo + hi) // 2
        return jnp.where(masks[(lo, hi)], t(lo, mid), t(mid, hi))

    return t(0, len(leaves))


# ---------------------------------------------------------------------------
# Span-expanded stream (stage A on XLA, stage B in the kernel)
# ---------------------------------------------------------------------------

# Per-(entry, tile-row) span quantities preceding the attribute pairs:
# minx (k's reference point), mlo/mhi (the mask bounds: minx/maxx clamped
# to the entry's bin half, span_ok folded into mhi as -BIG), xoff, zl,
# zinc. minx and mlo split so the dual 64-column binning can clip an
# entry's WRITE mask to its own half while k = xoff + (xc - minx) keeps
# interpolating from the true span start (identical values — the other
# half's pixels come from the twin entry in the other bin).
SPANEX_QBASE = 6


def _spanex_layout(n_fields, tile_h):
    """(quantity count, gid lane, padded lane count) of a span record.

    The gid rides PER ROW (tile_h lanes, like every other quantity): with
    row packing (PACK_ROWS > 1) one chunk slot carries a different entry —
    hence a different gid — per tile-row strip; the unpacked path simply
    broadcasts one gid across the row lanes (bit-identical fold)."""
    q = SPANEX_QBASE + 2 * n_fields
    gid_lane = q * tile_h
    lanes = -(-(gid_lane + tile_h) // 128) * 128
    return q, gid_lane, lanes


def _stage_a_fill(scr_ref, rt, yf_col, ent_lo, ent_hi, w_f, fields,
                  tile_h, half_lo=None, half_hi=None, rt_strips=(),
                  ent_strips=()):
    """Wide in-kernel stage A: span setup for ALL entries of one
    transposed record block at once — active-edge ordering, span bounds,
    left values and per-pixel increments (the ops.spans closed forms,
    identical op order) — with entries on the 128-lane axis. The narrow
    per-chunk form computed the same on (8, R) vectors at ~6% lane
    utilization and was ~80% of kernel time in dense scenes (measured
    ~25 of ~45 ms at 250k triangles); hoisting it to XLA instead was
    tried and LOST (+25 ms of HBM-bound transposes/materialization at
    250k — see git history), so the wide form lives in the kernel where
    the block is already VMEM-resident.

    rt: (REC_LANES, E) transposed packed-record block; yf_col: (tile_h, 1)
    f32 global frame rows of the target tile. Writes scr_ref (E, L) in
    _chunk_best_spanex's lane layout: lane q*tile_h + r = quantity q at
    row r, quantities [minx, maxx', xoff, zl, zinc] + [al, ainc per
    field], gid on lanes [q_total*tile_h, (q_total+1)*tile_h); maxx' =
    -BIG on rows with no span and on entries outside [ent_lo, ent_hi)
    (neighbor tiles' entries in boundary blocks).

    ``rt_strips`` (row packing, PACK_ROWS > 1): EXTRA record blocks —
    stream s's entries are binned to rows [s*strip_h, (s+1)*strip_h) of
    the tile, strip_h = tile_h / n_streams. Sublanes of strip 0 take
    every field from ``rt`` and strip s > 0 from ``rt_strips[s-1]`` —
    slot e of the span scratch then carries n_streams entries on
    disjoint row strips, so every stage-B (C, R, W) fragment op serves
    n_streams entries with NO merge step (the mechanism that killed
    column split packing — sub-bin lane-select trees — does not exist
    here: rows are the sublane axis and every quantity is already
    stored per (entry, row)). Per-entry math is the single-block form
    verbatim on that entry's sublanes, so values are bit-identical to
    running the strips unpacked. ``ent_strips`` holds the extra blocks'
    (ent_lo, ent_hi) boundary-entry masks."""
    e_n = rt.shape[1]
    rts = [rt] + list(rt_strips)
    n_streams = len(rts)
    if n_streams > 1:
        strip_h = tile_h // n_streams
        sidx = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0) // strip_h

    def strip_select(vals):
        # vals[s] applies on strip s's sublanes; a linear select chain
        # (for n_streams == 2 this is exactly the old single where).
        out = vals[-1]
        for s in range(n_streams - 2, -1, -1):
            out = jnp.where(sidx < (s + 1), vals[s], out)
        return out

    def field(e, j):
        if n_streams == 1:
            return rt[e * EDGE_STRIDE + j, :][None, :]  # (1, E)
        return strip_select(
            [r[e * EDGE_STRIDE + j, :][None, :] for r in rts]
        )

    yf = yf_col  # (R, 1)

    act, xs, dys, xgs, lefts = [], [], [], [], []
    for e in range(3):
        valid_e = field(e, _F_VALID) > F32(0.5)
        ymin_e, ymax_e = field(e, _F_YMIN), field(e, _F_YMAX)
        dy = yf - ymin_e
        act.append(valid_e & (ymin_e <= yf) & (yf < ymax_e))
        xs.append(field(e, _F_X0) + dy * field(e, _F_XG))
        dys.append(dy)
        xgs.append(jnp.broadcast_to(field(e, _F_XG), dy.shape))
        lefts.append(jnp.broadcast_to(field(e, _F_LEFT), dy.shape))

    # AET ordering (projekt.cpp:212-216): lexicographic (x, xg, left, e) —
    # the same comparator as _chunk_best / ops.spans._edge_order.
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

    def attr_lr(j0, jg):
        vals = [field(e, j0) + dys[e] * field(e, jg) for e in range(3)]
        return pick(vals, 0), pick(vals, 1)

    xl, xr = pick(xs, 0), pick(xs, 1)  # (R, E)
    nact = (
        act[0].astype(jnp.int32)
        + act[1].astype(jnp.int32)
        + act[2].astype(jnp.int32)
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, e_n), 1)
    if n_streams > 1:
        ent_lo = strip_select(
            [ent_lo] + [lo for lo, _ in ent_strips]
        )  # (tile_h, 1)
        ent_hi = strip_select([ent_hi] + [hi for _, hi in ent_strips])
    span_ok = (nact >= 2) & (lane >= ent_lo) & (lane < ent_hi)

    # Span setup (projekt.cpp:306-421, closed form — identical op order to
    # _chunk_best so the restructure is bit-invisible).
    xd = round_half_away(xr - xl)
    nz = xd != F32(0.0)
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
    maxx = jnp.where(span_ok, maxx, F32(-_BIG))  # coverage gate

    # Mask bounds: the span clipped to this record block's bin half (the
    # dual 64-column packing); plain (single-bin) callers pass no halves
    # and the bounds degenerate to minx/maxx exactly.
    mlo = minx if half_lo is None else jnp.maximum(minx, half_lo)
    mhi = maxx if half_hi is None else jnp.minimum(maxx, half_hi)

    zl, zr = attr_lr(_F_Z0, _F_ZG)
    quants = [minx, mlo, mhi, xoff, zl,
              jnp.where(nz, (zr - zl) / xd, F32(0.0))]
    for j0, jg in fields:
        al, ar = attr_lr(j0, jg)
        quants += [al, jnp.where(nz, (ar - al) / xd, F32(0.0))]

    _, gid_lane, _ = _spanex_layout(len(fields), tile_h)
    for i, q in enumerate(quants):
        scr_ref[:, i * tile_h:(i + 1) * tile_h] = jnp.transpose(q)
    gid_row = rt[GID_LANE, :][None, :]
    if n_streams > 1:
        gid_row = strip_select([r[GID_LANE, :][None, :] for r in rts])
    scr_ref[:, gid_lane:gid_lane + tile_h] = jnp.transpose(
        jnp.broadcast_to(gid_row, (tile_h, e_n))
    )


def _chunk_best_spanex(rec, xc, n_fields, tile_h, tile_w):
    """Stage B fold over CHUNK_T span-expanded records (_stage_a_fill
    layout): per fragment only k = xoff + (xc - minx), z/attr = left +
    k * inc, and the best-per-pixel fold remain. Entry masking (block
    boundaries, missing spans, bin-half clipping) is already folded into
    mlo/mhi by stage A."""

    def q(i):
        return rec[:, i * tile_h:(i + 1) * tile_h]  # (C, R)

    minx, mlo, mhi, xoff, zl, zinc = (q(i) for i in range(SPANEX_QBASE))

    m3 = lambda a: a[:, :, None]  # (C, R) -> (C, R, 1)
    inspan = (xc >= m3(mlo)) & (xc <= m3(mhi))  # (C, R, W)
    k = m3(xoff) + (xc - m3(minx))
    zfrag = m3(zl) + k * m3(zinc)
    _, gid_lane, _ = _spanex_layout(n_fields, tile_h)
    # Per-row gids: one chunk slot carries one entry per row strip under
    # row packing (a broadcast row otherwise — same fold either way).
    gids = rec[:, gid_lane:gid_lane + tile_h][:, :, None].astype(jnp.int32)
    if FOLD_DEFERRED:
        C = rec.shape[0]
        best_z, best_i, best_s = _fold_chunk_z(inspan, zfrag, gids,
                                               tile_h, tile_w)
        masks = _slot_masks(best_s, C)
        k_sel = _slot_select(masks, [k[c] for c in range(C)])
        best_a = []
        for i in range(n_fields):
            al = q(SPANEX_QBASE + 2 * i)
            inc = q(SPANEX_QBASE + 2 * i + 1)
            al_s = _slot_select(
                masks, [al[c][:, None] for c in range(C)]
            )
            inc_s = _slot_select(
                masks, [inc[c][:, None] for c in range(C)]
            )
            # Same operands and op order as the direct frag eval for the
            # winning slot -> bit-equal attribute values.
            best_a.append(al_s + k_sel * inc_s)
        return best_z, best_i, best_a
    frags = [
        m3(q(SPANEX_QBASE + 2 * i)) + k * m3(q(SPANEX_QBASE + 2 * i + 1))
        for i in range(n_fields)
    ]
    return _fold_chunk(inspan, zfrag, frags, gids, n_fields, tile_h,
                       tile_w)


def _chunk_best_spanex_split(recs, xc, sub_w, n_fields, tile_h, tile_w):
    """Split-bin stage B: chunk slot c carries len(recs) entries — the
    s-th stream's on lanes [s*sub_w, (s+1)*sub_w) — so every (C, R, W)
    fragment op serves len(recs) entries. The sub-bins are spatially
    disjoint (sub-tile column binning clips each entry's mask to its bin
    via mlo/mhi in stage A), so the per-pixel fold sees exactly the
    entries of ITS bin in stream order — identical winners, ties, and
    values to running the streams separately (projekt.cpp:495
    first-writer rule). The fragment math is shared; sub-bin quantities
    merge per SPLIT_MERGE:

    - 'tree': binary lane-select tree per plane, log2(split) levels but
      split-1 full-width selects — per-ENTRY merge cost approaches one
      full plane rebuild as split grows, capping the split win.
    - 'repeat': stack the sub-bin values on a size-``split`` minor axis
      and element-repeat each sub_w times along lanes (one relayout op
      per plane if Mosaic lowers repeat as a lane shuffle — the hardware
      A/B decides whether it does).

    Both produce the identical blocked-by-bin layout, so outputs are
    bit-equal (tested)."""
    split = len(recs)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile_w), 2)

    if SPLIT_MERGE == "mxu" and split > 1:
        # One expander matmul merges EVERY plane of the chunk (flag
        # comment at SPLIT_MERGE): stacked[c, l, s] @ E[s, w] places
        # sub-bin s's (slot, lane-l) value on its sub_w output lanes.
        C = recs[0].shape[0]
        _, gl, _ = _spanex_layout(n_fields, tile_h)
        L = gl + tile_h  # consumed lanes only (drop the 128-pad tail)
        stacked = jnp.stack([r[:, :L] for r in recs], axis=-1)  # (C, L, S)
        # Masked (entry, row) span lanes legitimately hold NaN/Inf from
        # degenerate-span arithmetic (e.g. (zr - zl) / xd at xd = Inf);
        # the tree select never READS them, but here NaN * 0 = NaN would
        # poison every other sub-bin's output lanes through the matmul's
        # sum. Zeroing non-finite operands is output-exact: a lane whose
        # own sub-bin value was non-finite is one whose span mask (mhi =
        # -BIG, always finite) already excludes it from the fold.
        stacked = jnp.where(jnp.isfinite(stacked), stacked, F32(0.0))
        E = (
            jax.lax.broadcasted_iota(jnp.int32, (split, tile_w), 1)
            // sub_w
            == jax.lax.broadcasted_iota(jnp.int32, (split, tile_w), 0)
        ).astype(F32)
        merged = jax.lax.dot_general(
            stacked.reshape(C * L, split), E,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(C, L, tile_w)
        _, gid_lane_m, _ = _spanex_layout(n_fields, tile_h)

        def m3(i):
            return merged[:, i * tile_h:(i + 1) * tile_h, :]

        minx, mlo, mhi, xoff, zl, zinc = (m3(i) for i in range(SPANEX_QBASE))
        inspan = (xc >= mlo) & (xc <= mhi)
        k = xoff + (xc - minx)
        zfrag = zl + k * zinc
        gids = merged[
            :, gid_lane_m:gid_lane_m + tile_h, :
        ].astype(jnp.int32)
        if FOLD_DEFERRED:
            best_z, best_i, best_s = _fold_chunk_z(inspan, zfrag, gids,
                                                   tile_h, tile_w)
            masks = _slot_masks(best_s, C)
            k_sel = _slot_select(masks, [k[c] for c in range(C)])
            best_a = []
            for i in range(n_fields):
                al = m3(SPANEX_QBASE + 2 * i)
                inc = m3(SPANEX_QBASE + 2 * i + 1)
                al_s = _slot_select(masks, [al[c] for c in range(C)])
                inc_s = _slot_select(
                    masks, [inc[c] for c in range(C)]
                )
                best_a.append(al_s + k_sel * inc_s)
            return best_z, best_i, best_a
        frags = [
            m3(SPANEX_QBASE + 2 * i) + k * m3(SPANEX_QBASE + 2 * i + 1)
            for i in range(n_fields)
        ]
        return _fold_chunk(inspan, zfrag, frags, gids, n_fields, tile_h,
                           tile_w)

    def tree(parts, lo, width):
        # Binary select tree over the sub-bins' (C, R, 1) planes.
        if len(parts) == 1:
            return parts[0]
        half = len(parts) // 2
        cut = lane < (lo + half) * width
        return jnp.where(
            cut,
            tree(parts[:half], lo, width),
            tree(parts[half:], lo + half, width),
        )

    def merge(parts):
        # parts: one (C, R) plane per sub-bin -> (C, R, W) blocked by bin.
        if SPLIT_MERGE == "repeat" and split > 1:
            return jnp.repeat(
                jnp.stack(parts, axis=2), sub_w, axis=2
            )  # (C, R, split) -> (C, R, W)
        return tree([p[:, :, None] for p in parts], 0, sub_w)

    def m3(i):
        return merge([r[:, i * tile_h:(i + 1) * tile_h] for r in recs])

    minx, mlo, mhi, xoff, zl, zinc = (m3(i) for i in range(SPANEX_QBASE))
    inspan = (xc >= mlo) & (xc <= mhi)
    k = xoff + (xc - minx)
    zfrag = zl + k * zinc
    _, gid_lane, _ = _spanex_layout(n_fields, tile_h)
    if SPLIT_MERGE == "repeat" and split > 1:
        gids = jnp.repeat(
            jnp.stack(
                [r[:, gid_lane:gid_lane + tile_h] for r in recs], axis=2
            ),
            sub_w, axis=2,
        ).astype(jnp.int32)  # (C, R, W)
    else:
        gparts = [
            r[:, gid_lane:gid_lane + tile_h][:, :, None] for r in recs
        ]  # (C, R, 1)
        gids = tree(gparts, 0, sub_w).astype(jnp.int32)  # (C, R, W)
    if FOLD_DEFERRED:
        C = recs[0].shape[0]
        best_z, best_i, best_s = _fold_chunk_z(inspan, zfrag, gids,
                                               tile_h, tile_w)
        masks = _slot_masks(best_s, C)
        k_sel = _slot_select(masks, [k[c] for c in range(C)])
        best_a = []
        for i in range(n_fields):
            al = m3(SPANEX_QBASE + 2 * i)
            inc = m3(SPANEX_QBASE + 2 * i + 1)
            al_s = _slot_select(masks, [al[c] for c in range(C)])
            inc_s = _slot_select(masks, [inc[c] for c in range(C)])
            best_a.append(al_s + k_sel * inc_s)
        return best_z, best_i, best_a
    frags = [
        m3(SPANEX_QBASE + 2 * i) + k * m3(SPANEX_QBASE + 2 * i + 1)
        for i in range(n_fields)
    ]
    return _fold_chunk(inspan, zfrag, frags, gids, n_fields, tile_h,
                       tile_w)


def _merge_chunk_gbuf(best, gid_ref, gbuf_ref):
    """Merge a chunk fold into (gid, 11-channel gbuf) refs; ``best`` carries
    the full _ATTR_FIELDS plane list."""
    best_z, best_i, best_a = best
    win = best_z > gbuf_ref[0, :, :]
    gid_ref[:] = jnp.where(win, best_i, gid_ref[:])
    gbuf_ref[:] = jnp.where(
        win[None], jnp.stack([best_z] + best_a), gbuf_ref[:]
    )


def _merge_chunk_shaded(best, z_ref, gid_ref, scr_ref):
    """Merge a chunk fold into (z, gid) refs + the attribute scratch."""
    best_z, best_i, best_a = best
    win = best_z > z_ref[:]
    z_ref[:] = jnp.where(win, best_z, z_ref[:])
    gid_ref[:] = jnp.where(win, best_i, gid_ref[:])
    scr_ref[:] = jnp.where(win[None], jnp.stack(best_a), scr_ref[:])


def _merge_chunk_shaded_bygid(best, z_ref, gid_ref, scr_ref):
    """Gid-aware chunk merge: strict greater z wins; equal z resolves to
    the smaller global id (= earlier submission). Used where the incoming
    chunk is NOT ordered after the accumulated fragments (the sorted
    strategy's large-triangle lists interleave with the main stream by
    gid), so the plain first-writer tie rule would be wrong."""
    best_z, best_i, best_a = best
    z, gid = z_ref[:], gid_ref[:]
    cov = best_i >= 0
    win = cov & (
        (best_z > z) | ((best_z == z) & ((gid < 0) | (best_i < gid)))
    )
    z_ref[:] = jnp.where(win, best_z, z)
    gid_ref[:] = jnp.where(win, best_i, gid)
    scr_ref[:] = jnp.where(win[None], jnp.stack(best_a), scr_ref[:])


def _tile_coords_rw(origin, ty, tx, tile_h, tile_w):
    """Global (1, R) row / (1, 1, W) col coordinate carriers for the chunk
    math (leading broadcast dims keep row-level ops off the lane axis)."""
    yf = (
        jax.lax.broadcasted_iota(jnp.int32, (1, tile_h), 1)
        + (origin[0] + ty * tile_h)
    ).astype(F32)
    xc = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile_w), 2)
        + (origin[1] + tx * tile_w)
    ).astype(F32)
    return yf, xc


def _pixel_coords(origin, ty, tx, tile_h, tile_w):
    """Global (R, W) pixel coordinate planes (the in-kernel shader's px/py,
    same integer values shade() builds from arange + origin)."""
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        + (origin[0] + ty * tile_h)
    ).astype(F32)
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        + (origin[1] + tx * tile_w)
    ).astype(F32)
    return px, py


def _write_tile_color(color_ref, z_ref, gid_ref, scr_ref, origin, ty, tx,
                      params_ref, objspecs, n_lights, tile_h, tile_w,
                      tex_ref):
    """Finalize a tile's packed color, skipping the shade/sample work on
    tiles with no coverage (an uncovered tile's color is pack(zero base) =
    0 in every config, so writing zeros is output-equivalent; texture
    sampling costs ~10 us/tile and empty tiles are common). In mixed
    scenes, tiles covered only by UNTEXTURED objects additionally skip the
    MXU texture sampling (a second specialization of the same finalize —
    the branches write identical colors where they overlap, only the
    skipped work differs)."""
    gid = gid_ref[:]
    cov_any = jnp.any(gid >= 0)
    fields, _, _, _ = _scene_fields(objspecs)

    def planes():
        return [scr_ref[i, :, :] for i in range(len(fields))]

    if tex_ref is None:
        @pl.when(cov_any)
        def _():
            color_ref[:] = _finalize_shade(
                z_ref[:], gid, planes(), origin, ty, tx, params_ref,
                objspecs, n_lights, tile_h, tile_w, None,
            )
    else:
        tex_any = jnp.zeros((), jnp.bool_)
        last_hi = objspecs[-1].gid_hi
        for o in objspecs:
            if o.tex is None:
                continue
            m = gid >= 0
            if len(objspecs) > 1 and o.gid_lo > 0:
                m = m & (gid >= o.gid_lo)
            if len(objspecs) > 1 and o.gid_hi < last_hi:
                m = m & (gid < o.gid_hi)
            tex_any = tex_any | jnp.any(m)

        @pl.when(cov_any & tex_any)
        def _():
            color_ref[:] = _finalize_shade(
                z_ref[:], gid, planes(), origin, ty, tx, params_ref,
                objspecs, n_lights, tile_h, tile_w, tex_ref,
            )

        @pl.when(cov_any & jnp.logical_not(tex_any))
        def _():
            color_ref[:] = _finalize_shade(
                z_ref[:], gid, planes(), origin, ty, tx, params_ref,
                objspecs, n_lights, tile_h, tile_w, None,
            )

    @pl.when(jnp.logical_not(cov_any))
    def _():
        color_ref[:] = jnp.zeros((tile_h, tile_w), jnp.uint32)


def _finalize_shade(z, gid, planes, origin, ty, tx, params_ref, objspecs,
                    n_lights, tile_h, tile_w, tex_ref=None):
    """Tile finalize: shade the winning fragments (ops.shading.shade_planes
    semantics) and pack ARGB. Uncovered pixels keep the zero base color,
    exactly like shade()'s covered-select + pack in the XLA path.

    Multi-object scenes resolve per-pixel object identity from the winner's
    GLOBAL triangle id against the static gid ranges (a handful of vector
    compares — the whole scene renders in ONE kernel, the TPU answer to the
    reference's per-model work items, projekt.cpp:3873-3878), then select
    that object's shading: textured objects take the MXU-sampled atlas
    texel as base color (shade()'s textured branch: perspective u/v from
    the interpolated u/z, v/z, 1/z; Gouraud+texture = unlit texture), and
    phong objects take the per-pixel Blinn-Phong result."""
    _, col_off, nrm_off, uv_off = _scene_fields(objspecs)
    covered = gid >= 0
    px, py = _pixel_coords(origin, ty, tx, tile_h, tile_w)
    cam = tuple(params_ref[i] for i in range(5))
    ambient = tuple(params_ref[5 + c] for c in range(4))
    light_p = [
        tuple(params_ref[9 + 7 * k + i] for i in range(3))
        for k in range(n_lights)
    ]
    light_i = [
        tuple(params_ref[9 + 7 * k + 3 + c] for c in range(4))
        for k in range(n_lights)
    ]
    # Per-object pixel masks from the static gid ranges (trivially `covered`
    # for single-object scenes; range endpoints shared with neighbors are
    # elided).
    multi = len(objspecs) > 1
    last_hi = objspecs[-1].gid_hi
    masks = []
    for o in objspecs:
        m = covered
        if multi and o.gid_lo > 0:
            m = m & (gid >= o.gid_lo)
        if multi and o.gid_hi < last_hi:
            m = m & (gid < o.gid_hi)
        masks.append(m)

    if col_off is not None:
        col = list(planes[col_off:col_off + 4])
    else:
        col = [jnp.zeros((tile_h, tile_w), F32) for _ in range(4)]
    if tex_ref is not None:
        tex_objs = [
            (o, m) for o, m in zip(objspecs, masks) if o.tex is not None
        ]
        tex_mask = tex_objs[0][1]
        for _, m in tex_objs[1:]:
            tex_mask = tex_mask | m
        inv_oz = F32(1.0) / planes[uv_off + 2]
        u = jnp.where(tex_mask, inv_oz * planes[uv_off], F32(0.0))
        v = jnp.where(tex_mask, inv_oz * planes[uv_off + 1], F32(0.0))
        any_bilinear = any(o.bilinear for o, _ in tex_objs)
        zero = jnp.zeros((tile_h, tile_w), F32)
        txi = tyi = txi1 = tyi1 = fx = fy = None

        def merge(old, new, m):
            return new if old is None else jnp.where(m, new, old)

        for o, m in tex_objs:
            v_off, th, tw = o.tex[0], o.tex[1], o.tex[2]
            if o.bilinear:
                # ops.shading.sample_texture bilinear index math, exact:
                # frac from the UNCLIPPED floor, indices clipped after.
                tu = u * F32(tw - 1)
                tv = v * F32(th - 1)
                x0 = jnp.floor(tu)
                y0 = jnp.floor(tv)
                fx_o, fy_o = tu - x0, tv - y0
                txi_o = jnp.clip(x0.astype(jnp.int32), 0, tw - 1)
                tyi_c = jnp.clip(y0.astype(jnp.int32), 0, th - 1)
                txi1_o = jnp.minimum(txi_o + 1, tw - 1)
                tyi1_o = jnp.minimum(tyi_c + 1, th - 1) + v_off
                tyi_o = tyi_c + v_off
            else:
                # 'scalar' nearest (projekt.cpp:429-445); rides the
                # bilinear sampler as a zero-t lerp when the scene mixes
                # modes (c00 + 0 * (c10 - c00) == c00 exactly).
                txi_o = jnp.clip(
                    round_half_away(u * F32(tw - 1)).astype(jnp.int32),
                    0, tw - 1,
                )
                tyi_o = jnp.clip(
                    round_half_away(v * F32(th - 1)).astype(jnp.int32),
                    0, th - 1,
                ) + v_off
                txi1_o, tyi1_o, fx_o, fy_o = txi_o, tyi_o, zero, zero
            txi = merge(txi, txi_o, m)
            tyi = merge(tyi, tyi_o, m)
            if any_bilinear:
                txi1 = merge(txi1, txi1_o, m)
                tyi1 = merge(tyi1, tyi1_o, m)
                fx = merge(fx, fx_o, m)
                fy = merge(fy, fy_o, m)
        ah, aw = _atlas_dims(objspecs)
        if any_bilinear:
            tex_rgba = _sample_texture_atlas_bilinear(
                txi, txi1, tyi, tyi1, fx, fy, tex_ref, ah, aw, tile_h,
                tile_w, need=tex_mask if SAMPLE_SLAB_SKIP else None,
            )
        else:
            tex_rgba = _sample_texture_atlas(
                txi, tyi, tex_ref, ah, aw, tile_h, tile_w,
                need=tex_mask if SAMPLE_SLAB_SKIP else None,
            )
        col = [jnp.where(tex_mask, tex_rgba[c], col[c]) for c in range(4)]

    any_phong = nrm_off is not None
    nrm = planes[nrm_off:nrm_off + 3] if any_phong else None
    rgba = shade_planes(z, col, nrm, px, py, cam, ambient, light_p,
                        light_i, any_phong, n_lights)
    if any_phong:
        pm = None
        for o, m in zip(objspecs, masks):
            if o.phong:
                pm = m if pm is None else (pm | m)
        rgba = [jnp.where(pm, rgba[c], col[c]) for c in range(4)]
    return pack_argb_planes(rgba[0], rgba[1], rgba[2], rgba[3])


# ---------------------------------------------------------------------------
# G-buffer family (textured configs + the raw-G-buffer API)
# ---------------------------------------------------------------------------


def _init_gbuf_tile(gid_ref, gbuf_ref, tile_h, tile_w):
    gid_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)
    gbuf_ref[:] = jnp.concatenate([
        jnp.full((1, tile_h, tile_w), DEPTH_CLEAR, F32),
        jnp.zeros((ATTR_CHANNELS, tile_h, tile_w), F32),
    ])


def _gbuf_out_specs_2d(tile_h, tile_w):
    return [
        pl.BlockSpec(
            (tile_h, tile_w), lambda ty, tx: (ty, tx),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (GBUF_CHANNELS, tile_h, tile_w), lambda ty, tx: (0, ty, tx),
            memory_space=pltpu.VMEM,
        ),
    ]


def _gbuf_out_shapes(padded_h, padded_w):
    return [
        jax.ShapeDtypeStruct((padded_h, padded_w), jnp.int32),
        jax.ShapeDtypeStruct((GBUF_CHANNELS, padded_h, padded_w), F32),
    ]


def _raster_kernel_tilelist(count_ref, origin_ref, rec_ref, gid_ref,
                            gbuf_ref, *, frame_width, tile_h, tile_w):
    """Mask-strategy kernel: per-tile padded record block (pipelined VMEM)."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    yf, xc = _tile_coords_rw(origin_ref, ty, tx, tile_h, tile_w)
    _init_gbuf_tile(gid_ref, gbuf_ref, tile_h, tile_w)

    n = count_ref[ty * pl.num_programs(1) + tx]
    w_f = F32(frame_width)

    def chunk_body(c, _):
        base = c * CHUNK_T
        rec = rec_ref[0, 0, pl.ds(base, CHUNK_T), :]
        best = _chunk_best(rec, -base, n - base, yf, xc, w_f,
                           _ATTR_FIELDS, tile_h, tile_w)
        _merge_chunk_gbuf(best, gid_ref, gbuf_ref)
        return 0

    num_chunks = (n + CHUNK_T - 1) // CHUNK_T
    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def _mask_guard(capacity, tiles_y, tiles_x, lanes=REC_LANES):
    block_bytes = capacity * lanes * 4
    total_bytes = tiles_y * tiles_x * block_bytes
    if block_bytes > _MASK_BLOCK_VMEM_CAP or total_bytes > _MASK_TOTAL_HBM_CAP:
        raise ValueError(
            f"mask strategy would materialize {total_bytes / 2**20:.0f} MB "
            f"of per-tile records ({block_bytes / 2**20:.1f} MB per tile "
            "block); use strategy='sorted' for this triangle count"
        )


def _tile_records(edges, bins, recs=None):
    if recs is None:
        recs = pack_records(edges)  # (T, 128)
    tiles_y, tiles_x, capacity = bins.ids.shape
    safe_ids = jnp.maximum(bins.ids, 0)
    tile_recs = recs[safe_ids.reshape(-1)].reshape(
        tiles_y, tiles_x, capacity, REC_LANES
    )
    # Empty slots: zeroed records (valid=0) can never cover a pixel.
    return jnp.where((bins.ids >= 0)[..., None], tile_recs, F32(0.0))


def raster_pass(edges: EdgeTable | None, bins: TileBins, height: int,
                width: int, frame_width: int | None = None, row0=0, col0=0,
                tile_h: int = 32, recs=None):
    """Mask-strategy pass over the local tile grid.

    Returns (gid(H,W) i32 global ids (-1 = empty), gbuf(11,H,W) f32
    channel-first G-buffer: z, rgba, normal, u/z, v/z, 1/z).
    """
    if frame_width is None:
        frame_width = width
    tiles_y, tiles_x, capacity = bins.ids.shape
    assert capacity % CHUNK_T == 0
    _mask_guard(capacity, tiles_y, tiles_x)
    tile_recs = _tile_records(edges, bins, recs)

    kernel = functools.partial(
        _raster_kernel_tilelist, frame_width=frame_width, tile_h=tile_h,
        tile_w=TILE_W,
    )
    padded_h = tiles_y * tile_h
    padded_w = tiles_x * TILE_W

    # Off-TPU (CPU test backend) the kernel runs in interpreter mode.
    interpret = jax.default_backend() != "tpu"

    gid, gbuf = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts, whole array
            pl.BlockSpec(memory_space=pltpu.SMEM),  # origin [row0, col0]
            pl.BlockSpec(
                (1, 1, capacity, REC_LANES),
                lambda ty, tx: (ty, tx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=_gbuf_out_specs_2d(tile_h, TILE_W),
        out_shape=_gbuf_out_shapes(padded_h, padded_w),
    )(
        bins.counts.reshape(-1).astype(jnp.int32),
        jnp.stack(
            [jnp.asarray(row0, jnp.int32), jnp.asarray(col0, jnp.int32)]
        ),
        tile_recs,
    )

    return gid[:height, :width], gbuf[:, :height, :width]


def _raster_kernel_queue(wi_tile, starts, counts, item_start, origin,
                         rec_ref, gid_ref, gbuf_ref, *, frame_width,
                         tiles_x, tile_h, tile_w):
    """Sorted/queue-strategy kernel: 1D grid over (tile, block) work items.

    One scalar-prefetched i32 per work item (its tile); block index and
    head/tail entry bounds derive from the small per-tile arrays. Tile
    ranges are UNALIGNED in the record stream: the first/last blocks of a
    tile may carry neighboring tiles' entries, masked via (lo_rel, n_rel).
    The record BlockSpec fetches the work item's block; the output
    BlockSpecs keep the tile resident across its consecutive items. The
    first item of a tile initializes it."""
    g = pl.program_id(0)
    tile = wi_tile[g]
    ty = tile // tiles_x
    tx = tile - ty * tiles_x
    ci = g - item_start[tile]
    s = starts[tile]
    base = (s // QUEUE_BLK + ci) * QUEUE_BLK
    head = s - base  # > 0 only on the tile's first item
    n = (s + counts[tile]) - base

    @pl.when(ci == 0)
    def _():
        _init_gbuf_tile(gid_ref, gbuf_ref, tile_h, tile_w)

    yf, xc = _tile_coords_rw(origin, ty, tx, tile_h, tile_w)
    w_f = F32(frame_width)

    def sub_body(sub, _):
        rec = rec_ref[0, pl.ds(sub * CHUNK_T, CHUNK_T), :]
        best = _chunk_best(
            rec, head - sub * CHUNK_T, n - sub * CHUNK_T, yf, xc, w_f,
            _ATTR_FIELDS, tile_h, tile_w,
        )
        _merge_chunk_gbuf(best, gid_ref, gbuf_ref)
        return 0

    sub_lo = jnp.clip(jnp.maximum(head, 0) // CHUNK_T, 0,
                      QUEUE_BLK // CHUNK_T)
    sub_hi = jnp.clip(
        (n + CHUNK_T - 1) // CHUNK_T, 0, QUEUE_BLK // CHUNK_T
    )
    # Tiles with no entries in this block (n == head, e.g. every EMPTY
    # tile's single init item) must run zero chunks — the rounded-up hi
    # bound would otherwise execute one fully-masked chunk per empty tile,
    # which dominated small scenes on fine tile grids.
    sub_hi = jnp.where(n > head, sub_hi, sub_lo)
    jax.lax.fori_loop(sub_lo, sub_hi, sub_body, 0)


def _queue_stream(edges, qbins, recs, blk=QUEUE_BLK):
    """The sorted record stream: ONE row gather over the entry prefix
    (use pack_records_rowmajor as the table at large T — the gather costs
    per ROW, and its cost triples when the table layout is not row-major)."""
    if recs is None:
        recs = pack_records(edges)
    rec_stream = recs[qbins.sorted_tri]
    n_blocks = rec_stream.shape[0] // blk
    return rec_stream.reshape(n_blocks, blk, REC_LANES), n_blocks


def _queue_index_maps(tiles_x, n_blocks, blk=QUEUE_BLK):
    def rec_index(g, wi_tile, starts, counts, item_start, org,
                  _nb=n_blocks, _blk=blk):
        tile = wi_tile[g]
        b = starts[tile] // _blk + (g - item_start[tile])
        return (jnp.clip(b, 0, _nb - 1), 0, 0)

    def out_index(g, wi_tile, starts, counts, item_start, org,
                  _tx=tiles_x):
        tile = wi_tile[g]
        return (tile // _tx, tile % _tx)

    def out_index_cf(g, wi_tile, starts, counts, item_start, org,
                     _tx=tiles_x):
        tile = wi_tile[g]
        return (0, tile // _tx, tile % _tx)

    return rec_index, out_index, out_index_cf


def _queue_index_maps_split(tiles_x, n_blocks, blk, split):
    """Index maps for the split-bin shaded kernel (8 prefetch args): one
    record-stream index map per sub-bin plus the tile output map. The
    block choice mirrors _half_block_bounds' clamped ci so the fetched
    block always matches the kernel's masking arithmetic."""

    def sub_index(g, wi_tile, starts, counts, item_start, side):
        tile = wi_tile[g]
        b = split * tile + side
        s = starts[b]
        cnt = counts[b]
        end = s + cnt
        nb = jnp.where(cnt > 0, -(-end // blk) - s // blk, 0)
        ci = g - item_start[tile]
        ci_c = jnp.minimum(ci, jnp.maximum(nb - 1, 0))
        return jnp.clip(s // blk + ci_c, 0, n_blocks - 1)

    def make(side):
        def rec_index(g, wi_tile, starts, counts, item_start, lc, lm,
                      org, par, _side=side):
            return (sub_index(g, wi_tile, starts, counts, item_start,
                              _side), 0, 0)
        return rec_index

    def out_index(g, wi_tile, starts, counts, item_start, lc, lm, org,
                  par):
        tile = wi_tile[g]
        return (tile // tiles_x, tile % tiles_x)

    return [make(s) for s in range(split)], out_index


def raster_pass_queue(edges: EdgeTable, qbins: QueueBins, height: int,
                      width: int, frame_width: int | None = None,
                      row0=0, col0=0, recs=None, tile_h: int = 32):
    """Queue-strategy pass (work-item grid; no per-tile capacity)."""
    if frame_width is None:
        frame_width = width
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // TILE_W)

    rec_stream, n_blocks = _queue_stream(edges, qbins, recs)
    maxw = qbins.wi_tile.shape[0]
    origin = jnp.stack(
        [jnp.asarray(row0, jnp.int32), jnp.asarray(col0, jnp.int32)]
    )

    kernel = functools.partial(
        _raster_kernel_queue, frame_width=frame_width, tiles_x=tiles_x,
        tile_h=tile_h, tile_w=TILE_W,
    )
    # one dummy tile row absorbs padding work items
    padded_h = (tiles_y + 1) * tile_h
    padded_w = tiles_x * TILE_W
    interpret = jax.default_backend() != "tpu"

    rec_index, out_index, out_index_cf = _queue_index_maps(tiles_x, n_blocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(maxw,),
        in_specs=[
            pl.BlockSpec((1, QUEUE_BLK, REC_LANES), rec_index),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, TILE_W), out_index),
            pl.BlockSpec((GBUF_CHANNELS, tile_h, TILE_W), out_index_cf),
        ],
    )

    gid, gbuf = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=_gbuf_out_shapes(padded_h, padded_w),
    )(
        qbins.wi_tile, qbins.starts, qbins.counts, qbins.item_start,
        origin, rec_stream,
    )

    return gid[:height, :width], gbuf[:, :height, :width]


def _raster_kernel_bcast(count_ref, origin_ref, rec_ref, gid_ref,
                         gbuf_ref, *, frame_width, tile_h, tile_w):
    """Broadcast-list kernel: every tile rasterizes the SAME short record
    list (the sorted strategy's large-triangle side pass). The single record
    block has a constant index, so the pipeline keeps it resident — no
    per-tile gather, no per-tile blocks."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    yf, xc = _tile_coords_rw(origin_ref, ty, tx, tile_h, tile_w)
    _init_gbuf_tile(gid_ref, gbuf_ref, tile_h, tile_w)
    n = count_ref[0]
    w_f = F32(frame_width)

    def chunk_body(c, _):
        base = c * CHUNK_T
        rec = rec_ref[pl.ds(base, CHUNK_T), :]
        best = _chunk_best(rec, -base, n - base, yf, xc, w_f,
                           _ATTR_FIELDS, tile_h, tile_w)
        _merge_chunk_gbuf(best, gid_ref, gbuf_ref)
        return 0

    jax.lax.fori_loop(0, (n + CHUNK_T - 1) // CHUNK_T, chunk_body, 0)


def _shared_records(recs, ids):
    return jnp.where(
        (ids >= 0)[:, None], recs[jnp.maximum(ids, 0)], F32(0.0)
    )


def raster_pass_broadcast(recs, ids, count, height: int, width: int,
                          frame_width: int | None = None, row0=0, col0=0,
                          tile_h: int = 32):
    """Rasterize one shared (short) id list over every tile ->
    (gid(H,W), gbuf(11,H,W)). recs: the (T, 128) packed records (reused
    from the main pass)."""
    if frame_width is None:
        frame_width = width
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // TILE_W)
    cap = ids.shape[0]
    assert cap % CHUNK_T == 0
    shared = _shared_records(recs, ids)

    kernel = functools.partial(
        _raster_kernel_bcast, frame_width=frame_width, tile_h=tile_h,
        tile_w=TILE_W,
    )
    padded_h = tiles_y * tile_h
    padded_w = tiles_x * TILE_W
    interpret = jax.default_backend() != "tpu"

    gid, gbuf = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # origin
            pl.BlockSpec(
                (cap, REC_LANES), lambda ty, tx: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=_gbuf_out_specs_2d(tile_h, TILE_W),
        out_shape=_gbuf_out_shapes(padded_h, padded_w),
    )(
        jnp.asarray(count, jnp.int32).reshape(1),
        jnp.stack(
            [jnp.asarray(row0, jnp.int32), jnp.asarray(col0, jnp.int32)]
        ),
        shared,
    )
    return gid[:height, :width], gbuf[:, :height, :width]


# ---------------------------------------------------------------------------
# Shaded family (untextured configs): kernels emit packed ARGB directly
# ---------------------------------------------------------------------------


def _shaded_out_shapes(padded_h, padded_w):
    return [
        jax.ShapeDtypeStruct((padded_h, padded_w), F32),        # z
        jax.ShapeDtypeStruct((padded_h, padded_w), jnp.int32),   # gid
        jax.ShapeDtypeStruct((padded_h, padded_w), jnp.uint32),  # color
    ]


def _shaded_out_specs_2d(tile_h, tile_w):
    spec = pl.BlockSpec(
        (tile_h, tile_w), lambda ty, tx: (ty, tx),
        memory_space=pltpu.VMEM,
    )
    return [spec, spec, spec]


def _init_shaded_tile(z_ref, gid_ref, scr_ref, n_fields, tile_h, tile_w):
    z_ref[:] = jnp.full((tile_h, tile_w), DEPTH_CLEAR, F32)
    gid_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)
    scr_ref[:] = jnp.zeros((n_fields, tile_h, tile_w), F32)


def _raster_kernel_tilelist_shaded(count_ref, origin_ref, params_ref,
                                   rec_ref, *rest, frame_width, fields,
                                   objspecs, n_lights, tile_h, tile_w):
    if any(o.tex is not None for o in objspecs):
        tex_ref, z_ref, gid_ref, color_ref, scr_ref = rest
    else:
        tex_ref = None
        z_ref, gid_ref, color_ref, scr_ref = rest
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    yf, xc = _tile_coords_rw(origin_ref, ty, tx, tile_h, tile_w)
    _init_shaded_tile(z_ref, gid_ref, scr_ref, len(fields), tile_h, tile_w)

    n = count_ref[ty * pl.num_programs(1) + tx]
    w_f = F32(frame_width)

    def chunk_body(c, _):
        base = c * CHUNK_T
        rec = rec_ref[0, 0, pl.ds(base, CHUNK_T), :]
        best = _chunk_best(rec, -base, n - base, yf, xc, w_f, fields,
                           tile_h, tile_w)
        _merge_chunk_shaded(best, z_ref, gid_ref, scr_ref)
        return 0

    jax.lax.fori_loop(0, (n + CHUNK_T - 1) // CHUNK_T, chunk_body, 0)
    _write_tile_color(color_ref, z_ref, gid_ref, scr_ref, origin_ref, ty,
                      tx, params_ref, objspecs, n_lights, tile_h, tile_w,
                      tex_ref)


def _spanex_block_zmax(spanex_refs, tile_h):
    """Conservative max interpolated z over every entry of a work item's
    span-expanded record block(s) (ZCULL_BLOCKS).

    z is linear in the pixel index k and f32 rounding is monotone, so
    each (entry, row) span's z extrema lie at its endpoints mlo/mhi —
    evaluated here with the fold's own formula (z = zl + k * zinc,
    k = xoff + (xc - minx)). Rows with no span (and boundary-block
    entries outside the tile's range) carry mhi = -BIG from stage A and
    are masked out."""
    th = tile_h
    zm = None
    for r in spanex_refs:
        q = lambda i: r[:, i * th:(i + 1) * th]  # (E, th)
        minx, mlo, mhi, xoff, zl, zinc = (q(i) for i in range(SPANEX_QBASE))
        z_lo = zl + (xoff + (mlo - minx)) * zinc
        z_hi = zl + (xoff + (mhi - minx)) * zinc
        ok = mhi > F32(-_BIG) * F32(0.5)
        z = jnp.where(ok, jnp.maximum(z_lo, z_hi), F32(-_BIG))
        zm = z if zm is None else jnp.maximum(zm, z)
    return jnp.max(zm)


def _half_block_bounds(starts, counts, bin_idx, ci, blk):
    """Dual-bin helper: (block-local ent_lo, ent_hi, has-entries) of one
    bin half's ``ci``-th record block, with ci clamped into the half's
    block range (exhausted halves mask every entry)."""
    s = starts[bin_idx]
    cnt = counts[bin_idx]
    end = s + cnt
    nb = jnp.where(cnt > 0, -(-end // blk) - s // blk, 0)
    ci_c = jnp.minimum(ci, jnp.maximum(nb - 1, 0))
    base = (s // blk + ci_c) * blk
    head = s - base
    n = end - base
    valid = (ci < nb) & (cnt > 0)
    ent_lo = jnp.where(valid, head, 0)
    ent_hi = jnp.where(valid, n, 0)
    return ent_lo, ent_hi, valid


def _raster_kernel_queue_shaded(wi_tile, starts, counts, item_ext, lcounts,
                                lmeta, origin, params, rec_ref,
                                *rest, frame_width, fields, objspecs,
                                n_lights, tiles_x, tile_h, tile_w,
                                blk=QUEUE_BLK, wide=False, split=1,
                                rows_packed=1, zcull=None):
    """Shaded queue kernel. ``item_ext`` has ntiles+2 entries (last = maxw)
    so the dummy tail tile's item count is well-defined; the attribute
    scratch persists across a tile's consecutive work items (TPU grid steps
    run sequentially on one core) and the tile's LAST item shades it.

    ``wide`` (dense fine-tile grids): each work item first runs the wide
    stage A over its whole record block (_stage_a_fill into the span
    scratch, entries on lanes), then the chunk loop does per-pixel work
    only (_chunk_best_spanex). The narrow form (sparse 32-row grids, where
    most work items see a handful of entries and a full-block stage A
    would be waste) interleaves span setup per 8-entry chunk
    (_chunk_best).

    ``split`` > 1 (wide only): entries are binned at sub-tile column
    granularity (bin_triangles_queue col_split; tile_w/split columns per
    bin), each work item streams one record block from each sub-bin
    (rec_ref = leftmost, the extra refs follow left-to-right), and the
    chunk fold packs one entry of each sub-bin per slot — every (R, W)
    fragment op serves ``split`` entries, dividing stage-B cost for tiny
    triangles. starts/counts are indexed at split*tile + s.

    Large triangles (spanning more tiles than the entry expansion) live in
    the compact ``lrec_ref`` side list, resident in VMEM for the whole
    launch (one DMA — a per-tile pipelined stream measured ~2x the whole
    frame in extra DMA stalls, and per-tile dynamic row assembly ~1 us per
    row read, both worse than just walking the list). The tile's last item
    folds the whole list with the gid-aware merge before finalize, ONLY on
    tiles whose bbox count (``lcounts``, prefetched) is nonzero; ``lmeta``
    = [live length]. The earlier broadcast side pass rasterized the list
    over every tile in a second kernel and re-ran finalize (two
    full-frame shades)."""
    assert split == 1 or rows_packed == 1, "col/row packing are exclusive"
    assert rows_packed in (1, 2, 4), rows_packed
    streams = max(split, rows_packed)
    if streams > 1:
        assert wide, "split/row binning requires the wide stage-A path"
        rec_refs = [rec_ref] + list(rest[:streams - 1])
        lrec_ref = rest[streams - 1]
        rest = rest[streams:]
    else:
        rec_refs = [rec_ref]
        lrec_ref, rest = rest[0], rest[1:]
    if wide:
        spanex_refs = list(rest[-split:])
        rest = rest[:-split]
        spanex_ref = spanex_refs[0]
    if any(o.tex is not None for o in objspecs):
        tex_ref, z_ref, gid_ref, color_ref, scr_ref = rest
    else:
        tex_ref = None
        z_ref, gid_ref, color_ref, scr_ref = rest
    ct = WIDE_CHUNK_T if wide else CHUNK_T
    g = pl.program_id(0)
    tile = wi_tile[g]
    ty = tile // tiles_x
    tx = tile - ty * tiles_x
    ci = g - item_ext[tile]
    if streams == 1:
        s = starts[tile]
        base = (s // blk + ci) * blk
        head = s - base
        n = (s + counts[tile]) - base

    @pl.when(ci == 0)
    def _():
        _init_shaded_tile(z_ref, gid_ref, scr_ref, len(fields), tile_h,
                          tile_w)

    yf, xc = _tile_coords_rw(origin, ty, tx, tile_h, tile_w)
    w_f = F32(frame_width)

    def chunk_span(ent_lo, ent_hi, has):
        lo = jnp.clip(jnp.maximum(ent_lo, 0) // ct, 0, blk // ct)
        hi = jnp.clip((ent_hi + ct - 1) // ct, 0, blk // ct)
        # Blocks with no entries for this tile (e.g. every EMPTY tile's
        # single init item) must run zero chunks — the rounded-up hi
        # bound would otherwise execute one fully-masked chunk per empty
        # tile, which dominated small scenes on fine tile grids.
        return jnp.where(has, lo, blk // ct), jnp.where(has, hi, 0)

    if split > 1:
        bounds = [
            _half_block_bounds(starts, counts, split * tile + s_, ci, blk)
            for s_ in range(split)
        ]
        has = [v & (hi > lo) for (lo, hi, v) in bounds]
        any_has = functools.reduce(jnp.logical_or, has)
        sub_w = tile_w // split
        x0 = (origin[1] + tx * tile_w).astype(F32)

        @pl.when(any_has)
        def _():
            yf_col = (
                origin[0] + ty * tile_h
                + jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0)
            ).astype(F32)
            for s_ in range(split):
                lo_s, hi_s, _v = bounds[s_]
                _stage_a_fill(spanex_refs[s_],
                              jnp.transpose(rec_refs[s_][0]), yf_col,
                              lo_s, hi_s, w_f, fields, tile_h,
                              x0 + F32(s_ * sub_w),
                              x0 + F32((s_ + 1) * sub_w - 1))

        def sub_body(sub, _):
            chunk = [r[pl.ds(sub * ct, ct), :]
                     for r in spanex_refs]
            best = _chunk_best_spanex_split(chunk, xc, sub_w,
                                            len(fields), tile_h, tile_w)
            _merge_chunk_shaded(best, z_ref, gid_ref, scr_ref)
            return 0

        spans = [chunk_span(lo, hi, h)
                 for (lo, hi, _v), h in zip(bounds, has)]
        sub_lo = functools.reduce(jnp.minimum, [s_[0] for s_ in spans])
        sub_hi = functools.reduce(jnp.maximum, [s_[1] for s_ in spans])
    elif rows_packed > 1:
        # Row packing: entries are binned to (tile_h/rows_packed)-row
        # strips; one grid step streams one record block per strip and
        # stage A writes BOTH into one span scratch — strip 0's entries
        # on sublanes [0, tile_h/2), strip 1's on [tile_h/2, tile_h) —
        # so every stage-B fragment op serves rows_packed entries with
        # no merge step (the strips are disjoint row sets). Chunk order
        # is stream order per strip, so winners/ties match the unpacked
        # fold bit-exactly.
        bounds = [
            _half_block_bounds(starts, counts, rows_packed * tile + h_,
                               ci, blk)
            for h_ in range(rows_packed)
        ]
        has = [v & (hi > lo) for (lo, hi, v) in bounds]
        any_has = functools.reduce(jnp.logical_or, has)

        @pl.when(any_has)
        def _():
            yf_col = (
                origin[0] + ty * tile_h
                + jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0)
            ).astype(F32)
            _stage_a_fill(
                spanex_ref, jnp.transpose(rec_refs[0][0]), yf_col,
                bounds[0][0], bounds[0][1], w_f, fields, tile_h,
                rt_strips=[jnp.transpose(r[0]) for r in rec_refs[1:]],
                ent_strips=[(lo, hi) for (lo, hi, _v) in bounds[1:]],
            )

        def sub_body(sub, _):
            rec = spanex_ref[pl.ds(sub * ct, ct), :]
            best = _chunk_best_spanex(rec, xc, len(fields), tile_h,
                                      tile_w)
            _merge_chunk_shaded(best, z_ref, gid_ref, scr_ref)
            return 0

        spans = [chunk_span(lo, hi, h)
                 for (lo, hi, _v), h in zip(bounds, has)]
        sub_lo = functools.reduce(jnp.minimum, [s_[0] for s_ in spans])
        sub_hi = functools.reduce(jnp.maximum, [s_[1] for s_ in spans])
    elif wide:
        @pl.when(n > head)
        def _():
            rt = jnp.transpose(rec_ref[0])  # (REC_LANES, blk)
            yf_col = (
                origin[0] + ty * tile_h
                + jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0)
            ).astype(F32)
            _stage_a_fill(spanex_ref, rt, yf_col, head, n, w_f, fields,
                          tile_h)

        def sub_body(sub, _):
            rec = spanex_ref[pl.ds(sub * ct, ct), :]
            best = _chunk_best_spanex(rec, xc, len(fields), tile_h,
                                      tile_w)
            _merge_chunk_shaded(best, z_ref, gid_ref, scr_ref)
            return 0
    else:
        def sub_body(sub, _):
            rec = rec_ref[0, pl.ds(sub * CHUNK_T, CHUNK_T), :]
            best = _chunk_best(
                rec, head - sub * CHUNK_T, n - sub * CHUNK_T, yf, xc,
                w_f, fields, tile_h, tile_w,
            )
            _merge_chunk_shaded(best, z_ref, gid_ref, scr_ref)
            return 0

    if streams == 1:
        sub_lo, sub_hi = chunk_span(head, n, n > head)
    if zcull is None:
        zcull = ZCULL_BLOCKS
    if zcull and wide:
        # Occlusion block-skip (flag comment above): zero the chunk loop
        # when even the block's closest fragment cannot strictly beat the
        # tile's farthest already-won pixel. The relative margin forfeits
        # skips near 1-ulp boundaries, never wrongly takes one.
        tile_minz = jnp.min(z_ref[:])
        zmax = _spanex_block_zmax(spanex_refs, tile_h)
        cannot_win = (zmax + jnp.abs(zmax) * F32(1e-6)) < tile_minz
        sub_hi = jnp.where(cannot_win, sub_lo, sub_hi)
    jax.lax.fori_loop(sub_lo, sub_hi, sub_body, 0)

    nwi = item_ext[tile + 1] - item_ext[tile]

    @pl.when(ci == nwi - 1)
    def _():
        @pl.when(lcounts[tile] > 0)
        def _():
            nl = lmeta[0]

            def lbody(c, _):
                lbase = c * CHUNK_T
                rec = lrec_ref[pl.ds(lbase, CHUNK_T), :]
                best = _chunk_best(rec, -lbase, nl - lbase, yf, xc, w_f,
                                   fields, tile_h, tile_w)
                _merge_chunk_shaded_bygid(best, z_ref, gid_ref, scr_ref)
                return 0

            jax.lax.fori_loop(0, (nl + CHUNK_T - 1) // CHUNK_T, lbody, 0)

        _write_tile_color(color_ref, z_ref, gid_ref, scr_ref, origin, ty,
                          tx, params, objspecs, n_lights, tile_h, tile_w,
                          tex_ref)


def rasterize_pallas_shaded(
    edges: EdgeTable,
    transform: ProjectiveTransform,
    lights: LightData,
    phong: bool,
    height: int,
    width: int,
    capacity: int | None = None,
    frame_height: int | None = None,
    frame_width: int | None = None,
    row0=0,
    col0=0,
    strategy: str = "auto",
    tile_h: int | None = None,
    texture=None,
    filter_mode: str = "nearest",
    budget_override=None,
    zcull: bool | None = None,
):
    """Single-object fused fast path (see rasterize_scene_shaded).

    ``texture`` (u32 ARGB, 'scalar' uv addressing only — the caller gates
    'avx' uv-masking to the deferred path) enables in-kernel MXU texture
    sampling (nearest or bilinear per ``filter_mode``); it must satisfy
    the MAX_FUSED_TEX_* limits."""
    if texture is not None:
        th, tw = int(texture.shape[0]), int(texture.shape[1])
        atlas, _ = pack_texture_atlas([texture])
        tex = (0, th, tw) + (
            ("bilinear",) if filter_mode == "bilinear" else ()
        )
    else:
        atlas, tex = None, None
    from .setup_pallas import SetupOut

    if isinstance(edges, (EdgeTable, SetupOut)):
        T = edges.num_triangles
    else:
        T = int(edges.shape[1])
    objspecs = (ObjSpec(0, T, bool(phong), tex),)
    return rasterize_scene_shaded(
        edges, objspecs, transform, lights, height, width, capacity,
        frame_height, frame_width, row0, col0, strategy, tile_h, atlas,
        budget_override, zcull,
    )


def rasterize_scene_shaded(
    edges: EdgeTable,
    objspecs: tuple,
    transform: ProjectiveTransform,
    lights: LightData,
    height: int,
    width: int,
    capacity: int | None = None,
    frame_height: int | None = None,
    frame_width: int | None = None,
    row0=0,
    col0=0,
    strategy: str = "auto",
    tile_h: int | None = None,
    atlas=None,
    budget_override=None,
    zcull: bool | None = None,
):
    """Fully-fused fast path: raster + interpolate + shade + ARGB pack in
    one kernel -> (covered, z(H,W), color_u32(H,W), stats). The G-buffer
    never exists in HBM.

    ``edges`` is the scene's concatenated EdgeTable
    (geometry.vertex.concat_edge_tables), the channel-major RECORD TABLE
    (85+, Tp) from geometry.vertex.setup_records (padded rows are zero =
    never visible; gid lanes are already global), or — the fastest path —
    a SetupOut from ops.setup_pallas.setup_for_raster, whose row-major
    table and bboxes were written directly by the fused setup kernel.
    ``objspecs`` is a static tuple of ObjSpec — a MULTI-OBJECT scene renders
    in one kernel launch (one fixed pallas dispatch per frame instead of one
    per object; the reference paid one work-queue drain per model,
    projekt.cpp:3873-3878). ``atlas`` is the packed scene texture atlas
    (pack_texture_atlas) when any object is textured; it must satisfy the
    MAX_FUSED_TEX_* limits atlas-wide."""
    from .setup_pallas import SetupOut

    pre = None
    if isinstance(edges, SetupOut):
        pre = edges
        edges = rec_t = None
        T = int(pre.recs.shape[0])
        assert objspecs[-1].gid_hi <= T, "objspecs beyond the record table"
    elif isinstance(edges, EdgeTable):
        rec_t = None
        T = edges.num_triangles
        assert objspecs[-1].gid_hi == T, "objspecs must cover the edge table"
    else:
        rec_t = edges
        edges = None
        T = int(rec_t.shape[1])
        assert objspecs[-1].gid_hi <= T, "objspecs beyond the record table"
    # The f32 gid lane is exact only up to 2**24; beyond it, gid-range
    # object selection and depth-tie breaks would corrupt silently.
    assert T <= MAX_SCENE_TRIANGLES, (
        f"scene has {T} triangles; the f32 gid lane is exact only to "
        f"{MAX_SCENE_TRIANGLES} — split the scene across draws"
    )
    t_policy = pre.num_triangles if pre is not None else T
    if frame_height is None:
        frame_height = height
    if frame_width is None:
        frame_width = width
    if strategy == "auto":
        strategy = "sorted" if t_policy > AUTO_SORTED_THRESHOLD else "mask"
    if tile_h is None:
        tile_h = _pick_tile_h(t_policy, frame_height, frame_width)

    fields, _, _, _ = _scene_fields(objspecs)
    if atlas is not None:
        ah, aw = _atlas_dims(objspecs)
        assert (
            max(ah, aw) <= MAX_FUSED_TEX_DIM
            and ah * aw <= MAX_FUSED_TEX_PIXELS
        ), "texture atlas too large for the fused path"
        tex_packed = atlas
    else:
        assert all(o.tex is None for o in objspecs)
        tex_packed = None
    n_lights = lights.count
    params = shade_params(transform, lights)
    origin = jnp.stack(
        [jnp.asarray(row0, jnp.int32), jnp.asarray(col0, jnp.int32)]
    )
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // TILE_W)
    interpret = jax.default_backend() != "tpu"
    scratch = [pltpu.VMEM((len(fields), tile_h, TILE_W), F32)]

    if pre is not None:
        bbox = pre.bbox
    else:
        bbox = (
            triangle_bbox_rows(rec_t, frame_height, frame_width)
            if rec_t is not None else None
        )
    if strategy == "mask":
        if capacity is None:
            capacity = min(max(CHUNK_T, -(-T // CHUNK_T) * CHUNK_T), 4096)
        _mask_guard(capacity, tiles_y, tiles_x)
        bins = bin_triangles(
            edges, height, width, tile_h, TILE_W, capacity,
            frame_height, frame_width, row0, col0, bbox=bbox,
        )
        tile_recs = _tile_records(
            edges, bins,
            recs=(pre.recs if pre is not None
                  else finish_records(rec_t) if rec_t is not None
                  else None),
        )
        kernel = functools.partial(
            _raster_kernel_tilelist_shaded, frame_width=frame_width,
            fields=fields, objspecs=objspecs, n_lights=n_lights,
            tile_h=tile_h, tile_w=TILE_W,
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # origin
            pl.BlockSpec(memory_space=pltpu.SMEM),  # shade params
            pl.BlockSpec(
                (1, 1, capacity, REC_LANES),
                lambda ty, tx: (ty, tx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands = [
            bins.counts.reshape(-1).astype(jnp.int32), origin, params,
            tile_recs,
        ]
        if tex_packed is not None:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(tex_packed)
        z, gid, color = pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(tiles_y, tiles_x),
            in_specs=in_specs,
            out_specs=_shaded_out_specs_2d(tile_h, TILE_W),
            out_shape=_shaded_out_shapes(
                tiles_y * tile_h, tiles_x * TILE_W
            ),
            scratch_shapes=scratch,
        )(*operands)
        z = z[:height, :width]
        gid = gid[:height, :width]
        color = color[:height, :width]
        stats = {"bins_dropped": bins.n_dropped}
    elif strategy == "sorted":
        # Row-major table: the fused setup kernel wrote it directly
        # (SetupOut); from the channel-major record table it is ONE
        # trivial pallas transpose (the field math fused into the table
        # write upstream); the EdgeTable compat path re-assembles columns.
        if pre is not None:
            recs = pre.recs
        elif rec_t is not None:
            recs = finish_records(rec_t)
        else:
            recs = (
                pack_records_rowmajor(edges) if T > 65536
                else pack_records(edges)
            )
        ov = (budget_override if budget_override is not None
              else BUDGET_FACTOR_OVERRIDE)
        expansion, budget_factor = _queue_expansion(tile_h, t_policy, ov)
        bf_policy = budget_factor  # pre-stream-frac: what OVERRIDE replaces
        # Dense fine-tile grids run the wide (full-lane-width) in-kernel
        # stage A over WIDE_BLK-entry blocks; sparse 32-row grids keep
        # narrow 64-entry blocks with per-chunk span setup (most of their
        # work items hold only a few real entries). Wide grids also bin
        # at sub-tile column granularity (PACK_SPLIT bins per tile) and
        # fold one entry of each sub-bin per chunk slot (split packing —
        # tiny triangles cover a few pixels, so every (8, 128) fragment
        # op serving PACK_SPLIT entries divides stage-B cost; the bins
        # are spatially disjoint so winners/ties/values are
        # bit-identical).
        wide = tile_h <= 8
        assert PACK_SPLIT in (1, 2, 4, 8, 16), PACK_SPLIT
        assert PACK_ROWS in (1, 2, 4), PACK_ROWS
        split = PACK_SPLIT if wide else 1
        rows = (
            PACK_ROWS
            if (
                wide and split == 1
                and t_policy * PACK_ROWS_MAX_PX_PER_TRI
                >= frame_height * frame_width
            )
            else 1
        )
        if rows > 1:
            if ov is not None:
                # Escape-hatch semantics unchanged: the override is the
                # pre-frac factor, scaled by the flat per-stream FRAC.
                # CAVEAT (rows == 4, non-default): halving strip_h
                # (4 -> 2 rows) inflates strip-straddle entries, so
                # 4-stream parities carry MORE than 1/2 of a 2-stream
                # parity's load — drops stay counted; A/B the realized
                # demand (stats 'bins_budget_utilization') before
                # shipping rows=4.
                budget_factor = budget_factor * PACK_ROWS_STREAM_FRAC * (
                    2.0 / rows
                )
            elif len(objspecs) > 1:
                # Multi-object scenes keep the FLAT per-stream budget:
                # the density key frame_px / T ignores inter-object
                # overdraw, so stacked objects (each triangle covering
                # real pixels behind another object) would read as
                # "sub-pixel-dense" and get a budget below their true
                # demand (advisor r4). Flat = the pre-round-4 default,
                # drop-free on every probed scene class.
                budget_factor = (1.2 * PACK_ROWS_STREAM_FRAC) * (
                    2.0 / rows
                )
            else:
                # Density-aware default (see _rows_stream_budget_factor:
                # ~2x measured per-stream demand at the scene's px/tri,
                # never looser than the old flat budget). CAVEAT: a
                # single OBJECT with stacked layers (depth-complex
                # geometry) can exceed it the same way — drops are
                # counted, never silent, and Renderer.calibrate() /
                # budget_override are the product escape hatches.
                budget_factor = _rows_stream_budget_factor(
                    t_policy, frame_height, frame_width
                ) * (2.0 / rows)
        streams = max(split, rows)
        blk = WIDE_BLK if wide else QUEUE_BLK
        qbins = bin_triangles_queue(
            edges, height,
            tiles_x * TILE_W if split > 1 else width,
            tile_h, TILE_W // split, blk,
            expansion=expansion, budget_factor=budget_factor,
            frame_height=frame_height, frame_width=frame_width,
            row0=row0, col0=col0, bbox=bbox, col_split=split,
            row_split=rows, visit_empty=VISIT_EMPTY_TILES,
        )
        rec_stream, n_blocks = _queue_stream(edges, qbins, recs, blk)
        maxw = qbins.wi_tile.shape[0]
        ntiles = tiles_y * tiles_x
        item_ext = jnp.concatenate(
            [qbins.item_start, jnp.full((1,), maxw, jnp.int32)]
        )

        # Large triangles: the compact side list rides along resident in
        # VMEM; per-tile bbox counts gate the in-kernel walk so only tiles
        # a large triangle touches pay for it. Count construction is
        # skipped at runtime when nothing overflowed the entry expansion.
        lcounts = jax.lax.cond(
            qbins.n_large > 0,
            lambda: count_subset_per_tile(
                qbins.large_ids, edges, height, width, tile_h, TILE_W,
                frame_height, frame_width, row0, col0, bbox=bbox,
            ),
            lambda: jnp.zeros((ntiles,), jnp.int32),
        )
        lcounts_ext = jnp.concatenate(
            [lcounts, jnp.zeros((1,), jnp.int32)]
        )
        lmeta = jnp.asarray(qbins.n_large, jnp.int32).reshape(1)
        lshared = _shared_records(recs, qbins.large_ids)

        kernel = functools.partial(
            _raster_kernel_queue_shaded, frame_width=frame_width,
            fields=fields, objspecs=objspecs, n_lights=n_lights,
            tiles_x=tiles_x, tile_h=tile_h, tile_w=TILE_W, blk=blk,
            wide=wide, split=split, rows_packed=rows, zcull=zcull,
        )
        if streams > 1:
            rec_indexes, out_index8 = _queue_index_maps_split(
                tiles_x, n_blocks, blk, streams
            )
            in_specs = [
                pl.BlockSpec((1, blk, REC_LANES), ri) for ri in rec_indexes
            ] + [
                pl.BlockSpec(memory_space=pltpu.VMEM),  # side list
            ]
            operands = [rec_stream] * streams + [lshared]
        else:
            rec_index, out_index, _ = _queue_index_maps(tiles_x, n_blocks,
                                                        blk)

            def rec_index8(g, wi, st, cn, it, lc, lm, org, par,
                           _f=rec_index):
                return _f(g, wi, st, cn, it, org)

            def out_index8(g, wi, st, cn, it, lc, lm, org, par,
                           _f=out_index):
                return _f(g, wi, st, cn, it, org)

            in_specs = [
                pl.BlockSpec((1, blk, REC_LANES), rec_index8),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # side list
            ]
            operands = [rec_stream, lshared]
        if tex_packed is not None:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(tex_packed)
        queue_scratch = list(scratch)
        if wide:
            _, _, span_lanes = _spanex_layout(len(fields), tile_h)
            for _ in range(split):
                queue_scratch.append(pltpu.VMEM((blk, span_lanes), F32))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=(maxw,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((tile_h, TILE_W), out_index8),
                pl.BlockSpec((tile_h, TILE_W), out_index8),
                pl.BlockSpec((tile_h, TILE_W), out_index8),
            ],
            scratch_shapes=queue_scratch,
        )
        z, gid, color = pl.pallas_call(
            kernel,
            interpret=interpret,
            grid_spec=grid_spec,
            out_shape=_shaded_out_shapes(
                (tiles_y + 1) * tile_h, tiles_x * TILE_W
            ),
        )(
            qbins.wi_tile, qbins.starts, qbins.counts, item_ext,
            lcounts_ext, lmeta, origin, params, *operands,
        )
        # Entry-less tiles got NO grid step (visit_empty=False above), so
        # their output blocks are uninitialized memory; mask them back to
        # the clear values the every-tile kernel used to write. A tile is
        # covered iff any of its (col_split) bins kept entries; a
        # non-empty large side list re-enables every-tile visits inside
        # bin_triangles_queue, so the mask must go all-true with it.
        nbins = ntiles * streams
        tile_cov = (
            qbins.counts[:nbins].reshape(ntiles, streams).sum(axis=1) > 0
        ) | (qbins.n_large > 0)
        covm = jnp.broadcast_to(
            tile_cov.reshape(tiles_y, 1, tiles_x, 1),
            (tiles_y, tile_h, tiles_x, TILE_W),
        ).reshape(tiles_y * tile_h, tiles_x * TILE_W)[:height, :width]
        z = jnp.where(covm, z[:height, :width], DEPTH_CLEAR)
        gid = jnp.where(covm, gid[:height, :width], jnp.int32(-1))
        color = jnp.where(covm, color[:height, :width], jnp.uint32(0))
        stats = {
            "bins_dropped": qbins.n_dropped,
            "bins_real_entries": qbins.n_real,
            "bins_budget_utilization": qbins.budget_util,
            "bins_budget_factor": bf_policy,
        }
    else:
        raise ValueError(f"unknown strategy: {strategy}")

    return gid >= 0, z, color, stats


# ---------------------------------------------------------------------------
# G-buffer entry point (textured configs + the raw-G-buffer API)
# ---------------------------------------------------------------------------


def rasterize_pallas(
    edges: EdgeTable,
    height: int,
    width: int,
    capacity: int | None = None,
    frame_height: int | None = None,
    frame_width: int | None = None,
    row0=0,
    col0=0,
    strategy: str = "auto",
    tile_h: int | None = None,
    budget_override=None,
):
    """Full fast-path rasterization -> (covered, gbuf, stats), same
    channel-first G-buffer API as ops.raster_reference.rasterize_reference:
    gbuf is (11, H, W) [z, rgba, normal xyz, u/z, v/z, 1/z].

    strategy: 'mask' (small scenes), 'sorted' (scales to millions of
    triangles), or 'auto'. ``capacity`` only applies to the mask strategy;
    (row0, col0)/(frame_height, frame_width) support rendering a local
    sub-rect of a larger frame (mesh sharding). ``edges`` may be a
    channel-major record table (85+, Tp) instead of an EdgeTable, exactly
    as in rasterize_scene_shaded.
    """
    from .setup_pallas import SetupOut

    pre = None
    if isinstance(edges, SetupOut):
        pre = edges
        edges = rec_t = None
        T = int(pre.recs.shape[0])
    elif isinstance(edges, EdgeTable):
        rec_t = None
        T = edges.num_triangles
    else:
        rec_t, edges = edges, None
        T = int(rec_t.shape[1])
    t_policy = pre.num_triangles if pre is not None else T
    if frame_height is None:
        frame_height = height
    if frame_width is None:
        frame_width = width
    if strategy == "auto":
        strategy = "sorted" if t_policy > AUTO_SORTED_THRESHOLD else "mask"
    if tile_h is None:
        tile_h = _pick_tile_h(t_policy, frame_height, frame_width)
    if pre is not None:
        bbox = pre.bbox
    else:
        bbox = (
            triangle_bbox_rows(rec_t, frame_height, frame_width)
            if rec_t is not None else None
        )

    if strategy == "mask":
        if capacity is None:
            # Per-tile list capacity: all triangles for small scenes, else a
            # cap that keeps the kernel's record block inside VMEM. Drops are
            # counted in stats — raise `capacity` if nonzero.
            capacity = min(max(CHUNK_T, -(-T // CHUNK_T) * CHUNK_T), 4096)
        bins = bin_triangles(
            edges, height, width, tile_h, TILE_W, capacity,
            frame_height, frame_width, row0, col0, bbox=bbox,
        )
        gid, gbuf = raster_pass(
            edges, bins, height, width, frame_width, row0, col0, tile_h,
            recs=(pre.recs if pre is not None
                  else finish_records(rec_t) if rec_t is not None
                  else None),
        )
        stats = {"bins_dropped": bins.n_dropped}
    elif strategy == "sorted":
        recs = (
            pre.recs if pre is not None
            else finish_records(rec_t) if rec_t is not None
            else pack_records(edges)
        )
        expansion, budget_factor = _queue_expansion(
            tile_h, t_policy, budget_override
        )
        qbins = bin_triangles_queue(
            edges, height, width, tile_h, TILE_W, QUEUE_BLK,
            expansion=expansion, budget_factor=budget_factor,
            frame_height=frame_height, frame_width=frame_width,
            row0=row0, col0=col0, bbox=bbox,
        )
        gid, gbuf = raster_pass_queue(
            edges, qbins, height, width, frame_width, row0, col0,
            recs=recs, tile_h=tile_h,
        )

        # Side pass for triangles too large for the expansion: every tile
        # sees the (short, fixed-capacity) large list via one shared,
        # pipeline-resident record block. Skipped at runtime when the list
        # is empty (the common case — one branch of the cond executes).
        def with_large(args):
            side = raster_pass_broadcast(
                recs, qbins.large_ids, qbins.n_large, height, width,
                frame_width, row0, col0, tile_h,
            )
            return _merge_gbuf_by_gid(args, side)

        gid, gbuf = jax.lax.cond(
            qbins.n_large > 0, with_large, lambda args: args, (gid, gbuf)
        )
        stats = {
            "bins_dropped": qbins.n_dropped,
            "bins_real_entries": qbins.n_real,
            "bins_budget_utilization": qbins.budget_util,
            "bins_budget_factor": budget_factor,
        }
    else:
        raise ValueError(f"unknown strategy: {strategy}")

    return gid >= 0, gbuf, stats


def _merge_by_gid(z_a, gid_a, z_b, gid_b):
    """Combine two visibility buffers preserving submission-order ties:
    larger z wins; on equal z the smaller global triangle id (earlier
    submission) wins."""
    cov_b = gid_b >= 0
    win_b = cov_b & (
        (z_b > z_a)
        | ((z_b == z_a) & ((gid_a < 0) | (gid_b < gid_a)))
    )
    return (
        jnp.where(win_b, z_b, z_a),
        jnp.where(win_b, gid_b, gid_a),
    )


def _merge_gbuf_by_gid(a, b):
    """(gid, gbuf) pair merge with the submission-order tie rule (z is
    G-buffer channel 0)."""
    gid_a, gbuf_a = a
    gid_b, gbuf_b = b
    z_a, z_b = gbuf_a[0], gbuf_b[0]
    cov_b = gid_b >= 0
    win_b = cov_b & (
        (z_b > z_a)
        | ((z_b == z_a) & ((gid_a < 0) | (gid_b < gid_a)))
    )
    return (
        jnp.where(win_b, gid_b, gid_a),
        jnp.where(win_b[None], gbuf_b, gbuf_a),
    )
