"""Pure-JAX rasterizer: scan over triangles, full-frame span evaluation.

This is the correctness reference for the Pallas tile kernel — same API, same
``ops.spans`` math, no tiling/binning. It reproduces the reference's
sequential submission-order depth composition exactly: triangles merge into
the frame one at a time with the strict-greater z test (projekt.cpp:495), so
the first writer wins depth ties, exactly like the CPU renderer's in-order
span fills.

O(T * H * W) — use for tests and small scenes; the production path is
ops.raster_pallas (tile-binned).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import DEPTH_CLEAR
from ..geometry.vertex import EdgeTable
from .spans import SpanBlock, TriangleSlice, span_block

F32 = jnp.float32

# G-buffer: CHANNEL-FIRST (11, H, W) — z, rgba, normal xyz, u/z, v/z, 1/z.
# Channel-first keeps every per-channel op a contiguous (H, W) plane on the
# TPU (the Pallas kernel writes this layout directly; channels-last forced
# an 88 MB relayout per 1080p frame).
GBUF_CHANNELS = 11


def empty_gbuffer(height: int, width: int):
    covered = jnp.zeros((height, width), bool)
    gbuf = jnp.zeros((GBUF_CHANNELS, height, width), F32)
    gbuf = gbuf.at[0].set(DEPTH_CLEAR)
    return covered, gbuf


def merge_fragments(covered, gbuf, frag: SpanBlock):
    """Depth-test a fragment block into the G-buffer (larger z wins, strict >
    so earlier writers keep ties)."""
    win = frag.mask & (frag.z > gbuf[0])
    frag_cf = jnp.concatenate(
        [
            frag.z[None],
            jnp.moveaxis(frag.col, -1, 0),
            jnp.moveaxis(frag.n, -1, 0),
            frag.u[None],
            frag.v[None],
            frag.oz[None],
        ]
    )
    gbuf = jnp.where(win[None], frag_cf, gbuf)
    return covered | win, gbuf


def rasterize_reference(
    edges: EdgeTable,
    height: int,
    width: int,
    frame_width: int | None = None,
    row0=0,
    col0=0,
):
    """Rasterize all triangles into a fresh (covered, gbuf).

    (height, width) is the local extent; (row0, col0) its origin in the
    global frame (traced — devices under shard_map pass their offsets);
    frame_width is the GLOBAL width the reference clamps spans against
    (projekt.cpp:381-400). Single-chip callers leave the defaults.
    """
    if frame_width is None:
        frame_width = width
    rows = jnp.arange(height, dtype=F32) + jnp.asarray(row0, F32)
    cols = jnp.arange(width, dtype=F32) + jnp.asarray(col0, F32)

    def step(carry, tri_fields):
        covered, gbuf = carry
        tri = TriangleSlice(*tri_fields)
        frag = span_block(tri, rows, cols, frame_width)
        return merge_fragments(covered, gbuf, frag), None

    init = empty_gbuffer(height, width)
    (covered, gbuf), _ = jax.lax.scan(step, init, tuple(edges))
    return covered, gbuf
