"""Tracing / profiling utilities (SURVEY.md §5.1 — absent in the reference;
first-class here).

- FrameTimer: wall-clock frame statistics with device synchronization.
- trace(): context manager around jax.profiler for TensorBoard-compatible
  device traces of the render pipeline.
- annotate(): named trace spans visible in the profile.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List

import jax


@dataclass
class FrameTimer:
    """Rolling frame statistics. ``tick`` around each frame render."""

    samples: List[float] = field(default_factory=list)
    max_samples: int = 240

    @contextlib.contextmanager
    def tick(self, result_to_block_on=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if result_to_block_on is not None:
            jax.block_until_ready(result_to_block_on)
        dt = time.perf_counter() - t0
        self.samples.append(dt)
        if len(self.samples) > self.max_samples:
            self.samples.pop(0)
        out["seconds"] = dt

    def record(self, seconds: float):
        self.samples.append(seconds)
        if len(self.samples) > self.max_samples:
            self.samples.pop(0)

    @property
    def fps(self) -> float:
        if not self.samples:
            return 0.0
        return len(self.samples) / sum(self.samples)

    def summary(self) -> dict:
        if not self.samples:
            return {"frames": 0}
        s = sorted(self.samples)
        n = len(s)
        return {
            "frames": n,
            "fps": self.fps,
            "ms_mean": 1e3 * sum(s) / n,
            "ms_p50": 1e3 * s[n // 2],
            "ms_p99": 1e3 * s[min(n - 1, int(n * 0.99))],
        }


def stage_breakdown(obj, cfg, transform, lights, height: int, width: int,
                    frames: int = 30, strategy: str = "auto") -> dict:
    """Per-stage device time (ms/frame) for the Pallas pipeline.

    Times CUMULATIVE pipeline prefixes — setup | +binning | +raster kernel |
    +shade/pack — each inside one compiled lax.scan over ``frames`` chained,
    rotation-varied frames with a single host fetch (the only trustworthy
    timing method on tunneled TPU runtimes, see CLAUDE.md), and reports the
    per-stage deltas. Single-object scenes only (profiling tool).

    NOTE: the single synchronized fetch costs ~34 ms through the tunnel;
    it amortizes over ``frames`` and cancels in the stage DELTAS, but the
    first stage's absolute number carries ~34/frames ms of it.
    """
    import jax.numpy as jnp

    from ..core.math import pack_argb
    from ..geometry.transform import rotate_object, rotation_y
    from ..ops import raster_pallas as rp
    from ..ops.binning import (
        bin_triangles,
        bin_triangles_queue,
        triangle_bbox_rows,
    )
    from ..ops.shading import shade

    T = obj.num_triangles
    if strategy == "auto":
        strategy = (
            "sorted" if T > rp.AUTO_SORTED_THRESHOLD else "mask"
        )
    tile_h = rp._pick_tile_h(T, height, width)
    angles = jnp.linspace(0.0, 0.7, frames).astype(jnp.float32)

    def timed(prefix_fn):
        @jax.jit
        def fn(obj, transform, lights, angles):
            def body(carry, angle):
                spun = rotate_object(
                    obj, rotation_y(angle + carry * jnp.float32(1e-30))
                )
                return carry + prefix_fn(spun) * jnp.float32(1e-20), 0
            return jax.lax.scan(body, jnp.float32(0.0), angles)

        out = fn(obj, transform, lights, angles)
        _ = float(out[0])  # compile + warm
        t0 = time.perf_counter()
        out = fn(obj, transform, lights, angles)
        _ = float(out[0])
        return (time.perf_counter() - t0) / frames * 1e3

    from ..ops.setup_pallas import FUSED_SETUP_MIN, SetupOut, setup_for_raster

    # Mirror the real pipeline's setup form: fused Pallas kernel above
    # FUSED_SETUP_MIN (records + bbox written directly), XLA chain below.
    use_fused_setup = T >= FUSED_SETUP_MIN

    def _setup(o):
        """(recs_for_stream, bbox) exactly as the pipeline builds them."""
        out = setup_for_raster(o, transform, lights, cfg,
                               frame_height=height, frame_width=width)
        if isinstance(out, SetupOut):
            return out.recs, out.bbox
        return out, triangle_bbox_rows(out, height, width)

    def _consume(*arrays):
        # Consume EVERY element of every stage product: a partial
        # reduction lets XLA dead-code untouched math and mis-attribute
        # it to later stages (observed: "setup" at 1M read 15.8 ms while
        # binning absorbed the color/normal rows it never needs).
        return sum(
            jnp.sum(a.astype(jnp.float32) * jnp.float32(1e-12))
            for a in arrays
        )

    def p_setup(o):
        recs, bbox = _setup(o)
        return _consume(recs, *bbox)

    # Mirror rasterize_scene_shaded's actual sorted-path parameters so the
    # deltas attribute to the stages the real pipeline runs (incl. the
    # wide path's split-column binning).
    exp, bf = rp._queue_expansion(tile_h, T)
    wide = tile_h <= 8
    split = rp.PACK_SPLIT if wide else 1
    rows = (
        rp.PACK_ROWS
        if (wide and split == 1
            and T * rp.PACK_ROWS_MAX_PX_PER_TRI >= height * width)
        else 1
    )
    if rows > 1:
        if rp.BUDGET_FACTOR_OVERRIDE is not None:
            bf = bf * rp.PACK_ROWS_STREAM_FRAC * (2.0 / rows)
        else:
            bf = rp._rows_stream_budget_factor(T, height, width) * (
                2.0 / rows
            )
    blk = rp.WIDE_BLK if wide else rp.QUEUE_BLK
    _tx = -(-width // rp.TILE_W)
    bin_w = rp.TILE_W // split
    bin_width = _tx * rp.TILE_W if split > 1 else width

    def p_bin(o):
        recs, bbox = _setup(o)
        if strategy == "mask":
            b = bin_triangles(None, height, width, tile_h, rp.TILE_W,
                              min(max(rp.CHUNK_T, T), 4096), bbox=bbox)
            return jnp.sum(b.counts).astype(jnp.float32) + _consume(recs)
        q = bin_triangles_queue(None, height, bin_width, tile_h, bin_w,
                                blk, expansion=exp, budget_factor=bf,
                                bbox=bbox, frame_height=height,
                                frame_width=width, col_split=split,
                                row_split=rows)
        # The full-record term keeps each prefix's upstream work
        # identical (no DCE skew in the deltas).
        return jnp.sum(q.counts).astype(jnp.float32) + _consume(recs)

    def p_stream(o):
        recs, bbox = _setup(o)
        if strategy == "mask":
            return p_bin(o)  # no separate stream stage
        q = bin_triangles_queue(None, height, bin_width, tile_h, bin_w,
                                blk, expansion=exp, budget_factor=bf,
                                bbox=bbox, frame_height=height,
                                frame_width=width, col_split=split,
                                row_split=rows, visit_empty=False)
        if not use_fused_setup:
            recs = rp.finish_records(recs)
        stream, _ = rp._queue_stream(None, q, recs, blk)
        # Consume every gathered lane (a single-lane slice lets XLA narrow
        # the row gather itself) + the full upstream terms.
        return (
            _consume(stream, recs)
            + jnp.sum(q.counts).astype(jnp.float32)
        )

    # Untextured configs run the fully-fused kernel (raster + shade in one
    # pass); textured configs raster to a G-buffer and shade deferred.
    fused = not cfg.textured

    def p_raster(o):
        rec_t = setup_for_raster(o, transform, lights, cfg,
                                 frame_height=height, frame_width=width)
        if fused:
            covered, z, color, _ = rp.rasterize_pallas_shaded(
                rec_t, transform, lights, cfg.phong, height, width,
                strategy=strategy, tile_h=tile_h,
            )
            return jnp.sum(jnp.where(covered, z, 0.0)) + (
                color[0, 0] & 1
            ).astype(jnp.float32)
        covered, gbuf, _ = rp.rasterize_pallas(
            rec_t, height, width, strategy=strategy, tile_h=tile_h
        )
        return jnp.sum(jnp.where(covered, gbuf[0], 0.0))

    def p_shade(o):
        if fused:
            return p_raster(o)  # shading already inside the kernel
        rec_t = setup_for_raster(o, transform, lights, cfg,
                                 frame_height=height, frame_width=width)
        covered, gbuf, _ = rp.rasterize_pallas(
            rec_t, height, width, strategy=strategy, tile_h=tile_h
        )
        rgba, covered = shade(covered, gbuf, transform, lights, cfg,
                              obj.texture, 0, 0)
        return (
            jnp.sum(rgba) + (pack_argb(rgba)[0, 0] & 1).astype(jnp.float32)
        )

    cum = {name: timed(fn) for name, fn in [
        ("setup", p_setup), ("binning", p_bin), ("stream", p_stream),
        ("raster", p_raster), ("shade", p_shade),
    ]}
    return {
        "strategy": strategy,
        "tile_h": tile_h,
        "fused_shading": fused,
        "setup_ms": cum["setup"],
        "binning_ms": cum["binning"] - cum["setup"],
        "stream_ms": cum["stream"] - cum["binning"],
        "raster_ms": cum["raster"] - cum["stream"],
        "shade_ms": cum["shade"] - cum["raster"],
        "total_ms": cum["shade"],
    }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace: ``with annotate('raster'): ...``."""
    return jax.profiler.TraceAnnotation(name)
