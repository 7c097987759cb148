"""Probe: decompose the binning stage at 1M/2M triangles (1080p, 8-row
tiles, expansion 4) into cumulative prefixes — bbox / +emit / +sort /
+full bin_triangles_queue — with every prefix consuming ALL its outputs
(CLAUDE.md: partial consumes let XLA dead-code upstream work). In-graph
scan over varied chained frames, one fetch, medians of 5.
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.ops.raster_pallas as rp
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.geometry.vertex import setup_records
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid
from tpu_renderer.ops import binning
from tpu_renderer.ops.binning import bin_triangles_queue, triangle_bbox_rows
from tpu_renderer.ops.setup_pallas import setup_for_raster, SetupOut

H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
cfg = ObjectConfig(phong=True)
print("device:", jax.devices()[0], flush=True)

F32 = jnp.float32
TILES_X = -(-W // 128)


def consume(*arrays):
    return sum(
        jnp.sum(a.astype(F32) * F32(1e-12)) for a in arrays
    )


def emit_only(bbox, T, expansion=4, tile_h=8):
    """The emission arithmetic of bin_triangles_queue, standalone."""
    tiles_y = -(-H // tile_h)
    tri_valid, ylo, yhi, xlo, xhi = bbox
    ty_lo = jnp.clip(jnp.floor(ylo / F32(tile_h)).astype(jnp.int32), 0, tiles_y)
    ty_hi = jnp.clip(jnp.ceil(yhi / F32(tile_h)).astype(jnp.int32), 0, tiles_y)
    tx_lo = jnp.clip(jnp.floor(xlo / F32(128)).astype(jnp.int32), 0, TILES_X)
    tx_hi = jnp.clip(jnp.floor(xhi / F32(128)).astype(jnp.int32) + 1, 0, TILES_X)
    wy = jnp.maximum(ty_hi - ty_lo, 0)
    wx = jnp.maximum(tx_hi - tx_lo, 0)
    n_tiles = jnp.where(tri_valid, wy * wx, 0)
    small = (n_tiles > 0) & (n_tiles <= expansion)
    j = jnp.arange(expansion, dtype=jnp.int32)[None, :]
    wx_safe = jnp.maximum(wx, 1)[:, None]
    tile = (ty_lo[:, None] + j // wx_safe) * TILES_X + (tx_lo[:, None] + j % wx_safe)
    slot_ok = small[:, None] & (j < n_tiles[:, None])
    ntiles = tiles_y * TILES_X
    entry_tile = jnp.where(slot_ok, tile, ntiles).reshape(-1)
    entry_tri = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None], (T, expansion)
    ).reshape(-1)
    return entry_tile, entry_tri


def sort_only(entry_tile, entry_tri, T, ntiles):
    tri_bits = max(1, int(T - 1).bit_length())
    key = (
        (entry_tile.astype(jnp.uint32) << tri_bits)
        | entry_tri.astype(jnp.uint32)
    )
    (skey,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
    return skey


def measure(fn, obj, iters):
    @jax.jit
    def loop(obj, angles):
        def body(carry, angle):
            a = angle + carry * F32(1e-30)
            spun = rotate_object(obj, rotation_y(a))
            return carry + fn(spun) * F32(1e-20), 0
        return jax.lax.scan(body, F32(0.0), angles)[0]

    angles = jnp.linspace(0.0, 0.6, iters).astype(F32)
    _ = float(loop(obj, angles))
    reps = []
    for _i in range(5):
        t0 = time.perf_counter()
        _ = float(loop(obj, angles))
        reps.append((time.perf_counter() - t0) / iters * 1e3)
    return sorted(reps)[2]


for lat, lon, iters in ((708, 707, 10), (1000, 1001, 6)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    T = int(obj.num_triangles)
    tiles_y = -(-H // 8)
    ntiles = tiles_y * TILES_X

    def _setup(o):
        out = setup_for_raster(o, tr, li, cfg, frame_height=H,
                               frame_width=W)
        assert isinstance(out, SetupOut)
        return out.recs, out.bbox

    def p_setup(o):
        recs, bbox = _setup(o)
        return consume(recs, *bbox)

    def p_emit(o):
        recs, bbox = _setup(o)
        et, etri = emit_only(bbox, T)
        return consume(recs, et, etri)

    def p_sort(o):
        recs, bbox = _setup(o)
        et, etri = emit_only(bbox, T)
        skey = sort_only(et, etri, T, ntiles)
        return consume(recs, skey)

    def p_full(o):
        recs, bbox = _setup(o)
        q = bin_triangles_queue(None, H, W, 8, 128, rp.WIDE_BLK,
                                expansion=4, budget_factor=1.2,
                                bbox=bbox, frame_height=H, frame_width=W,
                                visit_empty=False)
        return consume(recs, q.sorted_tri, q.starts, q.counts,
                       q.item_start, q.wi_tile, q.large_ids) + (
            q.n_large + q.n_dropped
        ).astype(F32)

    ms = {}
    prev = 0.0
    for name, fn in (("setup", p_setup), ("emit", p_emit),
                     ("sort", p_sort), ("full", p_full)):
        m = measure(fn, obj, iters)
        ms[name] = round(m, 2)
        ms[name + "_delta"] = round(m - prev, 2)
        prev = m
    print(json.dumps({"T": T, **ms}), flush=True)
