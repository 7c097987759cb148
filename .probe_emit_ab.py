"""A/B: rows-binning with tri-major (old) vs slot-major (new) emission.

Variants compiled in ONE process, interleaved reps, medians of 5
(CLAUDE.md timing rules). 'old' is an inline transcription of the
pre-change _bin_queue_rows emission+sort (tri-major (T,2).reshape(-1),
packed key, stable not needed); 'new' calls the shipped
_bin_queue_rows. Both prefixes run setup + emission + the two sorts +
full post (the real QueueBins outputs), consuming everything.
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.ops.raster_pallas as rp
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid
from tpu_renderer.ops import binning
from tpu_renderer.ops.binning import _bin_queue_rows
from tpu_renderer.ops.setup_pallas import setup_for_raster, SetupOut

H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
cfg = ObjectConfig(phong=True)
print("device:", jax.devices()[0], flush=True)

F32 = jnp.float32
TILE_H = 8
RS = 2
EXP_H = 2
TILES_Y = -(-H // TILE_H)
TILES_X = -(-W // 128)
NFB = TILES_Y * TILES_X
N_STRIPS = TILES_Y * RS
STRIP_H = TILE_H // RS
BLK = rp.WIDE_BLK
BUDGET_FACTOR = rp.PACK_ROWS_STREAM_FRAC * 1.2


def consume(*arrays):
    return sum(jnp.sum(a.astype(F32) * F32(1e-12)) for a in arrays)


def bin_rows_old(bbox, T, tri_bits, entry_budget):
    """Transcription of pre-change _bin_queue_rows (tri-major emission)."""
    tri_valid, ylo, yhi, xlo, xhi = bbox
    sy_lo = jnp.clip(
        jnp.floor(ylo / F32(STRIP_H)).astype(jnp.int32), 0, N_STRIPS)
    sy_hi = jnp.clip(
        jnp.ceil(yhi / F32(STRIP_H)).astype(jnp.int32), 0, N_STRIPS)
    tx_lo = jnp.clip(jnp.floor(xlo / F32(128)).astype(jnp.int32), 0, TILES_X)
    tx_hi = jnp.clip(
        jnp.floor(xhi / F32(128)).astype(jnp.int32) + 1, 0, TILES_X)
    wx = jnp.maximum(tx_hi - tx_lo, 0)
    covers = tri_valid & (sy_hi > sy_lo) & (wx > 0)
    bases, nslots = [], []
    for h in (0, 1):
        base = sy_lo + ((h - sy_lo) & 1)
        ns = jnp.where(sy_hi > base, (sy_hi - base + 1) // 2, 0) * wx
        bases.append(base)
        nslots.append(ns)
    small = covers & (nslots[0] <= EXP_H) & (nslots[1] <= EXP_H)

    j = jnp.arange(EXP_H, dtype=jnp.int32)[None, :]
    wx_safe = jnp.maximum(wx, 1)[:, None]
    entry_tri = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None], (T, EXP_H)).reshape(-1)
    outs = []
    for h in (0, 1):
        strip = bases[h][:, None] + 2 * (j // wx_safe)
        tile = (strip // RS) * TILES_X + (tx_lo[:, None] + j % wx_safe)
        slot_ok = small[:, None] & (j < nslots[h][:, None])
        entry_tile = jnp.where(slot_ok, tile, NFB).reshape(-1)
        key = ((entry_tile.astype(jnp.uint32) << tri_bits)
               | entry_tri.astype(jnp.uint32))
        (skey,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
        bounds = jnp.arange(NFB + 1, dtype=jnp.uint32) << tri_bits
        starts_full = jnp.searchsorted(skey, bounds,
                                       side="left").astype(jnp.int32)
        starts_h = jnp.minimum(starts_full, entry_budget)
        keep_h = starts_h[1:] - starts_h[:-1]
        sorted_tri = (skey & jnp.uint32((1 << tri_bits) - 1)).astype(
            jnp.int32)
        sorted_tri = jax.lax.slice(
            jnp.pad(sorted_tri,
                    (0, max(0, entry_budget - sorted_tri.shape[0]))),
            (0,), (entry_budget,))
        idx = jnp.arange(entry_budget, dtype=jnp.int32)
        sorted_tri = jnp.where(idx < starts_h[NFB], sorted_tri, idx % T)
        starts_g = starts_h + jnp.int32(h * entry_budget)
        b_lo = starts_g[:-1] // BLK
        b_hi = -(-starts_g[1:] // BLK)
        nblocks = jnp.where(keep_h > 0, b_hi - b_lo, 0)
        outs += [sorted_tri, starts_g, keep_h, nblocks]
    return outs


def measure(fn, obj, iters):
    @jax.jit
    def loop(obj, angles):
        def body(carry, angle):
            a = angle + carry * F32(1e-30)
            spun = rotate_object(obj, rotation_y(a))
            return carry + fn(spun) * F32(1e-20), 0
        return jax.lax.scan(body, F32(0.0), angles)[0]

    angles = jnp.linspace(0.0, 0.6, iters).astype(F32)
    loop_c = loop.lower(obj, angles).compile()
    return loop_c, angles


for lat, lon, iters in ((1000, 1001, 6), (1415, 1416, 5)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon)))
    _out0 = setup_for_raster(obj, tr, li, cfg, frame_height=H,
                             frame_width=W)
    T = int(_out0.bbox[0].shape[0])
    tri_bits = max(1, int(T - 1).bit_length())
    entry_budget = int(-(-(BUDGET_FACTOR * max(T, BLK)) // BLK)) * BLK
    entry_budget = min(entry_budget, -(-(T * EXP_H) // BLK) * BLK)

    def _setup(o):
        out = setup_for_raster(o, tr, li, cfg, frame_height=H,
                               frame_width=W)
        assert isinstance(out, SetupOut)
        return out.recs, out.bbox

    def p_old(o):
        recs, bbox = _setup(o)
        outs = bin_rows_old(bbox, T, tri_bits, entry_budget)
        return consume(recs, *outs)

    def p_new(o):
        recs, bbox = _setup(o)
        q = _bin_queue_rows(bbox, H, W, TILE_H, 128, BLK, BUDGET_FACTOR,
                            2048, 0, 0, RS, False)
        return consume(recs, q.sorted_tri, q.starts, q.counts,
                       q.item_start, q.wi_tile, q.large_ids) + (
            q.n_large + q.n_dropped).astype(F32)

    loops = {}
    for name, fn in (("old", p_old), ("new", p_new)):
        loops[name] = measure(fn, obj, iters)
    res = {n: [] for n in loops}
    for rep in range(5):
        for n, (loop_c, angles) in loops.items():
            t0 = time.perf_counter()
            _ = float(loop_c(obj, angles))
            res[n].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "T": T, "budget": entry_budget,
        **{n + "_ms": round(sorted(v)[2], 2) for n, v in res.items()},
        "all": {n: [round(x, 1) for x in v] for n, v in res.items()},
    }), flush=True)
