"""Microbench: where the rows-binning stage spends its time at 1-4M.

Cumulative prefixes of binning._bin_queue_rows (PACK_ROWS=2) on synthetic
1080p tiny-triangle bboxes (the megascene shape: ~55% valid, 1-3 px):

  emit   — emission + u32 key pack for BOTH parity streams
  sort   — emit + the two 2T-key sorts
  full   — the real _bin_queue_rows (adds searchsorted starts, budget
           clip, dead-tail reindex, large side list, work-item grid)

full - sort = the non-sort non-emission overhead the stage carries.
All variants compiled first, reps interleaved (CLAUDE.md timing rules).
"""
import json
import os
import time

import jax
import jax.numpy as jnp

from tpu_renderer.ops import binning

print("device:", jax.devices()[0], flush=True)
F32 = jnp.float32

H, W = 1080, 1920
TILE_H, TILE_W = 8, 128
RS = 2
SIZES = tuple(
    int(s) for s in os.environ.get("PROBE_T", "1000000,2000000,4000000").split(",")
)


def synth_bbox(T, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.uniform(k[0], (T,), F32, 0.0, W - 4.0)
    y = jax.random.uniform(k[1], (T,), F32, 0.0, H - 4.0)
    w = jax.random.uniform(k[2], (T,), F32, 0.5, 2.5)
    h = jax.random.uniform(k[3], (T,), F32, 0.5, 2.5)
    valid = jax.random.uniform(k[4], (T,)) < 0.55
    return valid, y, y + h, x, x + w


def emit_keys(bbox, jitter):
    """The emission + key-pack prefix of _bin_queue_rows, both streams."""
    rs = RS
    exp_h = 2
    strip_h = TILE_H // rs
    tiles_y = -(-H // TILE_H)
    tiles_x = -(-W // TILE_W)
    nfb = tiles_y * tiles_x
    n_strips = tiles_y * rs

    tri_valid, ylo, yhi, xlo, xhi = bbox
    xlo = xlo + jitter
    xhi = xhi + jitter
    T = tri_valid.shape[0]
    sy_lo = jnp.clip(jnp.floor(ylo / F32(strip_h)).astype(jnp.int32), 0, n_strips)
    sy_hi = jnp.clip(jnp.ceil(yhi / F32(strip_h)).astype(jnp.int32), 0, n_strips)
    tx_lo = jnp.clip(jnp.floor(xlo / F32(TILE_W)).astype(jnp.int32), 0, tiles_x)
    tx_hi = jnp.clip(jnp.floor(xhi / F32(TILE_W)).astype(jnp.int32) + 1, 0, tiles_x)
    wx = jnp.maximum(tx_hi - tx_lo, 0)
    covers = tri_valid & (sy_hi > sy_lo) & (wx > 0)

    bases, nslots = [], []
    for hh in (0, 1):
        base = sy_lo + ((hh - sy_lo) & 1)
        ns = jnp.where(sy_hi > base, (sy_hi - base + 1) // 2, 0) * wx
        bases.append(base)
        nslots.append(ns)
    small = covers & (nslots[0] <= exp_h) & (nslots[1] <= exp_h)

    j = jnp.arange(exp_h, dtype=jnp.int32)[:, None]
    wx_safe = jnp.maximum(wx, 1)[None, :]
    entry_tri = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None, :], (exp_h, T)
    ).reshape(-1)
    tri_bits = max(1, int(T - 1).bit_length())
    keys = []
    for hh in (0, 1):
        strip = bases[hh][None, :] + 2 * (j // wx_safe)
        tile = (strip // rs) * tiles_x + (tx_lo[None, :] + j % wx_safe)
        slot_ok = small[None, :] & (j < nslots[hh][None, :])
        entry_tile = jnp.where(slot_ok, tile, nfb).reshape(-1)
        keys.append(
            (entry_tile.astype(jnp.uint32) << tri_bits)
            | entry_tri.astype(jnp.uint32)
        )
    return keys


def v_emit(bbox, jitter):
    keys = emit_keys(bbox, jitter)
    return sum(jnp.sum(k) for k in keys).astype(jnp.float32)


def v_sort(bbox, jitter):
    keys = emit_keys(bbox, jitter)
    acc = jnp.float32(0)
    for k in keys:
        (s,) = jax.lax.sort((k,), num_keys=1, is_stable=False)
        acc = acc + jnp.sum(s).astype(jnp.float32)
    return acc


def v_full(bbox, jitter):
    tri_valid, ylo, yhi, xlo, xhi = bbox
    qb = binning._bin_queue_rows(
        (tri_valid, ylo, yhi, xlo + jitter, xhi + jitter),
        H, W, TILE_H, TILE_W, 128, 0.54, 2048, 0, 0, RS, False,
    )
    return (
        jnp.sum(qb.sorted_tri) + jnp.sum(qb.starts) + jnp.sum(qb.counts)
        + jnp.sum(qb.item_start) + jnp.sum(qb.wi_tile)
        + jnp.sum(qb.large_ids) + qb.n_large + qb.n_dropped
    ).astype(jnp.float32)


def make_run(fn, bbox, inner=4):
    @jax.jit
    def run(c0):
        def body(carry, i):
            out = fn(bbox, carry * jnp.float32(1e-30) + i.astype(F32) * 0.37)
            return carry + out * jnp.float32(1e-20), 0
        return jax.lax.scan(body, c0, jnp.arange(inner))[0]
    return run


for T in SIZES:
    bbox = jax.device_put(synth_bbox(T))
    runs = {}
    for name, fn in (("emit", v_emit), ("sort", v_sort), ("full", v_full)):
        runs[name] = make_run(fn, bbox)
        _ = float(runs[name](jnp.float32(0.0)))  # compile
    res = {"T": T}
    samples = {name: [] for name in runs}
    for rep in range(5):
        for name, run in runs.items():
            t0 = time.perf_counter()
            _ = float(run(jnp.float32(rep)))
            samples[name].append((time.perf_counter() - t0) / 4 * 1e3)
    for name, ts in samples.items():
        res[name + "_ms"] = round(sorted(ts)[len(ts) // 2], 2)
    res["all"] = {n: [round(t, 1) for t in ts] for n, ts in samples.items()}
    print(json.dumps(res), flush=True)
