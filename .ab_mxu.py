"""Interleaved A/B: split packing with the MXU expander merge vs the
shipped split=1 fold, 1080p Phong, 1M/2M triangles.

Round 3 killed split packing because the 'tree' merge paid ~(S-1) VPU
selects per quantity plane; the 'mxu' merge does the whole chunk in ONE
block-diagonal matmul, so each (C, R, W) fragment op serving S entries
may finally net out. Costs that ride along and are INCLUDED here by
construction: col_split binning overflows the packed u32 key at 2M
(pair-sort fallback ~1.5x), entry expansion grows at sub-tile column
granularity, and per-tile lockstep blocks multiply (S block DMAs +
stage-A passes per item). Checks must be bit-equal; drops printed
(nonzero disqualifies the arm).
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.ops.raster_pallas as rp
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid

H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
print("device:", jax.devices()[0], flush=True)
cfg = ObjectConfig(phong=True)


def make_fn():
    @jax.jit
    def frames(obj, transform, lights, angles):
        def body(carry, angle):
            a = angle + carry * jnp.float32(1e-30)
            spun = rotate_object(obj, rotation_y(a))
            stats = {}
            fb = render_scene(
                None, [(spun, cfg)], transform, lights,
                backend="pallas", frame_height=H, frame_width=W,
                stats=stats,
            )
            check = jnp.sum(
                jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
            ) + (fb.color[13, 17] & 255).astype(jnp.float32)
            return carry + check * jnp.float32(1e-30), stats["bins_dropped"]
        c, d = jax.lax.scan(body, jnp.float32(0.0), angles)
        return c, jnp.max(d)

    return frames


ARMS = ((1, "tree"), (4, "mxu"), (8, "mxu"), (16, "mxu"))
orig_s, orig_m = rp.PACK_SPLIT, rp.SPLIT_MERGE
for lat, lon, iters in ((707, 708, 8), (1000, 1001, 6)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks, drops, failed = {}, {}, {}, {}
    try:
        for split, merge in ARMS:
            rp.PACK_SPLIT, rp.SPLIT_MERGE = split, merge
            fn = make_fn()
            try:
                c, d = fn(obj, tr, li, angles)
                checks[(split, merge)] = float(c)
                drops[(split, merge)] = float(d)
                fns[(split, merge)] = fn
            except Exception as e:  # Mosaic rejection is a verdict too
                failed[(split, merge)] = repr(e)[:200]
    finally:
        rp.PACK_SPLIT, rp.SPLIT_MERGE = orig_s, orig_m
    res = {k: [] for k in fns}
    for rep in range(5):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            c, _ = fn(obj, tr, li, angles)
            _ = float(c)
            res[k].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "T": int(obj.num_triangles),
        "checks_equal": len(set(checks.values())) <= 1,
        "drops": {f"{k[0]}_{k[1]}": v for k, v in drops.items()},
        "ms": {f"{k[0]}_{k[1]}": round(sorted(v)[2], 2)
               for k, v in res.items()},
        "failed": {f"{k[0]}_{k[1]}": v for k, v in failed.items()},
    }), flush=True)
