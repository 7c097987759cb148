"""Interleaved A/B: WIDE_BLK 128 (shipped) vs 256 — record-block size of
the wide raster path, 1M/2M 1080p Phong. Bigger blocks halve work items
(amortizing per-item DMA latency + stage-A entry masking) at 2x the
VMEM per stream block and coarser pipelining. Medians of 5, drop
counts printed, checks must be bit-equal.
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


orig = rp.WIDE_BLK
for lat, lon, iters in ((707, 708, 10), (1000, 1001, 8)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks, drops, failed = {}, {}, {}, {}
    try:
        for blk in (128, 256):
            rp.WIDE_BLK = blk
            fn = make_fn()
            try:
                c, d = fn(obj, tr, li, angles)
                checks[blk], drops[blk] = float(c), float(d)
                fns[blk] = fn
            except Exception as e:
                failed[blk] = repr(e)[:200]
    finally:
        rp.WIDE_BLK = orig
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
        "drops": {str(k): v for k, v in drops.items()},
        "ms": {str(k): round(sorted(v)[2], 2) for k, v in res.items()},
        "failed": failed,
    }), flush=True)
