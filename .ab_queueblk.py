"""Interleaved A/B: QUEUE_BLK 64 (shipped) vs 128 — narrow-path record
block size (sparse 16/32-row tile scenes: configs 4 and 5). Bigger
blocks halve work items but the narrow kernel interleaves span setup
per 8-entry chunk, so boundary blocks waste more masked chunks.
960/240-frame chained scans, medians of 5, checks bit-equal.
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.ops.raster_pallas as rp
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes

print("device:", jax.devices()[0], flush=True)

orig = rp.QUEUE_BLK
for config, (H, W), iters in ((4, (1080, 1920), 480), (5, (1080, 1920), 240)):
    scene_g, tr_d, li_d = scenes.baseline_scene(config, H, W)
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    objs = tuple(o for o, _ in scene_j)
    cfgs = tuple(c for _, c in scene_j)
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks = {}, {}
    try:
        for blk in (64, 128):
            rp.QUEUE_BLK = blk

            @jax.jit
            def frames(objs, transform, lights, angles):
                def body(carry, angle):
                    a = angle + carry * jnp.float32(1e-30)
                    spun = tuple(
                        rotate_object(o, rotation_y(a)) for o in objs
                    )
                    fb = render_scene(
                        None, list(zip(spun, cfgs)), transform, lights,
                        backend="pallas", frame_height=H, frame_width=W,
                    )
                    check = jnp.sum(
                        jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
                    ) + (fb.color[13, 17] & 255).astype(jnp.float32)
                    return carry + check * jnp.float32(1e-30), 0
                c, _ = jax.lax.scan(body, jnp.float32(0.0), angles)
                return c

            c = frames(objs, tr, li, angles)
            checks[blk] = float(c)
            fns[blk] = frames
    finally:
        rp.QUEUE_BLK = orig
    res = {k: [] for k in fns}
    for rep in range(5):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            c = fn(objs, tr, li, angles)
            _ = float(c)
            res[k].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "config": config,
        "checks_equal": checks[64] == checks[128],
        "ms": {str(k): round(sorted(v)[2], 4) for k, v in res.items()},
    }), flush=True)
