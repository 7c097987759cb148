"""Interleaved A/B, follow-up to .r5_chunk.py: WIDE_CHUNK_T 16 vs 32
(the 8 -> 16 win begs the next doubling) and the NARROW path's CHUNK_T
8 vs 16 on configs 4/5 (expected wash-to-loss: few-entry work items).
Medians of 5, bit-equal, drop-free.
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

print("device:", jax.devices()[0], flush=True)
_, tr_d, li_d = scenes.baseline_scene(4, 1080, 1920)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)


def make_fn(scene_cfgs, H, W):
    cfgs = tuple(c for _, c in scene_cfgs)

    @jax.jit
    def frames(objs, transform, lights, angles):
        def body(carry, angle):
            a = angle + carry * jnp.float32(1e-30)
            spun = tuple(rotate_object(o, rotation_y(a)) for o in objs)
            stats = {}
            fb = render_scene(
                None, list(zip(spun, cfgs)), transform, lights,
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


cfgp = ObjectConfig(phong=True)
orig = rp.WIDE_CHUNK_T
for lat, lon, iters in ((707, 708, 10), (1000, 1001, 8)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks, drops, failed = {}, {}, {}, {}
    try:
        for ct in (32, 64):
            rp.WIDE_CHUNK_T = ct
            fn = make_fn([(obj, cfgp)], 1080, 1920)
            try:
                c, d = fn((obj,), tr, li, angles)
                checks[ct], drops[ct] = float(c), float(d)
                fns[ct] = fn
            except Exception as e:
                failed[ct] = repr(e)[:200]
    finally:
        rp.WIDE_CHUNK_T = orig
    res = {k: [] for k in fns}
    for rep in range(5):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            c, _ = fn((obj,), tr, li, angles)
            _ = float(c)
            res[k].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "probe": "WIDE_CHUNK_T", "T": int(obj.num_triangles),
        "checks_equal": len(set(checks.values())) <= 1,
        "drops": {str(k): v for k, v in drops.items()},
        "ms": {str(k): round(sorted(v)[2], 2) for k, v in res.items()},
        "failed": failed,
    }), flush=True)

print('done', flush=True)
