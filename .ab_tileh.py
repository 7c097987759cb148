"""Interleaved A/B: tile_h 32 vs 64 on the sparse-scene (headline)
configs — config 4 (2.2k tris Phong 1080p) and a 40k-tri sphere.

The narrow path's per-frame cost at small T is grid-step-bound (~1 us
per DMA-latency-bound step); doubling the tile height halves the tile
count (empty-tile skipping already removed entry-less tiles). Taller
tiles raise per-chunk fragment width (C,64,128) — the A/B decides
whether the trade wins. One process, variants compiled first, then
alternating reps (CLAUDE.md timing rules).
"""
import json
import time

import jax
import jax.numpy as jnp

from tpu_renderer.core.types import ObjectConfig, make_framebuffer, \
    make_object
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid
from tpu_renderer.ops.raster_pallas import rasterize_pallas_shaded
from tpu_renderer.ops.setup_pallas import setup_for_raster

H, W = 1080, 1920
print("device:", jax.devices()[0], flush=True)

TILE_HS = (32, 64, 16)


def make_fn(obj, cfg, tile_h, tr, li):
    @jax.jit
    def frames(obj, transform, lights, angles):
        def body(carry, angle):
            a = angle + carry * jnp.float32(1e-30)
            spun = rotate_object(obj, rotation_y(a))
            arg = setup_for_raster(spun, transform, lights, cfg,
                                   frame_height=H, frame_width=W)
            cov, z, col, _ = rasterize_pallas_shaded(
                arg, transform, lights, cfg.phong, H, W,
                strategy="sorted", tile_h=tile_h,
            )
            check = jnp.sum(jnp.where(cov, z, 0.0)) + (
                col[13, 17] & 255
            ).astype(jnp.float32)
            return carry + check * jnp.float32(1e-20), 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)[0]

    return frames


for src in ("config4", "sphere40k"):
    if src == "config4":
        sg, tr_d, li_d = scenes.baseline_scene(4, H, W)
        scene_j, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
        obj, cfg = scene_j[0]
        iters = 40
    else:
        _, tr_d, li_d = scenes.baseline_scene(4, H, W)
        _, tr, li = scenes.to_jax_scene([], tr_d, li_d)
        obj = jax.device_put(
            make_object((0.0, 0.0, 0.0), **construct_sphere_grid(140, 143))
        )
        cfg = ObjectConfig(phong=True)
        iters = 25
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks, failed = {}, {}, []
    for th in TILE_HS:
        try:
            fn = make_fn(obj, cfg, th, tr, li)
            checks[th] = float(fn(obj, tr, li, angles))
            fns[th] = fn
        except Exception as e:
            failed.append(f"{th}: {type(e).__name__}")
    res = {t: [] for t in fns}
    for rep in range(5):
        for t in fns:
            t0 = time.perf_counter()
            _ = float(fns[t](obj, tr, li, angles))
            res[t].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "scene": src,
        "checks_equal": len(set(checks.values())) == 1,
        "failed": failed,
        **{f"th{t}_ms": round(sorted(r)[2], 2) for t, r in res.items()},
        "all": {str(t): [round(x, 1) for x in r] for t, r in res.items()},
    }), flush=True)
