"""Interleaved A/B: SAMPLE_SLAB_SKIP on/off — per-slab texture-
contraction skip on uncovered slabs, config 3 (textured bilinear cube,
512^2, tile_h=32 -> 4 slabs/tile) and a 1080p textured sphere.

Also asserts bit-equal checks between arms (the skip writes zeros only
where tex_mask never consumes them). 960-frame chained scans (fetch is
noise), medians of 5.
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
from tpu_renderer.models.primitives import construct_cube, construct_sphere_grid
from tpu_renderer.models.textures import checkerboard

print("device:", jax.devices()[0], flush=True)

SCENES = {
    "config3_512": (construct_cube(), 512, 512, checkerboard(64, 64, 8), 960),
    "tex_sphere_250k_1080p": (
        construct_sphere_grid(354, 354), 1080, 1920,
        checkerboard(128, 128, 16), 24,
    ),
}

orig = rp.SAMPLE_SLAB_SKIP
for name, (mesh, H, W, tex, iters) in SCENES.items():
    _, tr_d, li_d = scenes.baseline_scene(3, H, W)
    _, tr, li = scenes.to_jax_scene([], tr_d, li_d)
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **mesh, texture=jnp.asarray(tex))
    )
    cfg = ObjectConfig(textured=True, filter_mode="bilinear")
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks = {}, {}
    try:
        for skip in (False, True):
            rp.SAMPLE_SLAB_SKIP = skip

            @jax.jit
            def frames(obj, transform, lights, angles):
                def body(carry, angle):
                    a = angle + carry * jnp.float32(1e-30)
                    spun = rotate_object(obj, rotation_y(a))
                    fb = render_scene(
                        None, [(spun, cfg)], transform, lights,
                        backend="pallas", frame_height=H, frame_width=W,
                    )
                    check = jnp.sum(
                        jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
                    ) + jnp.sum(fb.color & 255).astype(jnp.float32)
                    return carry + check * jnp.float32(1e-30), 0
                c, _ = jax.lax.scan(body, jnp.float32(0.0), angles)
                return c

            c = frames(obj, tr, li, angles)
            checks[skip] = float(c)
            fns[skip] = frames
    finally:
        rp.SAMPLE_SLAB_SKIP = orig
    res = {k: [] for k in fns}
    for rep in range(5):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            c = fn(obj, tr, li, angles)
            _ = float(c)
            res[k].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "scene": name,
        "checks_equal": checks[False] == checks[True],
        "ms_off": round(sorted(res[False])[2], 4),
        "ms_on": round(sorted(res[True])[2], 4),
    }), flush=True)
