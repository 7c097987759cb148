"""Interleaved A/B: TEX_ROW_WINDOW 0 (full-atlas contraction, shipped r4)
vs 16/32 — windowed one-hot row contraction for in-kernel texturing
(VERDICT r4 item 5: config 3 beat the CPU by 0.00x; the contraction paid
the whole atlas row space per covered slab). Scenes: BASELINE config 3
(12-tri textured bilinear cube, 512^2) and a 250k-tri textured bilinear
sphere at 1080p. Medians of 5, checks bit-equal, drop-free.
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
from tpu_renderer.models.textures import checkerboard

print("device:", jax.devices()[0], flush=True)


def make_fn(scene_cfgs, H, W):
    objs = tuple(o for o, _ in scene_cfgs)
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
            ) + jnp.sum(
                (fb.color[::7, ::13] & 255).astype(jnp.float32)
            ) * jnp.float32(1e-6)
            return carry + check * jnp.float32(1e-20), stats["bins_dropped"]
        c, d = jax.lax.scan(body, jnp.float32(0.0), angles)
        return c, jnp.max(d)

    return frames


def scene_config3():
    H, W = 512, 512
    scene_g, tr_d, li_d = scenes.baseline_scene(3, H, W)
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    return scene_j, tr, li, H, W, 400


def scene_250k_tex():
    H, W = 1080, 1920
    _, tr_d, li_d = scenes.baseline_scene(4, H, W)
    _, tr, li = scenes.to_jax_scene([], tr_d, li_d)
    tex = checkerboard(128, 128, 16)
    obj = jax.device_put(make_object(
        (0.0, 0.0, 0.0), **construct_sphere_grid(354, 354), texture=tex,
    ))
    cfg = ObjectConfig(textured=True, filter_mode="bilinear")
    return [(obj, cfg)], tr, li, H, W, 30


orig = rp.TEX_ROW_WINDOW
for build, name in ((scene_config3, "config3"), (scene_250k_tex, "250k")):
    scene_j, tr, li, H, W, iters = build()
    objs = tuple(o for o, _ in scene_j)
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks, drops, failed = {}, {}, {}, {}
    try:
        for win in (0, 16, 32):
            rp.TEX_ROW_WINDOW = win
            fn = make_fn(scene_j, H, W)
            try:
                c, d = fn(objs, tr, li, angles)
                checks[win], drops[win] = float(c), float(d)
                fns[win] = fn
            except Exception as e:
                failed[win] = repr(e)[:300]
    finally:
        rp.TEX_ROW_WINDOW = orig
    res = {k: [] for k in fns}
    for rep in range(5):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            c, _ = fn(objs, tr, li, angles)
            _ = float(c)
            res[k].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "scene": name,
        "checks_equal": len(set(checks.values())) <= 1,
        "checks": {str(k): v for k, v in checks.items()},
        "drops": {str(k): v for k, v in drops.items()},
        "ms": {str(k): round(sorted(v)[2], 3) for k, v in res.items()},
        "failed": failed,
    }), flush=True)
