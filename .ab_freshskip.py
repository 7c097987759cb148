"""Interleaved A/B attributing the two round-3 sparse-scene changes on
hardware, config 4 (2.2k tris Phong 1080p) and config 1 (512p cube):

  a) old:   explicit framebuffer (clear + 3-plane merge) + every-tile visits
  b) merge: explicit framebuffer, empty-tile skip ON
  c) new:   fresh-frame path (no clear/merge) + empty-tile skip ON

(a-b) = empty-tile-skip win, (b-c) = clear+merge win. One process, all
arms compiled first, then alternating reps (CLAUDE.md timing rules).
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.ops.raster_pallas as rp
from tpu_renderer.core.types import make_framebuffer
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes

print("device:", jax.devices()[0], flush=True)

ARMS = (("old", True, False), ("merge", False, False),
        ("new", False, True))


def make_fn(scene_j, tr, li, h, w, fresh):
    cfgs = tuple(c for _, c in scene_j)
    objs = tuple(o for o, _ in scene_j)

    @jax.jit
    def frames(objs, transform, lights, angles):
        def body(carry, angle):
            a = angle + carry * jnp.float32(1e-30)
            spun = tuple(rotate_object(o, rotation_y(a)) for o in objs)
            fb = render_scene(
                None if fresh else make_framebuffer(h, w),
                list(zip(spun, cfgs)), transform, lights,
                backend="pallas", frame_height=h, frame_width=w,
            )
            check = jnp.sum(
                jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
            ) + (fb.color[13, 17] & 255).astype(jnp.float32)
            return carry + check * jnp.float32(1e-20), 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)[0]

    return frames, objs


for config, iters in ((4, 60), (1, 120)):
    h, w = (1080, 1920) if config >= 4 else (512, 512)
    sg, tr_d, li_d = scenes.baseline_scene(config, h, w)
    scene_j, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks = {}, {}
    for name, visit, fresh in ARMS:
        rp.VISIT_EMPTY_TILES = visit
        fn, objs = make_fn(scene_j, tr, li, h, w, fresh)
        checks[name] = float(fn(objs, tr, li, angles))
        fns[name] = (fn, objs)
    rp.VISIT_EMPTY_TILES = False
    res = {n: [] for n in fns}
    for rep in range(5):
        for n, (fn, objs) in fns.items():
            t0 = time.perf_counter()
            _ = float(fn(objs, tr, li, angles))
            res[n].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "config": config,
        "checks_equal": len(set(checks.values())) == 1,
        **{f"{n}_ms": round(sorted(r)[2], 2) for n, r in res.items()},
        "all": {n: [round(x, 2) for x in r] for n, r in res.items()},
    }), flush=True)
