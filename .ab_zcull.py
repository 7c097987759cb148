"""Interleaved A/B: ZCULL_BLOCKS off (shipped) vs on, 1080p Phong.

Scenes:
  - single: 2M-triangle sphere (single layer — the cull can never fire;
    measures pure overhead of the per-item bound+reduce).
  - stack6: six 350k-triangle spheres at staggered z, submitted
    FRONT-TO-BACK (the cull's best case: later spheres' blocks are
    fully occluded on covered tiles).
One process, compile all variants first, alternate reps, medians of 5.
Checks must be bit-equal (the skip is output-preserving by design).
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


def make_fn(scene_objs):
    cfgs = tuple(cfg for _ in scene_objs)

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


single = (jax.device_put(
    make_object((0.0, 0.0, 0.0), **construct_sphere_grid(1415, 1416))
),)
# Front-to-back stack: z DECREASES with submission order (larger camera-z
# = closer; reference convention). Slight xy jitter avoids exact
# coplanarity.
stack6 = tuple(
    jax.device_put(make_object(
        (0.02 * i, -0.015 * i, 0.9 - 0.35 * i),
        **construct_sphere_grid(418, 418),
    ))
    for i in range(6)
)

orig = rp.ZCULL_BLOCKS
for name, objs, iters in (("single_2m", single, 6), ("stack6_1m", stack6, 6)):
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks, drops = {}, {}, {}
    try:
        for zc in (False, True):
            rp.ZCULL_BLOCKS = zc
            fns[zc] = make_fn(objs)
            c, d = fns[zc](objs, tr, li, angles)
            checks[zc], drops[zc] = float(c), float(d)
    finally:
        rp.ZCULL_BLOCKS = orig
    res = {zc: [] for zc in fns}
    for rep in range(5):
        for zc in fns:
            t0 = time.perf_counter()
            c, _ = fns[zc](objs, tr, li, angles)
            _ = float(c)
            res[zc].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "scene": name,
        "T": sum(int(o.num_triangles) for o in objs),
        "checks_equal": checks[False] == checks[True],
        "drops": {str(k): v for k, v in drops.items()},
        "ms_off": round(sorted(res[False])[2], 2),
        "ms_on": round(sorted(res[True])[2], 2),
    }), flush=True)
