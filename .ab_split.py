"""Probe: interleaved A/B of (PACK_SPLIT, SPLIT_MERGE) variants at 1M
and 2M triangles, 1080p Phong — splits 1/2/4/8 under the lane-select
'tree' merge, and 4/8/16 under the 'repeat' merge (minor-stack + lane
repeat; wins only if Mosaic lowers jnp.repeat as a shuffle rather than a
gather). One process, all variants compiled first, then alternating reps
(CLAUDE.md timing rules). A variant whose compile FAILS (Mosaic may
reject the repeat lowering) is reported and skipped, not fatal.
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.ops.raster_pallas as rp
from tpu_renderer.core.types import ObjectConfig, make_framebuffer, \
    make_object
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid

H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
print("device:", jax.devices()[0], flush=True)

VARIANTS = (
    (2, "tree"), (1, "tree"), (4, "tree"), (8, "tree"),
    (4, "repeat"), (8, "repeat"), (16, "repeat"),
)


def make_fn(obj, cfg):
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
            ) + (fb.color[13, 17] & 255).astype(jnp.float32)
            return carry + check * jnp.float32(1e-30), 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)[0]

    return frames


for lat, lon, iters in ((708, 707, 10), (1000, 1001, 6)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    cfg = ObjectConfig(phong=True)
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks, failed = {}, {}, []
    for split, merge in VARIANTS:
        rp.PACK_SPLIT, rp.SPLIT_MERGE = split, merge
        try:
            fn = make_fn(obj, cfg)
            checks[(split, merge)] = float(fn(obj, tr, li, angles))
            fns[(split, merge)] = fn
        except Exception as e:  # compile failure: report, keep going
            failed.append(f"{split}/{merge}: {type(e).__name__}")
    rp.PACK_SPLIT, rp.SPLIT_MERGE = 2, "tree"
    res = {v: [] for v in fns}
    for rep in range(5):
        for v in fns:
            t0 = time.perf_counter()
            _ = float(fns[v](obj, tr, li, angles))
            res[v].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "T": int(obj.num_triangles),
        "checks_equal": len(set(checks.values())) == 1,
        "failed": failed,
        **{f"s{s}_{m}_ms": round(sorted(r)[2], 2)
           for (s, m), r in res.items()},
        "all": {f"s{s}_{m}": [round(x, 1) for x in r]
                for (s, m), r in res.items()},
    }), flush=True)
