"""Probe: interleaved A/B of PACK_SPLIT 1 (single 128-col bin),
2 (dual 64-col), 4 (quad 32-col), 8 (octal 16-col) at 1M and 2M
triangles, 1080p Phong. One process, all variants compiled first, then
alternating reps (CLAUDE.md timing rules).
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

SPLITS = (2, 1, 4, 8)


def make_fn(obj, cfg):
    @jax.jit
    def frames(obj, transform, lights, angles):
        def body(carry, angle):
            a = angle + carry * jnp.float32(1e-30)
            spun = rotate_object(obj, rotation_y(a))
            fb = render_scene(
                make_framebuffer(H, W), [(spun, cfg)], transform, lights,
                backend="pallas",
            )
            check = jnp.sum(
                jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
            ) + (fb.color[13, 17] & 255).astype(jnp.float32)
            return carry + check * jnp.float32(1e-20), 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)[0]

    return frames


for lat, lon, iters in ((708, 707, 10), (1000, 1001, 6)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    cfg = ObjectConfig(phong=True)
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks = {}, {}
    for split in SPLITS:
        rp.PACK_SPLIT = split
        fns[split] = make_fn(obj, cfg)
        checks[split] = float(fns[split](obj, tr, li, angles))  # compile
    res = {s: [] for s in SPLITS}
    for rep in range(5):
        for split in SPLITS:
            t0 = time.perf_counter()
            _ = float(fns[split](obj, tr, li, angles))
            res[split].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "T": int(obj.num_triangles),
        "checks_equal": len(set(checks.values())) == 1,
        **{f"split{s}_ms": round(sorted(res[s])[2], 2) for s in SPLITS},
        **{f"all_split{s}": [round(x, 1) for x in res[s]] for s in SPLITS},
    }), flush=True)
