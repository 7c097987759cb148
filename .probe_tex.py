"""Config-3 cost anatomy: where do ~2 ms/frame go at 12 triangles, 512^2?

Variants timed in ONE process (interleaved, medians of 5, 960-frame
chained scans so the ~34 ms fetch is noise):
  gouraud   — same cube, no texture (the non-texture baseline)
  nearest   — textured, nearest filter (one atlas sample, no lerp)
  bilinear  — the shipped config-3 contract (4 samples + 2 lerps)
  big_tex   — bilinear with a 128x128 texture (one-hot width scaling)
Prints per-frame ms; deltas attribute the texture machinery's cost.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_cube
from tpu_renderer.models.textures import checkerboard

H = W = 512
_, tr_d, li_d = scenes.baseline_scene(3, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
print("device:", jax.devices()[0], flush=True)

mesh = construct_cube()
ITERS = 960


def make_fn(texture, filt):
    tex = jnp.asarray(texture) if texture is not None else None
    obj = jax.device_put(make_object((0.0, 0.0, 0.0), **mesh, texture=tex))
    cfg = (ObjectConfig(textured=True, filter_mode=filt)
           if tex is not None else ObjectConfig())

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
        return jax.lax.scan(body, jnp.float32(0.0), angles)

    return obj, frames


VARIANTS = {
    "gouraud": (None, None),
    "nearest": (checkerboard(64, 64, 8), "nearest"),
    "bilinear": (checkerboard(64, 64, 8), "bilinear"),
    "big_tex": (checkerboard(128, 128, 16), "bilinear"),
}
angles = jnp.linspace(0.0, 0.6, ITERS).astype(jnp.float32)
fns = {}
for name, (tex, filt) in VARIANTS.items():
    obj, fn = make_fn(tex, filt)
    fns[name] = (obj, fn)
    c, _ = fn(obj, tr, li, angles)
    _ = float(c)  # compile + warm
res = {name: [] for name in fns}
for rep in range(5):
    for name, (obj, fn) in fns.items():
        t0 = time.perf_counter()
        c, _ = fn(obj, tr, li, angles)
        _ = float(c)
        res[name].append((time.perf_counter() - t0) / ITERS * 1e3)
print(json.dumps({
    name: round(sorted(v)[2], 4) for name, v in res.items()
}), flush=True)
