"""Interleaved A/B: LARGE_LIST_SEARCHSORTED on/off (large-triangle side
list via cumsum+searchsorted vs the round-2 T-length scatter) at 1M and
2M triangles, 1080p Phong, end-to-end frames.

probe_sort measured scatter ~5.8 ns/elem on this chip, so the scatter
form should cost ~6 ms@1M / ~12 ms@2M of the binning stage for a
<= 2048-entry list. One process, both variants compiled first, then
alternating reps (CLAUDE.md timing rules).
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.ops.binning as binning
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid

H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
print("device:", jax.devices()[0], flush=True)


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
            return carry + check * jnp.float32(1e-20), 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)[0]

    return frames


for lat, lon, iters in ((1000, 1001, 8), (1415, 1416, 5)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    cfg = ObjectConfig(phong=True)
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks = {}, {}
    for ss in (False, True):
        binning.LARGE_LIST_SEARCHSORTED = ss
        fns[ss] = make_fn(obj, cfg)
        checks[ss] = float(fns[ss](obj, tr, li, angles))
    binning.LARGE_LIST_SEARCHSORTED = True
    res = {c: [] for c in fns}
    for rep in range(5):
        for c in fns:
            t0 = time.perf_counter()
            _ = float(fns[c](obj, tr, li, angles))
            res[c].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "T": int(obj.num_triangles),
        "checks_equal": len(set(checks.values())) == 1,
        "scatter_ms": round(sorted(res[False])[2], 2),
        "searchsorted_ms": round(sorted(res[True])[2], 2),
        "all_scatter": [round(x, 1) for x in res[False]],
        "all_searchsorted": [round(x, 1) for x in res[True]],
    }), flush=True)
