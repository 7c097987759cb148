"""Probe: is the small-config 'floor' the amortized host fetch?

Hypothesis: measure_tpu_fps's per-frame number includes the tunnel's
fixed ~34 ms synchronized fetch divided by iters (60), i.e. a 0.57 ms
additive floor that swamps sub-ms frames (configs 1/3 at 512^2) and is
NOT renderer time. Test: same config, iters in {60, 240, 960}; if
ms/frame falls hyperbolically with iters toward an asymptote, the
asymptote is the true frame cost and the excess is fetch amortization.
Also fits (fixed, per_frame) from the two largest iters.
"""
import json
import time

import jax
import jax.numpy as jnp

from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes

print("device:", jax.devices()[0], flush=True)

for config, (h, w) in ((1, (512, 512)), (3, (512, 512)), (4, (1080, 1920))):
    scene_g, tr_d, li_d = scenes.baseline_scene(config, h, w)
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    objs = tuple(o for o, _ in scene_j)
    cfgs = tuple(c for _, c in scene_j)

    @jax.jit
    def frames(objs, transform, lights, angles):
        def body(carry, angle):
            a = angle + carry * jnp.float32(1e-30)
            spun = tuple(rotate_object(o, rotation_y(a)) for o in objs)
            fb = render_scene(
                None, list(zip(spun, cfgs)), transform, lights,
                backend="pallas", frame_height=h, frame_width=w,
            )
            check = jnp.sum(
                jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
            ) + (fb.color[13, 17] & 255).astype(jnp.float32)
            return carry + check * jnp.float32(1e-20), 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)

    out = {}
    for iters in (60, 240, 960):
        angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
        r = frames(objs, tr, li, angles)
        _ = float(r[0])  # compile+warm
        meds = []
        for _rep in range(3):
            t0 = time.perf_counter()
            r = frames(objs, tr, li, angles)
            _ = float(r[0])
            meds.append((time.perf_counter() - t0) / iters * 1e3)
        out[iters] = sorted(meds)[1]
    # Fit fixed + per_frame from the two largest points.
    a, b = out[240], out[960]
    per_frame = (960 * b - 240 * a) / (960 - 240)
    fixed = 240 * (a - per_frame)
    print(json.dumps({
        "config": config, "ms_per_frame_by_iters": out,
        "fit_fixed_ms": round(fixed, 2),
        "fit_per_frame_ms": round(per_frame, 4),
    }), flush=True)
