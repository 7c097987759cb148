"""Interleaved A/B: default budget vs one-frame CALIBRATED budget
(engine.calibrate_budget_factor) at 1M/2M triangles, 1080p Phong.

The calibration renders one frame, reads the realized max-stream budget
utilization, and suggests used_factor * util * margin. This probe
measures what the tightened budget is worth end-to-end (stream gather +
work-grid are budget-linear) and prints per-variant drops (a nonzero
disqualifies). One process, both variants compiled first, alternating
reps, medians of 5 (CLAUDE.md timing rules).
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.ops.raster_pallas as rp
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.engine.renderer import calibrate_budget_factor, \
    render_scene
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid

H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
print("device:", jax.devices()[0], flush=True)


def make_fn(cfg):
    @jax.jit
    def frames(obj, transform, lights, angles):
        def body(carry, angle):
            a = angle + carry * jnp.float32(1e-30)
            spun = rotate_object(obj, rotation_y(a))
            stats = {}
            fb = render_scene(
                None, [(spun, cfg)], transform, lights,
                backend="pallas", frame_height=H, frame_width=W,
                stats=stats,
            )
            check = jnp.sum(
                jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
            ) + (fb.color[13, 17] & 255).astype(jnp.float32)
            drops = stats["bins_dropped"].astype(jnp.float32)
            return carry + check * jnp.float32(1e-20), drops
        c, d = jax.lax.scan(body, jnp.float32(0.0), angles)
        return c, jnp.max(d)

    return frames


for lat, lon, iters in ((1000, 1001, 8), (1415, 1416, 5)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    cfg = ObjectConfig(phong=True)
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)

    # Calibrate on the worst probed rotation (entry demand moves a little
    # with the spin; margin 1.25 covers the rest).
    rp.BUDGET_FACTOR_OVERRIDE = None
    spun = rotate_object(obj, rotation_y(0.3))
    sugg = calibrate_budget_factor([(spun, cfg)], tr, li, H, W)
    stats = {}
    render_scene(None, [(spun, cfg)], tr, li, backend="pallas",
                 frame_height=H, frame_width=W, stats=stats)
    util = float(stats["bins_budget_utilization"])
    nreal = int(stats["bins_real_entries"])

    variants = {"default": None, "calibrated": sugg}
    fns, checks, drops = {}, {}, {}
    for name, ov in variants.items():
        rp.BUDGET_FACTOR_OVERRIDE = ov
        fns[name] = make_fn(cfg)
        c, d = fns[name](obj, tr, li, angles)
        checks[name], drops[name] = float(c), float(d)
    rp.BUDGET_FACTOR_OVERRIDE = None
    res = {name: [] for name in fns}
    for rep in range(5):
        for name in fns:
            t0 = time.perf_counter()
            c, d = fns[name](obj, tr, li, angles)
            _ = float(c)
            res[name].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "T": int(obj.num_triangles),
        "util": round(util, 4), "n_real": nreal,
        "suggested_override": round(sugg, 4),
        "checks_equal": len(set(checks.values())) == 1,
        "drops": drops,
        **{f"{n}_ms": round(sorted(v)[2], 2) for n, v in res.items()},
        "all": {n: [round(x, 1) for x in v] for n, v in res.items()},
    }), flush=True)
