"""Interleaved A/B: (1) CHUNK_T 4/8/16 — stage-B chunk granularity of the
wide fold (8 shipped since round 1, never hardware-chosen); (2) the
calibrated entry budget's end-to-end value at 1M/2M (Renderer.calibrate
suggestion applied via budget_override vs policy default). Medians of 5,
drop-free, checks bit-equal (CHUNK_T) / coverage-equal (budget — same
values, different capacity).
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

print("device:", jax.devices()[0], flush=True)
_, tr_d, li_d = scenes.baseline_scene(4, 1080, 1920)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
cfg = ObjectConfig(phong=True)
H, W = 1080, 1920


def make_fn(budget=None):
    @jax.jit
    def frames(obj, transform, lights, angles):
        def body(carry, angle):
            spun = rotate_object(
                obj, rotation_y(angle + carry * jnp.float32(1e-30))
            )
            stats = {}
            fb = render_scene(
                None, [(spun, cfg)], transform, lights, backend="pallas",
                frame_height=H, frame_width=W, stats=stats,
                budget_override=budget,
            )
            check = jnp.sum(
                jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
            ) + (fb.color[13, 17] & 255).astype(jnp.float32)
            return carry + check * jnp.float32(1e-30), (
                stats["bins_dropped"], stats["bins_budget_utilization"]
            )
        c, (d, u) = jax.lax.scan(body, jnp.float32(0.0), angles)
        return c, jnp.max(d), jnp.max(u)
    return frames


for lat, lon, iters in ((707, 708, 10), (1000, 1001, 8)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)

    # --- CHUNK_T ---
    orig = rp.CHUNK_T
    fns, checks, drops, failed = {}, {}, {}, {}
    try:
        for ct in (4, 8, 16):
            rp.CHUNK_T = ct
            fn = make_fn()
            try:
                c, d, _u = fn(obj, tr, li, angles)
                checks[ct], drops[ct] = float(c), float(d)
                fns[ct] = fn
            except Exception as e:
                failed[ct] = repr(e)[:200]
    finally:
        rp.CHUNK_T = orig
    res = {k: [] for k in fns}
    for rep in range(5):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            c, _, _ = fn(obj, tr, li, angles)
            _ = float(c)
            res[k].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "probe": "CHUNK_T", "T": int(obj.num_triangles),
        "checks_equal": len(set(checks.values())) <= 1,
        "drops": {str(k): v for k, v in drops.items()},
        "ms": {str(k): round(sorted(v)[2], 2) for k, v in res.items()},
        "failed": failed,
    }), flush=True)

    # --- calibrated budget ---
    fn0 = make_fn(None)
    c0, d0, util = fn0(obj, tr, li, angles)
    # Suggestion formula mirrors Renderer.calibrate: policy * util * 1.25.
    sf = rp._rows_stream_budget_factor(int(obj.num_triangles), H, W)
    sugg = float(util) * 1.25 * sf  # per-stream realized * margin
    # budget_override is the PRE-frac factor: stream budget = ov * FRAC.
    ov = sugg / rp.PACK_ROWS_STREAM_FRAC
    fn1 = make_fn(ov)
    c1, d1, _ = fn1(obj, tr, li, angles)
    res = {"policy": [], "calibrated": []}
    for rep in range(5):
        for name, fn in (("policy", fn0), ("calibrated", fn1)):
            t0 = time.perf_counter()
            c, _, _ = fn(obj, tr, li, angles)
            _ = float(c)
            res[name].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "probe": "calibrated_budget", "T": int(obj.num_triangles),
        "override_prefrac": round(ov, 3), "util_at_policy": float(util),
        "checks_equal": float(c0) == float(c1),
        "drops": {"policy": float(d0), "calibrated": float(d1)},
        "ms": {k: round(sorted(v)[2], 2) for k, v in res.items()},
    }), flush=True)
