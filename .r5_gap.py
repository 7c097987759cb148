"""Round-5 item 2: reconcile the 2M scan (70.2 ms) vs stage-sum (48.0 ms)
gap. One process, all variants compiled first, interleaved reps, medians.

Hypotheses probed:
  (a) run_scale's FIXED iters (10 at 2M, never time-targeted like
      measure_tpu_fps since r4) leaves the ~23-34 ms synchronized fetch
      + per-run fixed dispatch cost un-amortized: fit fixed+linear from
      scan lengths 10/30/60 — the SLOPE is the true per-frame cost.
  (b) the in-scan rotate_object of a 2M-vertex soup costs real ms the
      stage prefixes also pay (both rotate) — measured alone anyway.

Variants:
  full@10/30/60 : the exact _measure_scale_point body (render + checks)
  rot@30        : rotation-only body (consume the spun soup, no render)
"""
import json
import time

import jax
import jax.numpy as jnp

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

obj = jax.device_put(
    make_object((0.0, 0.0, 0.0), **construct_sphere_grid(1000, 1001))
)
print("T =", obj.num_triangles, flush=True)


@jax.jit
def full(obj, transform, lights, angles):
    def body(carry, angle):
        spun = rotate_object(
            obj, rotation_y(angle + carry * jnp.float32(1e-30))
        )
        stats = {}
        fb = render_scene(
            None, [(spun, cfg)], transform, lights, backend="pallas",
            frame_height=H, frame_width=W, stats=stats,
        )
        check = jnp.sum(
            jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
        ) + (fb.color[13, 17] & 255).astype(jnp.float32)
        covered = jnp.sum((fb.depth > -3.0e38).astype(jnp.int32))
        return (
            carry + check * jnp.float32(1e-20),
            (stats["bins_dropped"], covered),
        )
    return jax.lax.scan(body, jnp.float32(0.0), angles)


@jax.jit
def rot_only(obj, transform, lights, angles):
    def body(carry, angle):
        spun = rotate_object(
            obj, rotation_y(angle + carry * jnp.float32(1e-30))
        )
        # Consume every rotated array so nothing is dead-coded.
        check = (
            jnp.sum(spun.vertices * jnp.float32(1e-12))
            + jnp.sum(spun.normals * jnp.float32(1e-12))
        )
        return carry + check * jnp.float32(1e-20), 0
    return jax.lax.scan(body, jnp.float32(0.0), angles)


variants = {}
for n in (10, 30, 60):
    variants[f"full@{n}"] = (
        full, jnp.linspace(0.0, 0.6, n).astype(jnp.float32), n
    )
variants["rot@30"] = (
    rot_only, jnp.linspace(0.0, 0.6, 30).astype(jnp.float32), 30
)

# Compile + warm everything first.
for name, (fn, angles, n) in variants.items():
    out = fn(obj, tr, li, angles)
    _ = float(out[0])
    print("warm", name, flush=True)

res = {k: [] for k in variants}
for rep in range(5):
    for name, (fn, angles, n) in variants.items():
        t0 = time.perf_counter()
        out = fn(obj, tr, li, angles)
        _ = float(out[0])
        res[name].append((time.perf_counter() - t0) * 1e3)  # TOTAL ms

med = {k: sorted(v)[2] for k, v in res.items()}
per = {k: med[k] / variants[k][2] for k in variants}
# fixed + slope fit from the 10/60 pair (and 10/30 for a sanity check).
slope_1060 = (med["full@60"] - med["full@10"]) / 50.0
fixed_1060 = med["full@10"] - 10 * slope_1060
slope_1030 = (med["full@30"] - med["full@10"]) / 20.0
print(json.dumps({
    "total_ms": {k: round(v, 1) for k, v in med.items()},
    "per_frame_ms": {k: round(v, 2) for k, v in per.items()},
    "slope_ms_10_60": round(slope_1060, 2),
    "slope_ms_10_30": round(slope_1030, 2),
    "fixed_ms": round(fixed_1060, 1),
    "rot_per_frame_ms": round(per["rot@30"], 2),
}), flush=True)
