"""Interleaved A/B: PACK_ROWS 2 (shipped) vs 4 (quarter strips) at
500k/1M/2M triangles, 1080p Phong, end-to-end frames.

rows=4 shares every stage-B (C, R, W) fragment op across 4 entries on
disjoint 2-row strips (the fold ALU is the raster stage's floor), at the
price of 4 stream sorts instead of 2 (each still 2T keys — one strip per
tile per parity keeps the packed u32 key at the unsplit tile count) and
~1/2 the per-stream budget. Drops printed per variant; nonzero
disqualifies. One process, compile all, alternate reps, medians of 5.
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


ROWS = (2, 4)
orig = rp.PACK_ROWS
for lat, lon, iters in ((500, 500, 10), (1000, 1001, 8), (1415, 1416, 5)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    cfg = ObjectConfig(phong=True)
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks, drops = {}, {}, {}
    try:
        for rows in ROWS:
            rp.PACK_ROWS = rows
            fns[rows] = make_fn(cfg)
            c, d = fns[rows](obj, tr, li, angles)
            checks[rows], drops[rows] = float(c), float(d)
    finally:
        rp.PACK_ROWS = orig
    res = {rows: [] for rows in fns}
    for rep in range(5):
        for rows in fns:
            t0 = time.perf_counter()
            c, d = fns[rows](obj, tr, li, angles)
            _ = float(c)
            res[rows].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "T": int(obj.num_triangles),
        "checks_equal": len(set(checks.values())) == 1,
        "drops": {str(k): v for k, v in drops.items()},
        **{f"rows{k}_ms": round(sorted(v)[2], 2) for k, v in res.items()},
        "all": {str(k): [round(x, 1) for x in v] for k, v in res.items()},
    }), flush=True)
