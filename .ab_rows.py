"""Probe: interleaved A/B of PACK_ROWS 1 vs 2 (row packing: 4-row strip
bins, two entries per chunk slot on disjoint sublane halves) at 500k, 1M
and 2M triangles, 1080p Phong. One process, both variants compiled
first, then alternating reps (CLAUDE.md timing rules). Also reports the
real entry count + drops per variant straight from bin_triangles_queue
(budget calibration: row packing adds strip-boundary straddles).
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.ops.raster_pallas as rp
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.geometry.vertex import setup_records
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid
from tpu_renderer.ops.binning import bin_triangles_queue, triangle_bbox_rows

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
            return carry + check * jnp.float32(1e-30), 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)[0]

    return frames


import functools


@functools.partial(jax.jit, static_argnums=(1, 2))
def entry_stats(rec_t, row_split, budget_factor):
    bbox = triangle_bbox_rows(rec_t, H, W)
    q = bin_triangles_queue(
        None, H, W, 8, 128, rp.WIDE_BLK, expansion=4,
        budget_factor=budget_factor, bbox=bbox, frame_height=H,
        frame_width=W, row_split=row_split,
    )
    return (jnp.sum(q.counts), q.n_large, q.n_dropped)


rp.PACK_ROWS_MAX_PX_PER_TRI = 10 ** 9  # probe every scale point
cfg = ObjectConfig(phong=True)

for lat, lon, iters in ((500, 500, 14), (708, 707, 10), (1000, 1001, 6)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)

    # Entry statistics (real entries/triangle, side-list size, drops) at
    # a generous budget so nothing clips the counts.
    rec_t = setup_records(obj, tr, li, cfg)
    stats = {}
    for rs in (1, 2):
        n, nl, nd = entry_stats(rec_t, rs, 3.9)
        stats[rs] = (int(n), int(nl), int(nd))

    fns, checks = {}, {}
    for rows in (1, 2):
        rp.PACK_ROWS = rows
        fn = make_fn(obj, cfg)
        checks[rows] = float(fn(obj, tr, li, angles))
        fns[rows] = fn
    rp.PACK_ROWS = 1
    res = {v: [] for v in fns}
    for rep in range(5):
        for v in fns:
            t0 = time.perf_counter()
            _ = float(fns[v](obj, tr, li, angles))
            res[v].append((time.perf_counter() - t0) / iters * 1e3)
    T = int(obj.num_triangles)
    print(json.dumps({
        "T": T,
        "checks_equal": len(set(checks.values())) == 1,
        "entries_per_tri": {
            rs: round(s[0] / T, 3) for rs, s in stats.items()
        },
        "n_large": {rs: s[1] for rs, s in stats.items()},
        "n_dropped": {rs: s[2] for rs, s in stats.items()},
        **{f"rows{v}_ms": round(sorted(r)[2], 2) for v, r in res.items()},
        "all": {f"rows{v}": [round(x, 1) for x in r]
                for v, r in res.items()},
    }), flush=True)
