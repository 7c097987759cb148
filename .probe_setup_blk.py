"""Interleaved A/B: SETUP_BLK sweep for the fused setup kernel.

At 2M triangles the fused setup stage measures ~20.6 ms = ~10 us per
1024-triangle grid step, ~13x off its HBM write bound (~1.3 GB of
records+bbox per 2M frame) — so per-step overhead / sublane
underutilization, not bandwidth, is the suspect. This times
setup_records_fused ALONE in an in-graph scan at blk 1024/2048/4096.
One process, all variants compiled first, then alternating reps
(CLAUDE.md timing rules).
"""
import json
import time

import jax
import jax.numpy as jnp

from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid
from tpu_renderer.ops.setup_pallas import setup_records_fused

print("device:", jax.devices()[0], flush=True)
H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
cfg = ObjectConfig(phong=True)

BLKS = (1024, 2048, 4096)


def make_fn(blk):
    @jax.jit
    def run(obj, tr, li, angles):
        def body(carry, angle):
            spun = rotate_object(obj, rotation_y(angle + carry * jnp.float32(1e-30)))
            recs, bbox = setup_records_fused(
                spun, tr, li, cfg, 0, H, W, blk
            )
            check = jnp.sum(recs[:, 1]) + jnp.sum(bbox[1])
            return carry + check * jnp.float32(1e-20), 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)[0]
    return run


for lat, lon in ((1000, 1001), (1415, 1416)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    T = obj.num_triangles
    iters = max(6, min(24, 5_000_000 // T))
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks = {}, {}
    for blk in BLKS:
        fns[blk] = make_fn(blk)
        checks[blk] = float(fns[blk](obj, tr, li, angles))
    res = {b: [] for b in BLKS}
    for rep in range(5):
        for b in BLKS:
            t0 = time.perf_counter()
            _ = float(fns[b](obj, tr, li, angles))
            res[b].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "T": T,
        "checks_close": max(checks.values()) - min(checks.values()) < 1e-3,
        **{f"blk{b}_ms": round(sorted(v)[2], 2) for b, v in res.items()},
        "all": {str(b): [round(x, 1) for x in v] for b, v in res.items()},
    }), flush=True)
