"""Interleaved A/B: FOLD_DEFERRED off/on at 1M and 2M triangles, 1080p
Phong, end-to-end frames — under BOTH the current split default and the
(8, 'repeat') candidate, since the deferred fold changes the per-chunk
op mix that the split decision was tuned on.

The deferred form folds only z + the winning slot index per chunk, then
selects that slot's (left, inc) span values with one shared slot-select
tree and evaluates each attribute once — replacing 2*nf per-slot
fragment evals + nf*CHUNK_T fold selects with ~2*nf tree selects + nf
evals (~20-30%% fewer stage-B vector ops at nf=7). Whether the extra
live planes (slot index + select masks) cost more than the saved ops is
a hardware question. Bit-exact either way (tests/test_wide_kernel.py).

One process, all variants compiled first, then alternating reps
(CLAUDE.md timing rules).
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

# (PACK_SPLIT, SPLIT_MERGE, FOLD_DEFERRED); the first pair uses the
# module defaults for split/merge so the probe stays meaningful after
# the ab_split decision is applied. 'repeat' merge fails Mosaic
# compilation on real TPU (.ab_split.py round 3), so only tree arms.
DEF_SPLIT, DEF_MERGE = rp.PACK_SPLIT, rp.SPLIT_MERGE
VARIANTS = tuple(
    dict.fromkeys(
        [
            (DEF_SPLIT, DEF_MERGE, False),
            (DEF_SPLIT, DEF_MERGE, True),
            (2, "tree", True),
        ]
    )
)


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
    fns, checks, failed = {}, {}, []
    for split, merge, deferred in VARIANTS:
        rp.PACK_SPLIT, rp.SPLIT_MERGE, rp.FOLD_DEFERRED = (
            split, merge, deferred,
        )
        try:
            fn = make_fn(obj, cfg)
            checks[(split, merge, deferred)] = float(
                fn(obj, tr, li, angles)
            )
            fns[(split, merge, deferred)] = fn
        except Exception as e:
            failed.append(f"{split}/{merge}/{deferred}: {type(e).__name__}")
    rp.PACK_SPLIT, rp.SPLIT_MERGE, rp.FOLD_DEFERRED = (
        DEF_SPLIT, DEF_MERGE, False,
    )
    res = {v: [] for v in fns}
    for rep in range(5):
        for v in fns:
            t0 = time.perf_counter()
            _ = float(fns[v](obj, tr, li, angles))
            res[v].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "T": int(obj.num_triangles),
        "checks_equal": len(set(checks.values())) == 1,
        "failed": failed,
        **{f"s{s}_{m}_d{int(d)}_ms": round(sorted(r)[2], 2)
           for (s, m, d), r in res.items()},
        "all": {f"s{s}_{m}_d{int(d)}": [round(x, 1) for x in r]
                for (s, m, d), r in res.items()},
    }), flush=True)
