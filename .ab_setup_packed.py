"""Interleaved A/B: SETUP_PACKED off/on — the fused setup kernel's field
math on flat (3, blk) vectors (3/8 sublane utilization) vs sublane-packed
(3, 8, blk/8) blocks (full vregs, zero relayout by construction). Times
setup_records_fused ALONE in an in-graph scan at 1M and 2M triangles,
plus one end-to-end frame loop at 2M. Bit-identical outputs
(tests/test_setup_fused.py::test_setup_packed_bit_exact). One process,
all variants compiled first, then alternating reps (CLAUDE.md rules).
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.ops.setup_pallas as sp
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid

H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
cfg = ObjectConfig(phong=True)
print("device:", jax.devices()[0], flush=True)


def make_setup_only(obj):
    @jax.jit
    def fn(obj, tr, li, angles):
        def body(carry, angle):
            spun = rotate_object(
                obj, rotation_y(angle + carry * jnp.float32(1e-30))
            )
            recs, bbox = sp.setup_records_fused(
                spun, tr, li, cfg, 0, H, W, sp.SETUP_BLK
            )
            check = jnp.sum(recs[:, 5]) + jnp.sum(bbox[1])
            return carry + check * jnp.float32(1e-20), 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)[0]

    return fn


def make_e2e(obj):
    @jax.jit
    def fn(obj, tr, li, angles):
        def body(carry, angle):
            spun = rotate_object(
                obj, rotation_y(angle + carry * jnp.float32(1e-30))
            )
            fb = render_scene(
                None, [(spun, cfg)], tr, li, backend="pallas",
                frame_height=H, frame_width=W,
            )
            check = jnp.sum(
                jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
            ) + (fb.color[13, 17] & 255).astype(jnp.float32)
            return carry + check * jnp.float32(1e-20), 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)[0]

    return fn


for label, maker, lat, lon, iters in (
    ("setup_1m", make_setup_only, 708, 707, 20),
    ("setup_2m", make_setup_only, 1000, 1001, 12),
    ("e2e_2m", make_e2e, 1000, 1001, 6),
):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns, checks = {}, {}
    for packed in (False, True):
        sp.SETUP_PACKED = packed
        fns[packed] = maker(obj)
        checks[packed] = float(fns[packed](obj, tr, li, angles))
    sp.SETUP_PACKED = False
    res = {p: [] for p in fns}
    for rep in range(5):
        for p in fns:
            t0 = time.perf_counter()
            _ = float(fns[p](obj, tr, li, angles))
            res[p].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({
        "bench": label,
        "T": int(obj.num_triangles),
        "checks_equal": len(set(checks.values())) == 1,
        "flat_ms": round(sorted(res[False])[2], 2),
        "packed_ms": round(sorted(res[True])[2], 2),
        "all_flat": [round(x, 2) for x in res[False]],
        "all_packed": [round(x, 2) for x in res[True]],
    }), flush=True)
