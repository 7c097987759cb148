"""Interleaved A/B: rotate_object 'matmul' (r1-4) vs 'elementwise' (r5).
The gap probe caught the per-frame soup rotation at 13.9 ms @2M tris —
an M=3/K=3 matmul lowering pathologically on the MXU. Measures
rotation-only at 2M and the full pipeline at 1M (headline impact).
Values differ by design (different f32 reduction order on rotated
coordinates), so the check compares COVERAGE counts, not bit-equality;
drop-free still required.
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.geometry.transform as gt
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid

print("device:", jax.devices()[0], flush=True)
_, tr_d, li_d = scenes.baseline_scene(4, 1080, 1920)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
cfg = ObjectConfig(phong=True)


def make_rotonly():
    @jax.jit
    def fn(obj, angles):
        def body(carry, angle):
            spun = gt.rotate_object(
                obj, gt.rotation_y(angle + carry * jnp.float32(1e-30))
            )
            check = (
                jnp.sum(spun.vertices * jnp.float32(1e-12))
                + jnp.sum(spun.normals * jnp.float32(1e-12))
            )
            return carry + check * jnp.float32(1e-20), 0
        c, _ = jax.lax.scan(body, jnp.float32(0.0), angles)
        return c
    return fn


def make_full(H, W):
    @jax.jit
    def fn(obj, transform, lights, angles):
        def body(carry, angle):
            spun = gt.rotate_object(
                obj, gt.rotation_y(angle + carry * jnp.float32(1e-30))
            )
            stats = {}
            fb = render_scene(
                None, [(spun, cfg)], transform, lights, backend="pallas",
                frame_height=H, frame_width=W, stats=stats,
            )
            check = jnp.sum(
                jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
            )
            covered = jnp.sum((fb.depth > -3.0e38).astype(jnp.int32))
            return (
                carry + check * jnp.float32(1e-20),
                (stats["bins_dropped"], covered),
            )
        c, (d, cov) = jax.lax.scan(body, jnp.float32(0.0), angles)
        return c, jnp.max(d), cov[-1]
    return fn


orig = gt.ROTATE_FORM
probes = []
obj2m = jax.device_put(
    make_object((0.0, 0.0, 0.0), **construct_sphere_grid(1000, 1001))
)
obj1m = jax.device_put(
    make_object((0.0, 0.0, 0.0), **construct_sphere_grid(707, 708))
)

# rotation-only @2M
iters = 30
angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
fns = {}
try:
    for form in ("matmul", "elementwise"):
        gt.ROTATE_FORM = form
        fn = make_rotonly()
        _ = float(fn(obj2m, angles))
        fns[form] = fn
finally:
    gt.ROTATE_FORM = orig
res = {k: [] for k in fns}
for rep in range(5):
    for k, fn in fns.items():
        t0 = time.perf_counter()
        _ = float(fn(obj2m, angles))
        res[k].append((time.perf_counter() - t0) / iters * 1e3)
print(json.dumps({
    "probe": "rot_only@2M",
    "ms": {k: round(sorted(v)[2], 2) for k, v in res.items()},
}), flush=True)

# full pipeline @1M (headline scene shape)
iters = 12
angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
fns, drops, covs = {}, {}, {}
try:
    for form in ("matmul", "elementwise"):
        gt.ROTATE_FORM = form
        fn = make_full(1080, 1920)
        c, d, cov = fn(obj1m, tr, li, angles)
        drops[form], covs[form] = float(d), int(cov)
        fns[form] = fn
finally:
    gt.ROTATE_FORM = orig
res = {k: [] for k in fns}
for rep in range(5):
    for k, fn in fns.items():
        t0 = time.perf_counter()
        c, _, _ = fn(obj1m, tr, li, angles)
        _ = float(c)
        res[k].append((time.perf_counter() - t0) / iters * 1e3)
print(json.dumps({
    "probe": "full@1M",
    "ms": {k: round(sorted(v)[2], 2) for k, v in res.items()},
    "drops": drops,
    "covered": covs,
}), flush=True)
