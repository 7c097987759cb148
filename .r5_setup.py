"""Round-5 item 4: attribute the fused setup kernel's cost (7.5 ms @2M vs
~2.6 ms BW floor). Variants via setup_pallas._PROBE_EMIT (timing-only;
outputs wrong except 'rowmajor'):

  rowmajor     shipped: field math + (128, blk) transpose + row-major write
  rowmajor128  transpose in (128, 128) chunks instead of one (128, 1024)
  chanmajor    no transpose (channel-major write, same bytes)
  none         no record write (CAVEAT: attr-gradient math feeding only
               the record write gets dead-coded with it — this bounds the
               bbox+core-math floor, not full math)

Deltas: rowmajor - chanmajor = transpose; chanmajor - none = write + the
attr math 'none' dead-codes. Setup-only timing (consume recs + bbox),
interleaved in one process, medians of 5.
"""
import json
import time

import jax
import jax.numpy as jnp

import tpu_renderer.ops.setup_pallas as sp
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid

H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
print("device:", jax.devices()[0], flush=True)
cfg = ObjectConfig(phong=True)

ITERS = 30


def make_fn():
    @jax.jit
    def fn(obj, transform, lights, angles):
        def body(carry, angle):
            spun = rotate_object(
                obj, rotation_y(angle + carry * jnp.float32(1e-30))
            )
            recs, bbox = sp.setup_records_fused(
                spun, transform, lights, cfg, 0, H, W
            )
            check = jnp.sum(recs * jnp.float32(1e-12)) + sum(
                jnp.sum(b.astype(jnp.float32) * jnp.float32(1e-12))
                for b in bbox
            )
            return carry + check * jnp.float32(1e-20), 0
        c, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            jnp.linspace(0.0, 0.6, ITERS).astype(jnp.float32),
        )
        return c
    return fn


orig = sp._PROBE_EMIT
for lat, lon in ((707, 708), (1000, 1001)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    fns, failed = {}, {}
    try:
        for mode in ("rowmajor", "rowmajor128", "chanmajor", "none"):
            sp._PROBE_EMIT = mode
            fn = make_fn()
            try:
                _ = float(fn(obj, tr, li, None))
                fns[mode] = fn
            except Exception as e:
                failed[mode] = repr(e)[:200]
    finally:
        sp._PROBE_EMIT = orig
    res = {k: [] for k in fns}
    for rep in range(5):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            _ = float(fn(obj, tr, li, None))
            res[k].append((time.perf_counter() - t0) / ITERS * 1e3)
    print(json.dumps({
        "T": int(obj.num_triangles),
        "ms": {k: round(sorted(v)[2], 2) for k, v in res.items()},
        "failed": failed,
    }), flush=True)
