import sys; sys.path.insert(0, "/root/repo")
import jax, time, functools
import jax.numpy as jnp
from tpu_renderer.core.types import make_transform, make_lights, make_object, ObjectConfig
from tpu_renderer.geometry.transform import rotation_y, rotate_object
from tpu_renderer.geometry.vertex import setup_triangles
from tpu_renderer.ops.raster_pallas import rasterize_pallas
from tpu_renderer.ops.resolve import resolve_gbuffer
from tpu_renderer.models import scenes

h, w = 1080, 1920
NF = 15
scene_g, tr_d, li_d = scenes.baseline_scene(4, h, w)
scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
obj, cfg = scene_j[0]
obj = jax.device_put(obj)
angles = jnp.linspace(0.0, 1.0, NF).astype(jnp.float32)

def run(row_block):
    @jax.jit
    def fn(o, t, l, angles):
        def body(carry, angle):
            oo = rotate_object(o, rotation_y(angle + carry * jnp.float32(1e-30)))
            edges = setup_triangles(oo, t, l, cfg)
            covered, gbuf, st = rasterize_pallas(edges, h, w)
            # re-resolve with the probe block size (rasterize_pallas used
            # default internally; measure the delta of a second resolve)
            return carry + jnp.sum(gbuf[:, :, 1]) * 1e-20, 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)
    out = fn(obj, tr, li, angles); _ = float(out[0])
    t0 = time.perf_counter()
    out = fn(obj, tr, li, angles); _ = float(out[0])
    return (time.perf_counter()-t0)/NF*1000

import tpu_renderer.ops.resolve as R
for rb in [32, 135, 540]:
    orig = R.resolve_gbuffer.__defaults__
    R.resolve_gbuffer.__defaults__ = (rb,) + orig[1:]
    print(f"row_block={rb}: {run(rb):.2f} ms/frame (full pipeline)", flush=True)
