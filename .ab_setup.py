"""Interleaved A/B: fused Pallas setup vs XLA setup chain, real TPU (1M/2M)."""
import time, json
import jax, jax.numpy as jnp, numpy as np
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.geometry.transform import rotate_object, rotation_y
from tpu_renderer.geometry.vertex import setup_records
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid
from tpu_renderer.ops.raster_pallas import rasterize_pallas_shaded
from tpu_renderer.ops.setup_pallas import setup_for_raster

print("device:", jax.devices()[0], flush=True)
H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
cfg = ObjectConfig(phong=True)

def make_frames(obj, fused):
    @jax.jit
    def frames(obj, tr, li, angles):
        def body(carry, angle):
            spun = rotate_object(obj, rotation_y(angle + carry * jnp.float32(1e-30)))
            if fused:
                arg = setup_for_raster(spun, tr, li, cfg, frame_height=H, frame_width=W)
            else:
                arg = setup_records(spun, tr, li, cfg)
            cov, z, col, _ = rasterize_pallas_shaded(arg, tr, li, True, H, W)
            check = jnp.sum(jnp.where(cov, z, 0.0)) + (col[13, 17] & 255).astype(jnp.float32)
            return carry + check * jnp.float32(1e-20), 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)
    return frames

for lat, lon in ((708, 707), (1000, 1001)):
    mesh = construct_sphere_grid(lat, lon)
    obj = jax.device_put(make_object((0.0, 0.0, 0.0), **mesh))
    T = obj.num_triangles
    iters = max(8, min(30, 3_000_000 // T))
    angles = jnp.linspace(0.0, 0.6, iters).astype(jnp.float32)
    fns = {"fused": make_frames(obj, True), "xla": make_frames(obj, False)}
    for k, f in fns.items():
        _ = float(f(obj, tr, li, angles)[0])
    res = {k: [] for k in fns}
    for rep in range(5):
        for k, f in fns.items():
            t0 = time.perf_counter()
            _ = float(f(obj, tr, li, angles)[0])
            res[k].append((time.perf_counter() - t0) / iters * 1e3)
    print(json.dumps({"T": T, **{k: round(sorted(v)[len(v)//2], 2) for k, v in res.items()},
                      "all": {k: [round(x,1) for x in v] for k, v in res.items()}}), flush=True)
