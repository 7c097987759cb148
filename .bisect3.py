import sys; sys.path.insert(0, "/root/repo")
import jax, time
import jax.numpy as jnp
from tpu_renderer.core.types import make_transform, make_lights, make_object, ObjectConfig
from tpu_renderer.geometry.transform import rotation_y, rotate_object
from tpu_renderer.geometry.vertex import setup_triangles
from tpu_renderer.ops.binning import bin_triangles_queue
from tpu_renderer.ops.raster_pallas import visibility_pass_queue, rasterize_pallas, TILE_H, TILE_W, QUEUE_BLK
from tpu_renderer.ops.resolve import resolve_gbuffer
from tpu_renderer.ops.shading import shade
from tpu_renderer.core.math import pack_argb
from tpu_renderer.models import scenes

h, w = 1080, 1920
NF = 20
scene_g, tr_d, li_d = scenes.baseline_scene(4, h, w)
scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
obj, cfg = scene_j[0]
obj = jax.device_put(obj)
angles = jnp.linspace(0.0, 1.0, NF).astype(jnp.float32)

def run_scan(stage):
    @jax.jit
    def fn(o, t, l, angles):
        def body(carry, angle):
            oo = rotate_object(o, rotation_y(angle + carry * jnp.float32(1e-30)))
            edges = setup_triangles(oo, t, l, cfg)
            if stage == "setup":
                return carry + jnp.sum(edges.x0) * 1e-20, 0
            qb = bin_triangles_queue(edges, h, w, TILE_H, TILE_W, QUEUE_BLK)
            if stage == "bin":
                return carry + jnp.sum(qb.counts).astype(jnp.float32) * 1e-20, 0
            z, idx = visibility_pass_queue(edges, qb, h, w)
            if stage == "visq":
                return carry + jnp.sum(jnp.maximum(idx, -1)).astype(jnp.float32) * 1e-20, 0
            if stage == "vis+large":
                covered, gbuf, st = rasterize_pallas(edges, h, w, None, None, None, 0, 0, "sorted")
                return carry + jnp.sum(gbuf[:,:,0]*0 + jnp.where(covered, 1.0, 0.0)) * 1e-20, 0
            covered, gbuf = resolve_gbuffer(edges, z, idx, h, w)
            if stage == "resolve":
                return carry + jnp.sum(gbuf[:,:,1]) * 1e-20, 0
            rgba, covered = shade(covered, gbuf, t, l, cfg, None, 0, 0)
            packed = pack_argb(rgba)
            return carry + (packed[0,0]&1).astype(jnp.float32)*1e-20 + jnp.sum(rgba)*1e-25, 0
        return jax.lax.scan(body, jnp.float32(0.0), angles)
    out = fn(obj, tr, li, angles); _ = float(out[0])
    t0 = time.perf_counter()
    out = fn(obj, tr, li, angles); _ = float(out[0])
    return (time.perf_counter()-t0)/NF*1000

for stage in ["setup", "bin", "visq", "vis+large", "resolve", "shade"]:
    print(f"{stage}: {run_scan(stage):.2f} ms/frame", flush=True)
