"""One-frame stats probe: per-stream budget utilization + real entries
at 1M/2M dense Phong (informs PACK_ROWS_STREAM_FRAC tightening and the
gather budget's headroom). No timing — one jitted render per scale
(eager dispatch through the tunnel is pathological, hence the jit).
"""
import json

import jax
import jax.numpy as jnp

import tpu_renderer.ops.raster_pallas as rp
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid

H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
print("device:", jax.devices()[0], flush=True)
cfg = ObjectConfig(phong=True)


@jax.jit
def one(obj, transform, lights):
    stats = {}
    fb = render_scene(
        None, [(obj, cfg)], transform, lights, backend="pallas",
        frame_height=H, frame_width=W, stats=stats,
    )
    return (
        jnp.sum(jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)),
        stats["bins_real_entries"],
        stats["bins_budget_utilization"],
        stats["bins_dropped"],
    )


for lat, lon in ((420, 420), (500, 500), (594, 595), (707, 708), (1000, 1001), (1415, 1416)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    chk, real, util, drop = one(obj, tr, li)
    T = int(obj.num_triangles)
    print(json.dumps({
        "T": T,
        "real_entries": int(real),
        "real_per_tri": round(int(real) / T, 3),
        "max_stream_util": round(float(util), 3),
        "dropped": int(drop),
        "pack_rows": rp.PACK_ROWS,
        "stream_frac": rp.PACK_ROWS_STREAM_FRAC,
    }), flush=True)
