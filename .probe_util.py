"""One-frame stats probe: per-stream budget utilization + real entries
at 1M/2M dense Phong (informs PACK_ROWS_STREAM_FRAC tightening and the
gather budget's headroom). No timing — just render once and print stats.
"""
import json

import jax

import tpu_renderer.ops.raster_pallas as rp
from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid

H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
print("device:", jax.devices()[0], flush=True)

for lat, lon in ((1000, 1001), (1415, 1416)):
    obj = jax.device_put(
        make_object((0.0, 0.0, 0.0), **construct_sphere_grid(lat, lon))
    )
    cfg = ObjectConfig(phong=True)
    stats = {}
    fb = render_scene(
        None, [(obj, cfg)], tr, li, backend="pallas",
        frame_height=H, frame_width=W, stats=stats,
    )
    jax.block_until_ready(fb.depth)
    T = int(obj.num_triangles)
    print(json.dumps({
        "T": T,
        "real_entries": int(stats["bins_real_entries"]),
        "real_per_tri": round(int(stats["bins_real_entries"]) / T, 3),
        "max_stream_util": round(float(stats["bins_budget_utilization"]), 3),
        "budget_factor": stats["bins_budget_factor"],
        "dropped": int(stats["bins_dropped"]),
        "pack_rows": rp.PACK_ROWS,
        "stream_frac": rp.PACK_ROWS_STREAM_FRAC,
    }), flush=True)
