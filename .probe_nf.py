"""Probe: stage breakdown at 1M tris for Phong (nf=7) vs Gouraud (nf=4).

The raster_ms delta across the two configs isolates the per-field cost of
the stage-B attribute fold — the decision input for the fragment-rate work
(dual 64-col tile packing vs z-first winner resolve). One process, same
scene, so deltas are trustworthy (CLAUDE.md timing rules).
"""
import json

import jax

from tpu_renderer.core.types import ObjectConfig, make_object
from tpu_renderer.models import scenes
from tpu_renderer.models.primitives import construct_sphere_grid
from tpu_renderer.utils.profiling import stage_breakdown

H, W = 1080, 1920
_, tr_d, li_d = scenes.baseline_scene(4, H, W)
_, tr, li = scenes.to_jax_scene([], tr_d, li_d)
obj = jax.device_put(
    make_object((0.0, 0.0, 0.0), **construct_sphere_grid(1000, 1001))
)
print("device:", jax.devices()[0], "T:", obj.num_triangles, flush=True)
for name, cfg in (
    ("phong_nf7", ObjectConfig(phong=True)),
    ("gouraud_nf4", ObjectConfig()),
):
    bd = stage_breakdown(obj, cfg, tr, li, H, W)
    print(json.dumps({"cfg": name, **{
        k: (round(v, 2) if isinstance(v, float) else v)
        for k, v in bd.items()
    }}), flush=True)
