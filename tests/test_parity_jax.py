"""Parity: JAX path (vertex stage + reference rasterizer + deferred shading)
vs the NumPy golden spec.

Parity bar (documented in golden/cpu_reference.py):
- edge tables: bit-exact
- coverage: bit-exact
- packed ARGB color: bit-exact up to a <=0.2% pixel budget
- depth: bit-exact on >=99.5% of covered pixels; remainder within 1e-4 rel

The non-exact budget exists solely because this XLA CPU build contracts
a + b*c into FMA (verified: no XLA flag disables it), giving <=1-ulp
interpolant differences that can flip a rounding decision exactly at a span
boundary or a depth tie. On identical-rounding backends the paths are
bit-identical by construction (same formulas, same op order).
"""

import jax
import numpy as np
import pytest

from tpu_renderer.core.types import make_framebuffer
from tpu_renderer.engine.renderer import render_object, render_scene
from tpu_renderer.geometry.vertex import setup_triangles
from tpu_renderer.golden import cpu_reference as gold
from tpu_renderer.models import scenes
from tpu_renderer.ops.raster_reference import rasterize_reference

F = np.float32

EDGE_FIELDS = [
    "valid", "ymin", "ymax", "x0", "xg", "z0", "zg", "oz0", "ozg",
    "u0", "ug", "v0", "vg", "left", "col0", "colg", "n0", "ng",
]


def build_case(config, h, w):
    scene_g, tr_d, li_d = scenes.baseline_scene(config, h, w)
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    return scene_g, tr_d, li_d, scene_j, tr, li


def assert_depth_parity(jd, gd, flip_budget=0.005):
    """Depth must be bit-exact or within ~1 ulp everywhere except a tiny
    budget of structural flips (a razor-edge boundary pixel covered by one
    path only, or a depth tie resolved to a different fragment) caused by
    XLA CPU's FMA contraction of interpolation math."""
    ok = (jd == gd) | np.isclose(jd, gd, rtol=1e-6, atol=0.0)
    frac = 1.0 - ok.mean()
    assert frac <= flip_budget, f"depth structural-flip fraction {frac:.4%}"


def assert_color_parity(jc, gc, budget=0.002):
    frac = 1.0 - (jc == gc).mean()
    assert frac <= budget, f"color mismatch fraction {frac:.4%}"


@pytest.mark.parametrize("config", [1, 2, 3, 4])
def test_edge_table_bit_exact(config):
    h = w = 128
    scene_g, tr_d, li_d, scene_j, tr, li = build_case(config, h, w)
    for (obj_d, cfg_d), (obj, cfg) in zip(scene_g, scene_j):
        ge = gold.setup_edges(
            obj_d, tr_d, li_d, phong=cfg.phong, textured=cfg.textured
        )
        je = setup_triangles(obj, tr, li, cfg)
        for f in EDGE_FIELDS:
            a = np.asarray(getattr(je, f))
            b = ge[f]
            if f == "valid":
                np.testing.assert_array_equal(a, b)
                continue
            m = ge["valid"]
            if a.ndim > 2:
                m = m[..., None]
            eq = (a == b) | (np.isnan(a) & np.isnan(b)) | ~np.broadcast_to(
                m, a.shape
            )
            assert eq.all(), f"config {config}: field {f} not bit-exact"


@pytest.mark.parametrize("config", [1, 2, 3, 4])
def test_raster_coverage_bit_exact(config):
    h = w = 128
    scene_g, tr_d, li_d, scene_j, tr, li = build_case(config, h, w)
    for (obj_d, cfg_d), (obj, cfg) in zip(scene_g, scene_j):
        ge = gold.setup_edges(
            obj_d, tr_d, li_d, phong=cfg.phong, textured=cfg.textured
        )
        gcov, _ = gold.rasterize(ge, h, w)
        je = setup_triangles(obj, tr, li, cfg)
        jcov, _ = jax.jit(rasterize_reference, static_argnums=(1, 2))(
            je, h, w
        )
        np.testing.assert_array_equal(np.asarray(jcov), gcov)


@pytest.mark.parametrize("config", [1, 2, 3, 4])
def test_end_to_end_parity(config):
    h = w = 128
    scene_g, tr_d, li_d, scene_j, tr, li = build_case(config, h, w)
    gc, gd = gold.render(scene_g, tr_d, li_d, h, w)
    fb = render_scene(make_framebuffer(h, w), scene_j, tr, li)
    assert_color_parity(np.asarray(fb.color), gc)
    assert_depth_parity(np.asarray(fb.depth), gd)


def test_multi_object_scene_parity():
    h = w = 128
    scene_g, tr_d, li_d, scene_j, tr, li = build_case(5, h, w)
    gc, gd = gold.render(scene_g, tr_d, li_d, h, w)
    fb = render_scene(make_framebuffer(h, w), scene_j, tr, li)
    assert_color_parity(np.asarray(fb.color), gc)
    assert_depth_parity(np.asarray(fb.depth), gd)
    # scene actually draws all objects
    assert (np.asarray(fb.depth) > gold.DEPTH_CLEAR).sum() > h * w * 0.3


def test_avx_uv_mode_parity():
    h = w = 128
    scene_g, tr_d, li_d = scenes.baseline_scene(3, h, w)
    for _, cfg in scene_g:
        cfg["uv_mode"] = "avx"
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    gc, gd = gold.render(scene_g, tr_d, li_d, h, w)
    fb = render_scene(make_framebuffer(h, w), scene_j, tr, li)
    assert_color_parity(np.asarray(fb.color), gc)
    assert_depth_parity(np.asarray(fb.depth), gd)
