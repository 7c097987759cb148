"""Batched multi-object scene kernel (ONE pallas launch per frame).

The whole-scene fused path (engine.renderer._render_scene_batched +
ops.raster_pallas.rasterize_scene_shaded) must be bit-identical to the
sequential per-object path — same interpolation (shared records), same
submission-order depth-tie rule (global gids = concat order), same shading
(per-pixel object select from static gid ranges commutes with the masked
formulas).
"""

import jax
import numpy as np
import pytest

from tpu_renderer.core.types import make_framebuffer
from tpu_renderer.engine.renderer import (
    _scene_batchable,
    render_object,
    render_scene,
)
from tpu_renderer.golden import cpu_reference as gold
from tpu_renderer.models import scenes
from tpu_renderer.models.textures import checkerboard

F = np.float32
H, W = 96, 128


def _per_object(scene_j, tr, li):
    fb = make_framebuffer(H, W)
    for obj, cfg in scene_j:
        fb = render_object(fb, obj, tr, li, cfg, backend="pallas")
    return fb


def _assert_bit_equal(fb_a, fb_b):
    np.testing.assert_array_equal(
        np.asarray(fb_a.color), np.asarray(fb_b.color)
    )
    np.testing.assert_array_equal(
        np.asarray(fb_a.depth), np.asarray(fb_b.depth)
    )


def test_batched_matches_per_object_config5():
    sg, tr_d, li_d = scenes.baseline_scene(5, H, W)
    scene_j, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
    assert _scene_batchable(scene_j)
    fb_b = render_scene(
        make_framebuffer(H, W), scene_j, tr, li, backend="pallas"
    )
    _assert_bit_equal(fb_b, _per_object(scene_j, tr, li))


def test_batched_matches_golden_config5():
    sg, tr_d, li_d = scenes.baseline_scene(5, H, W)
    scene_j, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
    fb = render_scene(
        make_framebuffer(H, W), scene_j, tr, li, backend="pallas"
    )
    gc, gd = gold.render(sg, tr_d, li_d, H, W)
    # CPU backend is IEEE like the golden: exact agreement expected off-TPU
    assert (np.asarray(fb.color) == gc).mean() > 0.999


def _two_texture_scene():
    """Two textured quads with DIFFERENT textures (atlas has 2 entries,
    different sizes so the column padding path runs) + one phong sphere."""
    sg, tr_d, li_d = scenes.baseline_scene(5, H, W)
    quad_lo = dict(sg[3][0])
    quad_hi = dict(sg[3][0])
    quad_hi["p"] = (0.1, 0.2, -0.5)
    sph = sg[0]
    scene_g = [
        (quad_lo, {"texture": checkerboard(32, 64, 4)}),
        (quad_hi, {"texture": checkerboard(16, 16, 2)}),
        sph,
    ]
    return scene_g, tr_d, li_d


def test_batched_multi_texture_atlas():
    scene_g, tr_d, li_d = _two_texture_scene()
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    assert _scene_batchable(scene_j)
    fb_b = render_scene(
        make_framebuffer(H, W), scene_j, tr, li, backend="pallas"
    )
    _assert_bit_equal(fb_b, _per_object(scene_j, tr, li))


@pytest.mark.parametrize("strategy", ["mask", "sorted"])
def test_batched_strategies_agree(strategy):
    """Both binning strategies drive the scene kernel identically."""
    from tpu_renderer.geometry.vertex import concat_edge_tables, setup_triangles
    from tpu_renderer.ops.raster_pallas import (
        ObjSpec,
        pack_texture_atlas,
        rasterize_scene_shaded,
    )

    sg, tr_d, li_d = scenes.baseline_scene(5, H, W)
    scene_j, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
    tables, objspecs, gid = [], [], 0
    textures = []
    for obj, cfg in scene_j:
        t = setup_triangles(obj, tr, li, cfg)
        tex = None
        if cfg.textured:
            tex = (
                sum(int(x.shape[0]) for x in textures),
                int(obj.texture.shape[0]),
                int(obj.texture.shape[1]),
            )
            textures.append(obj.texture)
        objspecs.append(ObjSpec(gid, gid + t.num_triangles, cfg.phong, tex))
        tables.append(t)
        gid += t.num_triangles
    atlas, _ = pack_texture_atlas(textures) if textures else (None, [])
    edges = concat_edge_tables(tables)
    covered, z, color, stats = rasterize_scene_shaded(
        edges, tuple(objspecs), tr, li, H, W, strategy=strategy,
        atlas=atlas,
    )
    fb_ref = _per_object(scene_j, tr, li)
    win = np.asarray(covered)
    np.testing.assert_array_equal(
        np.where(win, np.asarray(color), 0), np.asarray(fb_ref.color)
    )
    assert int(stats["bins_dropped"]) == 0


def test_cross_object_depth_tie_first_object_wins():
    """Two coplanar quads at the SAME depth: the first-submitted object owns
    every tied pixel (scene-global submission order = concat order)."""
    from tpu_renderer.models.primitives import construct_quad

    q = construct_quad(1.5)
    red = dict(p=(0.0, 0.0, 0.0), **q)
    red["colors"] = np.tile(np.float32([1, 0, 0, 1]), (len(q["vertices"]), 1))
    blue = dict(p=(0.0, 0.0, 0.0), **q)
    blue["colors"] = np.tile(np.float32([0, 0, 1, 1]), (len(q["vertices"]), 1))
    tr_d = scenes.camera_for(H, W)
    li_d = scenes.default_lights()
    scene_j, tr, li = scenes.to_jax_scene(
        [(red, {}), (blue, {})], tr_d, li_d
    )
    fb_b = render_scene(
        make_framebuffer(H, W), scene_j, tr, li, backend="pallas"
    )
    fb_s = _per_object(scene_j, tr, li)
    _assert_bit_equal(fb_b, fb_s)
    # tied pixels must be red-dominant (first object), never blue-dominant
    col = np.asarray(fb_b.color)
    covered = np.asarray(fb_b.depth) > gold.DEPTH_CLEAR
    r = (col[covered] >> 16) & 0xFF
    b = col[covered] & 0xFF
    assert covered.any() and (r >= b).all()


@pytest.mark.parametrize("config", [1, 4, 5])
def test_fresh_framebuffer_path_bit_exact(config):
    """render_scene(framebuffer=None) must bit-match rendering onto an
    explicit zero-cleared framebuffer: the fused kernels' outputs carry
    exactly the clear values on uncovered pixels, so skipping the
    clear + merge may not change a single bit (single-object, batched
    multi-object, and the public Renderer's default clear_color=0 path;
    a non-zero clear_color keeps the merge and must show through where
    nothing rendered)."""
    import numpy as np

    from tpu_renderer.core.types import make_framebuffer
    from tpu_renderer.engine.renderer import Renderer, render_scene
    from tpu_renderer.models import scenes

    h, w = 96, 128
    sg, tr_d, li_d = scenes.baseline_scene(config, h, w)
    scene_j, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
    a = render_scene(make_framebuffer(h, w), scene_j, tr, li,
                     backend="pallas")
    b = render_scene(None, scene_j, tr, li, backend="pallas",
                     frame_height=h, frame_width=w)
    np.testing.assert_array_equal(np.asarray(a.color), np.asarray(b.color))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    fb = Renderer(h, w, backend="pallas").render(scene_j, tr, li)
    np.testing.assert_array_equal(np.asarray(fb.color), np.asarray(a.color))
    np.testing.assert_array_equal(np.asarray(fb.depth), np.asarray(a.depth))
    fb2 = Renderer(h, w, backend="pallas", clear_color=0xFF112233).render(
        scene_j, tr, li
    )
    c2 = np.asarray(fb2.color)
    cov = np.asarray(a.depth) > np.float32(-3.0e38)
    assert (c2[~cov] == 0xFF112233).all()
    np.testing.assert_array_equal(c2[cov], np.asarray(a.color)[cov])
