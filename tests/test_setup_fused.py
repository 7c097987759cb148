"""Fused Pallas setup kernel (ops.setup_pallas) vs the XLA setup chain.

The fused kernel must be BIT-IDENTICAL to
finish_records(setup_records(...)) and triangle_bbox_rows(...) — it is the
same math in the same float32 op order, only the materialization changes
(one VMEM-resident kernel instead of ~85 HBM-moving XLA columns). Runs in
Pallas interpreter mode on the CPU test backend; the real-TPU evidence is
bench.py --parity (which exercises the fused setup on-chip).
"""

import jax
import numpy as np
import pytest

from tpu_renderer.geometry.vertex import setup_records
from tpu_renderer.models import scenes
from tpu_renderer.ops.binning import triangle_bbox_rows
from tpu_renderer.ops.raster_pallas import finish_records
from tpu_renderer.ops.setup_pallas import setup_records_fused

H, W = 192, 256


def obj_for(config):
    scene_g, tr_d, li_d = scenes.baseline_scene(config, H, W)
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    obj, cfg = scene_j[0]
    return obj, cfg, tr, li


# Config 1: flat cube (gouraud, no phong); 3: textured; 4: phong sphere.
@pytest.mark.parametrize("config", [1, 3, 4])
@pytest.mark.parametrize("blk", [128, 1024])
def test_fused_setup_bit_exact(config, blk):
    obj, cfg, tr, li = obj_for(config)
    T = obj.num_triangles

    rec_t = jax.jit(setup_records, static_argnums=(3,))(obj, tr, li, cfg)
    recs_x = finish_records(rec_t)
    bbox_x = triangle_bbox_rows(rec_t, H, W)

    recs_f, bbox_f = jax.jit(
        setup_records_fused, static_argnums=(3, 4, 5, 6, 7)
    )(obj, tr, li, cfg, 0, H, W, blk)

    # Record rows for real triangles: bit-identical (gid lane included).
    np.testing.assert_array_equal(
        np.asarray(recs_f)[:T], np.asarray(recs_x)[:T]
    )
    # Padded rows must be invalid records (valid lanes zero).
    pads = np.asarray(recs_f)[T:]
    for e in range(3):
        assert (pads[:, e * 28] == 0.0).all()

    # Bbox rows: tri_valid/ylo/yhi identical (straight record fields);
    # xlo/xhi carry the FMA-contracted x0 + (ymax-1-ymin)*xg term, where
    # XLA CPU's contraction choice differs between the two programs
    # (golden divergence #8) — 1-ulp budget. Safe: the bbox already pads
    # x by +/-1.0 PIXEL, so a 1-ulp wobble cannot uncover a covered tile.
    for a, b in zip(bbox_f[:3], bbox_x[:3]):
        np.testing.assert_array_equal(np.asarray(a)[:T], np.asarray(b))
    for a, b in zip(bbox_f[3:], bbox_x[3:]):
        a, b = np.asarray(a)[:T], np.asarray(b)
        assert ((a == b) | np.isclose(a, b, rtol=2e-7, atol=0.0)).all()
    assert not np.asarray(bbox_f[0])[T:].any()


def test_fused_setup_gid_offset():
    obj, cfg, tr, li = obj_for(4)
    T = obj.num_triangles
    recs_f, _ = jax.jit(
        setup_records_fused, static_argnums=(3, 4, 5, 6, 7)
    )(obj, tr, li, cfg, 7000, H, W, 256)
    gid = np.asarray(recs_f)[:T, 84]
    np.testing.assert_array_equal(gid, np.arange(T) + 7000)


def test_pipeline_with_fused_setup_end_to_end():
    """A scene above FUSED_SETUP_MIN routes setup through the Pallas
    kernel (setup_for_raster -> SetupOut); the rendered frame must be
    bit-identical to the XLA-setup pipeline (the 1-ulp bbox wobble can
    only grow the conservative bins, never change a pixel)."""
    from tpu_renderer.core.types import make_object
    from tpu_renderer.models.sphere import construct_sphere
    from tpu_renderer.ops.raster_pallas import rasterize_pallas_shaded
    from tpu_renderer.ops.setup_pallas import (
        FUSED_SETUP_MIN,
        SetupOut,
        setup_for_raster,
    )

    mesh = construct_sphere(36)  # 5040 triangles >= FUSED_SETUP_MIN
    _, cfg, tr, li = obj_for(4)
    scene_g, tr_d, li_d = scenes.baseline_scene(4, H, W)
    obj = make_object(
        scene_g[0][0]["p"], mesh["vertices"], mesh["colors"],
        mesh["normals"], mesh["uvs"], None,
    )
    T = obj.num_triangles
    assert T >= FUSED_SETUP_MIN, f"test mesh too small ({T})"

    pre = setup_for_raster(obj, tr, li, cfg, frame_height=H, frame_width=W)
    assert isinstance(pre, SetupOut)

    @jax.jit
    def run(arg):
        return rasterize_pallas_shaded(arg, tr, li, True, H, W)

    cov_f, z_f, col_f, stats_f = run(pre)
    rec_t = setup_records(obj, tr, li, cfg)
    cov_x, z_x, col_x, stats_x = run(rec_t)

    assert int(stats_f["bins_dropped"]) == 0
    np.testing.assert_array_equal(np.asarray(cov_f), np.asarray(cov_x))
    np.testing.assert_array_equal(np.asarray(z_f), np.asarray(z_x))
    np.testing.assert_array_equal(np.asarray(col_f), np.asarray(col_x))
    assert np.asarray(cov_f).any()


def test_fused_setup_no_lights():
    """lights.count == 0 takes the raw-color passthrough (divergence #6)."""
    from tpu_renderer.core.types import make_lights

    obj, cfg, tr, _ = obj_for(1)
    li = make_lights(
        np.array([0.3, 0.3, 0.3, 1.0], np.float32),
        np.zeros((0, 3), np.float32),
        np.zeros((0, 4), np.float32),
    )
    T = obj.num_triangles
    rec_t = jax.jit(setup_records, static_argnums=(3,))(obj, tr, li, cfg)
    recs_x = finish_records(rec_t)
    recs_f, _ = jax.jit(
        setup_records_fused, static_argnums=(3, 4, 5, 6, 7)
    )(obj, tr, li, cfg, 0, H, W, 128)
    np.testing.assert_array_equal(
        np.asarray(recs_f)[:T], np.asarray(recs_x)[:T]
    )


def test_setup_packed_bit_exact():
    """SETUP_PACKED (sublane-packed (c, 3, 8, blk/8) blocks) must be
    bit-identical to the flat form: every op is elementwise over the
    triangle axis, the host-side reshapes are contiguous, and only the
    record/bbox assembly differs. Covers phong, gouraud, and textured
    field sets."""
    import tpu_renderer.ops.setup_pallas as sp
    from tpu_renderer.core.types import ObjectConfig, make_object
    from tpu_renderer.models.primitives import construct_sphere_grid
    from tpu_renderer.models.textures import checkerboard

    mesh = construct_sphere_grid(40, 42)
    tex = checkerboard(16, 16)
    _, _, tr, li = obj_for(4)
    orig = sp.SETUP_PACKED
    try:
        for cfg, txt in (
            (ObjectConfig(phong=True), None),
            (ObjectConfig(), None),
            (ObjectConfig(textured=True), tex),
        ):
            obj = make_object((0.0, 0.0, 0.0), **mesh, texture=txt)
            outs = {}
            for packed in (False, True):
                sp.SETUP_PACKED = packed
                recs, bbox = jax.jit(
                    sp.setup_records_fused, static_argnums=(3, 4, 5, 6, 7)
                )(obj, tr, li, cfg, 3, H, W, 1024)
                outs[packed] = (
                    np.asarray(recs),
                    [np.asarray(b) for b in bbox],
                )
            a, b = outs[False], outs[True]
            np.testing.assert_array_equal(
                a[0].view(np.uint32), b[0].view(np.uint32)
            )
            for x, y in zip(a[1], b[1]):
                np.testing.assert_array_equal(x, y)
    finally:
        sp.SETUP_PACKED = orig
