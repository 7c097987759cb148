"""Dense-grid (tile_h=8) wide-kernel path: _stage_a_fill + _chunk_best_spanex.

The suite's default scenes pick 32-row tiles (T <= 8192), which routes
around the wide in-kernel stage A entirely — these tests force tile_h=8
so the span-expanded scratch, the in-kernel block transpose, and the
boundary masking folded into maxx are all exercised and bit-compared
against the mask strategy (whose kernel interleaves span setup per chunk
— an independent implementation of the same ops.spans closed forms).
"""

import numpy as np
import pytest

from tpu_renderer.core.types import ObjectConfig
from tpu_renderer.geometry.vertex import setup_triangles
from tpu_renderer.models import scenes
from tpu_renderer.ops import raster_pallas as rp

H, W = 96, 128


def _edges(config=4, cfg_override=None, texture=None):
    sg, tr_d, li_d = scenes.baseline_scene(config, H, W)
    scene_j, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
    obj, cfg = scene_j[0]
    if texture is not None:
        obj = obj._replace(texture=texture)
        cfg = ObjectConfig(textured=True)
    if cfg_override is not None:
        cfg = cfg_override
    return setup_triangles(obj, tr, li, cfg), tr, li, cfg


@pytest.mark.parametrize("phong", [True, False])
def test_wide_sorted_matches_mask_tile8(phong):
    edges, tr, li, _ = _edges(4, ObjectConfig(phong=phong))
    outs = {}
    for strat in ("mask", "sorted"):
        cov, z, col, stats = rp.rasterize_pallas_shaded(
            edges, tr, li, phong, H, W, strategy=strat, tile_h=8
        )
        assert int(stats["bins_dropped"]) == 0
        outs[strat] = (np.asarray(cov), np.asarray(z), np.asarray(col))
    for a, b in zip(outs["mask"], outs["sorted"]):
        np.testing.assert_array_equal(a, b)
    assert outs["mask"][0].any()


@pytest.mark.parametrize("split,merge,deferred",
                         [(2, "tree", False), (4, "tree", False),
                          (16, "repeat", False), (1, "tree", True),
                          (8, "repeat", True)])
def test_wide_sorted_textured_tile8(split, merge, deferred):
    """Fused MXU texture sampling through the wide path (atlas finalize
    runs off the spanex scratch's uv planes), across column splits, both
    sub-bin merge lowerings, and the deferred stage-B fold."""
    from tpu_renderer.models.textures import checkerboard as cb

    tex = cb(32, 32, 4)
    edges, tr, li, cfg = _edges(1, texture=tex)
    outs = {}
    orig, orig_m, orig_d = rp.PACK_SPLIT, rp.SPLIT_MERGE, rp.FOLD_DEFERRED
    try:
        rp.PACK_SPLIT, rp.SPLIT_MERGE, rp.FOLD_DEFERRED = (
            split, merge, deferred,
        )
        for strat in ("mask", "sorted"):
            cov, z, col, stats = rp.rasterize_pallas_shaded(
                edges, tr, li, False, H, W, strategy=strat, tile_h=8,
                texture=tex,
            )
            outs[strat] = (np.asarray(cov), np.asarray(z), np.asarray(col))
    finally:
        rp.PACK_SPLIT, rp.SPLIT_MERGE, rp.FOLD_DEFERRED = (
            orig, orig_m, orig_d,
        )
    for a, b in zip(outs["mask"], outs["sorted"]):
        np.testing.assert_array_equal(a, b)
    assert outs["mask"][0].any()


def test_pack_records_rowmajor_bitexact():
    """pack_records_rowmajor = pack_records + zero row padding, bit-for-bit
    (the pipeline only switches tables above 65k triangles, so the suite
    would otherwise never compare them)."""
    edges, _, _, _ = _edges(4, ObjectConfig(phong=True))
    a = np.asarray(rp.pack_records(edges)).view(np.uint32)
    b = np.asarray(rp.pack_records_rowmajor(edges)).view(np.uint32)
    T = edges.num_triangles
    assert (a == b[:T]).all()
    assert (b[T:] == 0).all()
    assert b.shape[0] % rp._PACK_T_BLK == 0


@pytest.mark.parametrize("config", [1, 3, 4])
def test_setup_records_matches_packed_edge_table(config):
    """The channel-major record writer (geometry.vertex.setup_records +
    finish_records) must produce bit-identical tables to packing the
    EdgeTable view — both derive from one _setup_fields core, and the
    whole fast path now rides setup_records."""
    from tpu_renderer.geometry.vertex import setup_records, setup_triangles
    from tpu_renderer.models import scenes

    sg, tr_d, li_d = scenes.baseline_scene(config, H, W)
    scene_j, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
    obj, cfg = scene_j[0]
    T = obj.num_triangles

    rec_t = setup_records(obj, tr, li, cfg)
    a = np.asarray(rp.finish_records(rec_t)).view(np.uint32)
    b = np.asarray(rp.pack_records(setup_triangles(obj, tr, li, cfg))).view(
        np.uint32
    )
    assert (a[:T] == b).all()
    assert (a[T:] == 0).all()

    # gid0 offsets the gid lane and nothing else
    rec_t5 = setup_records(obj, tr, li, cfg, gid0=1000)
    c = np.asarray(rp.finish_records(rec_t5))
    gl = rp.GID_LANE
    np.testing.assert_array_equal(
        c[:T, gl], np.arange(T, dtype=np.float32) + 1000.0
    )
    np.testing.assert_array_equal(
        c[:T, :gl].view(np.uint32), a[:T, :gl]
    )


@pytest.mark.parametrize("phong", [True, False])
def test_pack_split_variants_bit_exact(phong):
    """PACK_SPLIT 1 (single full-width bin), 2 (dual 64-column), 4
    (quad 32-column), 8 (octal 16-column), and 16 — under BOTH sub-bin
    merge lowerings (SPLIT_MERGE 'tree' and 'repeat') — must all be
    bit-exact: the sub-bins of a split tile are spatially disjoint by
    construction (stage A clips each entry's span to its bin), so
    winners, ties, and interpolated values may not differ. Split 1 is
    the control arm of every split A/B probe. The deferred stage-B fold
    (FOLD_DEFERRED) selects the winning slot's span values instead of
    folding every slot's attribute planes — same winner rule, same
    evaluation op order, so it must be bit-exact too."""
    edges, tr, li, _ = _edges(4, ObjectConfig(phong=phong))
    outs = {}
    orig, orig_m, orig_d = rp.PACK_SPLIT, rp.SPLIT_MERGE, rp.FOLD_DEFERRED
    try:
        # One arm per equivalence class (suite-time budget): splits
        # 1/2/4/16 under tree, 8 under repeat, deferred at split 1 and
        # at the most complex combination (16, repeat).
        for split, merge, deferred in (
            (2, "tree", False), (1, "tree", False), (4, "tree", False),
            (16, "tree", False), (8, "repeat", False),
            (1, "tree", True), (16, "repeat", True),
            (8, "mxu", False), (16, "mxu", False), (16, "mxu", True),
        ):
            rp.PACK_SPLIT, rp.SPLIT_MERGE, rp.FOLD_DEFERRED = (
                split, merge, deferred,
            )
            cov, z, col, stats = rp.rasterize_pallas_shaded(
                edges, tr, li, phong, H, W, strategy="sorted", tile_h=8
            )
            assert int(stats["bins_dropped"]) == 0
            outs[(split, merge, deferred)] = (
                np.asarray(cov), np.asarray(z), np.asarray(col)
            )
    finally:
        rp.PACK_SPLIT, rp.SPLIT_MERGE, rp.FOLD_DEFERRED = (
            orig, orig_m, orig_d,
        )
    base = outs[2, "tree", False]
    for key in outs:
        if key == (2, "tree", False):
            continue
        for a, b in zip(base, outs[key]):
            np.testing.assert_array_equal(a, b)
    assert base[0].any()


@pytest.mark.parametrize("phong", [True, False])
def test_pack_rows_bit_exact(phong):
    """PACK_ROWS=2 (row packing: entries binned to 4-row strips, two
    entries per chunk slot on disjoint sublane halves) must be bit-exact
    vs the unpacked sorted fold AND the mask strategy: the strips are
    disjoint ROW sets, each strip's sub-stream is gid-sorted, and the
    per-entry math is the single-block stage A verbatim on that entry's
    sublanes."""
    edges, tr, li, _ = _edges(4, ObjectConfig(phong=phong))
    outs = {}
    orig_r, orig_g = rp.PACK_ROWS, rp.PACK_ROWS_MAX_PX_PER_TRI
    try:
        for rows in (1, 2, 4):
            rp.PACK_ROWS = rows
            rp.PACK_ROWS_MAX_PX_PER_TRI = 10 ** 9  # force the gate open
            cov, z, col, stats = rp.rasterize_pallas_shaded(
                edges, tr, li, phong, H, W, strategy="sorted", tile_h=8
            )
            assert int(stats["bins_dropped"]) == 0
            outs[rows] = (np.asarray(cov), np.asarray(z), np.asarray(col))
        rp.PACK_ROWS = 1
        cov, z, col, _ = rp.rasterize_pallas_shaded(
            edges, tr, li, phong, H, W, strategy="mask", tile_h=8
        )
        outs["mask"] = (np.asarray(cov), np.asarray(z), np.asarray(col))
    finally:
        rp.PACK_ROWS, rp.PACK_ROWS_MAX_PX_PER_TRI = orig_r, orig_g
    for key in (2, 4, "mask"):
        for a, b in zip(outs[1], outs[key]):
            np.testing.assert_array_equal(a, b)
    assert outs[1][0].any()


def test_pack_rows_textured_odd_height_large_sidelist():
    """Row packing through the fused-texture path at a frame height that
    is not a tile multiple (the strip grid pads to row_split * fb tiles),
    with a giant quad forced onto the large side list (spans far more
    4-row strips than the entry expansion) and empty tiles present."""
    from tpu_renderer.core.types import make_object
    from tpu_renderer.geometry.vertex import concat_edge_tables
    from tpu_renderer.models.primitives import construct_quad
    from tpu_renderer.models.textures import checkerboard as cb
    from tpu_renderer.ops.binning import bin_triangles_queue

    tex = cb(32, 32, 4)
    edges, tr, li, cfg = _edges(1, texture=tex)
    # Giant textured quad covering the whole frame: two triangles whose
    # strip-bin count (ceil(92/4) strips) far exceeds the expansion.
    quad = construct_quad(16.0, color=(0.3, 0.9, 0.4, 1.0))
    quad["vertices"] = quad["vertices"] + np.float32([0.0, 0.0, -0.5])
    qobj = make_object(
        (0.0, 0.0, 0.0), quad["vertices"], quad["colors"],
        quad["normals"], quad["uvs"], texture=np.asarray(tex),
    )
    qedges = setup_triangles(qobj, tr, li, cfg)
    both = concat_edge_tables([qedges, edges])

    Hodd = 92
    # Positively assert the quad overflows the strip expansion into the
    # large side list under row_split binning.
    exp, bf = rp._queue_expansion(8, both.num_triangles)
    q = bin_triangles_queue(both, Hodd, W, 8, 128, 128, expansion=exp,
                            budget_factor=bf, row_split=2)
    assert int(q.n_large) >= 2
    assert int(q.n_dropped) == 0
    outs = {}
    orig_r, orig_g = rp.PACK_ROWS, rp.PACK_ROWS_MAX_PX_PER_TRI
    try:
        for rows in (1, 2, 4):
            rp.PACK_ROWS = rows
            rp.PACK_ROWS_MAX_PX_PER_TRI = 10 ** 9
            cov, z, col, stats = rp.rasterize_pallas_shaded(
                both, tr, li, False, Hodd, W, strategy="sorted",
                tile_h=8, texture=tex,
            )
            assert int(stats["bins_dropped"]) == 0
            outs[rows] = (np.asarray(cov), np.asarray(z), np.asarray(col))
    finally:
        rp.PACK_ROWS, rp.PACK_ROWS_MAX_PX_PER_TRI = orig_r, orig_g
    for rows in (2, 4):
        for a, b in zip(outs[1], outs[rows]):
            np.testing.assert_array_equal(a, b)
    assert outs[1][0].any()


def test_tile_height_policy_is_area_relative():
    """Round 2's config-2 regression: the fixed 8192-triangle cut kept a
    5.4k-triangle 512^2 scene (48 px/triangle of tiny fragments) on
    32-row tiles. The policy input is px/triangle, not triangle count."""
    # Config-2 shape: 5.4k triangles at 512^2 -> fine tiles.
    assert rp._pick_tile_h(5400, 512, 512) == 8
    # Same mesh at 1080p is ~384 px/triangle -> coarse (16-row) tiles.
    assert rp._pick_tile_h(5400, 1080, 1920) == 16
    # Config-4 shape: 2.2k triangles at 1080p stays coarse.
    assert rp._pick_tile_h(2208, 1080, 1920) == 16
    # Dense 1080p scenes stay fine.
    assert rp._pick_tile_h(40000, 1080, 1920) == 8


@pytest.mark.parametrize("rows", [1, 2])
def test_zcull_blocks_bit_exact(rows):
    """ZCULL_BLOCKS (occlusion block-skip) must be bit-exact vs the
    un-culled fold on a scene built to FIRE it: a near sphere submitted
    first fully covers its tiles, then a far (occluded) sphere's blocks
    arrive with max z below every tile's min winning z. The skip is
    output-preserving by construction (strict '>' + first-writer ties);
    this pins the margin arithmetic and the scratch-read plumbing."""
    from tpu_renderer.core.types import make_object
    from tpu_renderer.geometry.vertex import concat_edge_tables
    from tpu_renderer.models.sphere import construct_sphere

    sg, tr_d, li_d = scenes.baseline_scene(4, H, W)
    scene_j, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
    cfg = ObjectConfig(phong=True)
    mesh = construct_sphere()
    near = make_object((0.0, 0.0, 0.6), **mesh)
    far = make_object((0.0, 0.0, -0.9), **mesh)
    edges = concat_edge_tables([
        setup_triangles(near, tr, li, cfg),
        setup_triangles(far, tr, li, cfg),
    ])

    outs = {}
    orig_z, orig_r, orig_g = (
        rp.ZCULL_BLOCKS, rp.PACK_ROWS, rp.PACK_ROWS_MAX_PX_PER_TRI,
    )
    try:
        rp.PACK_ROWS = rows
        rp.PACK_ROWS_MAX_PX_PER_TRI = 10 ** 9  # force the rows gate open
        for zcull in (False, True):
            rp.ZCULL_BLOCKS = zcull
            cov, z, col, stats = rp.rasterize_pallas_shaded(
                edges, tr, li, True, H, W, strategy="sorted", tile_h=8
            )
            assert int(stats["bins_dropped"]) == 0
            outs[zcull] = (np.asarray(cov), np.asarray(z), np.asarray(col))
    finally:
        rp.ZCULL_BLOCKS = orig_z
        rp.PACK_ROWS, rp.PACK_ROWS_MAX_PX_PER_TRI = orig_r, orig_g
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, b)
    assert outs[False][0].any()
    # The far sphere must actually be occluded somewhere (the scene
    # exercises the skip, not just compiles it).
    assert outs[False][1].max() > 0.0


def test_rows_stream_budget_density_policy():
    """The density-aware per-stream budget: never looser than the flat
    0.54T budget, monotone in px/triangle, >= 2x the measured demand at
    every probed point (measurements/r4/probe_util3.log), and exactly
    the flat budget above the rows gate."""
    f = rp._rows_stream_budget_factor
    px = 1080 * 1920
    # Probed (T, real_per_stream/T) pairs from the r4 sweep.
    probed = [
        (352800, 0.272), (500000, 0.248), (706860, 0.222),
        (1001112, 0.191), (2002000, 0.134), (4007280, 0.095),
    ]
    for T, demand in probed:
        b = f(T, 1080, 1920)
        assert b <= 0.54 + 1e-9
        assert b >= 2.0 * demand * 0.98, (T, b, demand)
    # Monotone in px/tri (denser -> tighter).
    vals = [f(T, 1080, 1920) for T, _ in probed]
    assert vals == sorted(vals, reverse=True)
    # Sparse scenes (above the gate) keep the flat budget.
    assert f(100000, 1080, 1920) == 0.54
    # Ultra-dense floor.
    assert f(20_000_000, 1080, 1920) == pytest.approx(0.19)


def test_fold_planes_config_specialized():
    """The fused kernels fold ONLY the interpolant planes a config
    consumes (_scene_fields): Gouraud rgba (4), Phong rgba+normal (7),
    textured-only uv/1-z (3, color replaced by the texture — shade()'s
    quirk, projekt.cpp:427-445+513), mixed scenes the union (10). Pinned
    so a future record/plane change cannot silently regress the
    per-entry fold cost (VERDICT r4 item 3)."""
    from tpu_renderer.ops.raster_pallas import ObjSpec, _scene_fields

    gouraud = (ObjSpec(0, 10, False, None),)
    phong = (ObjSpec(0, 10, True, None),)
    textured = (ObjSpec(0, 10, False, (0, 16, 16)),)
    mixed = (
        ObjSpec(0, 10, True, None),
        ObjSpec(10, 20, False, (0, 16, 16)),
        ObjSpec(20, 30, False, None),
    )
    assert len(_scene_fields(gouraud)[0]) == 4
    assert len(_scene_fields(phong)[0]) == 7
    assert len(_scene_fields(textured)[0]) == 3
    assert len(_scene_fields(mixed)[0]) == 10


@pytest.mark.parametrize("win", [16, 32])
def test_tex_row_window_bit_exact(win):
    """TEX_ROW_WINDOW (windowed one-hot row contraction) must be
    bit-exact vs the full-atlas contraction on both the slabbed
    (tile_h=16, config 3) and a multi-object mixed scene — the included
    static blocks' contributions sum to exactly the referenced texel
    rows, and unneeded pixels' zeros are never consumed."""
    import tpu_renderer.ops.raster_pallas as rp
    from tpu_renderer.engine.renderer import render_scene
    from tpu_renderer.models import scenes

    H, W = 128, 256
    scene_g, tr_d, li_d = scenes.baseline_scene(5, H, W)
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    orig = rp.TEX_ROW_WINDOW
    outs = {}
    try:
        for w in (0, win):
            rp.TEX_ROW_WINDOW = w
            fb = render_scene(None, scene_j, tr, li, backend="pallas",
                              frame_height=H, frame_width=W)
            outs[w] = (np.asarray(fb.color), np.asarray(fb.depth))
    finally:
        rp.TEX_ROW_WINDOW = orig
    np.testing.assert_array_equal(outs[win][0], outs[0][0])
    np.testing.assert_array_equal(outs[win][1], outs[0][1])
