"""Pallas fast path (binning + visibility kernel + resolve) vs the pure-JAX
reference rasterizer. On the CPU test backend the kernel runs in interpreter
mode; parity budgets are as in test_parity_jax (FMA rounding)."""

import jax
import numpy as np
import pytest

from tpu_renderer.core.types import make_framebuffer
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.vertex import setup_triangles
from tpu_renderer.golden import cpu_reference as gold
from tpu_renderer.models import scenes
from tpu_renderer.ops.binning import bin_triangles
from tpu_renderer.ops.raster_pallas import rasterize_pallas
from tpu_renderer.ops.raster_reference import rasterize_reference

F = np.float32
H = W = 128


def edges_for(config):
    scene_g, tr_d, li_d = scenes.baseline_scene(config, H, W)
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    obj, cfg = scene_j[0]
    return setup_triangles(obj, tr, li, cfg)


class TestBinning:
    def test_all_triangles_binned_somewhere(self):
        edges = edges_for(4)  # sphere
        bins = bin_triangles(edges, H, W, 32, 128, 2208)
        ids = np.asarray(bins.ids)
        binned = set(ids[ids >= 0].tolist())
        # every visible triangle with >=2 active edges appears in some tile
        valid = np.asarray(edges.valid)
        ymin, ymax = np.asarray(edges.ymin), np.asarray(edges.ymax)
        active = valid & (ymax > ymin)
        expect = set(np.nonzero(active.sum(1) >= 2)[0].tolist())
        assert expect <= binned

    def test_submission_order_preserved(self):
        edges = edges_for(4)
        bins = bin_triangles(edges, H, W, 32, 128, 2208)
        ids = np.asarray(bins.ids)
        for t in range(ids.shape[0]):
            for x in range(ids.shape[1]):
                lst = ids[t, x]
                lst = lst[lst >= 0]
                assert (np.diff(lst) > 0).all()  # strictly increasing

    def test_overflow_counted_not_silent(self):
        edges = edges_for(4)
        bins_small = bin_triangles(edges, H, W, 32, 128, 8)
        assert int(bins_small.n_dropped) > 0
        bins_big = bin_triangles(edges, H, W, 32, 128, 4096)
        assert int(bins_big.n_dropped) == 0

    def test_counts_match_ids(self):
        edges = edges_for(1)
        bins = bin_triangles(edges, H, W, 32, 128, 16)
        ids = np.asarray(bins.ids)
        counts = np.asarray(bins.counts)
        np.testing.assert_array_equal((ids >= 0).sum(-1), counts)


@pytest.mark.parametrize("strategy", ["mask", "sorted"])
@pytest.mark.parametrize("config", [1, 4])
def test_pallas_matches_reference_rasterizer(config, strategy):
    edges = edges_for(config)
    rcov, rgb = jax.jit(rasterize_reference, static_argnums=(1, 2))(
        edges, H, W
    )
    pcov, pgb, _ = jax.jit(rasterize_pallas, static_argnums=(1, 2, 3, 8))(
        edges, H, W, None, None, None, 0, 0, strategy
    )
    rcov, rgb = np.asarray(rcov), np.asarray(rgb)
    pcov, pgb = np.asarray(pcov), np.asarray(pgb)

    np.testing.assert_array_equal(pcov, rcov)
    # depth: exact or 1-ulp (FMA budget); gbuf is channel-first (11, H, W)
    zr, zp = rgb[0], pgb[0]
    ok = (zr == zp) | np.isclose(zr, zp, rtol=1e-6, atol=0.0)
    assert 1.0 - ok.mean() <= 0.005
    # attributes bit-exact on pixels where both agree on the winner (same z)
    m = rcov & pcov & (zr == zp)
    for ch in range(1, 11):
        a, b = rgb[ch][m], pgb[ch][m]
        eq = (a == b) | (np.isnan(a) & np.isnan(b))
        assert eq.mean() > 0.999, f"channel {ch}"


def test_pallas_end_to_end_vs_golden():
    scene_g, tr_d, li_d = scenes.baseline_scene(5, H, W)
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    gc, gd = gold.render(scene_g, tr_d, li_d, H, W)
    fb = render_scene(make_framebuffer(H, W), scene_j, tr, li,
                      backend="pallas")
    jc, jd = np.asarray(fb.color), np.asarray(fb.depth)
    assert 1.0 - (jc == gc).mean() <= 0.002
    ok = (jd == gd) | np.isclose(jd, gd, rtol=1e-6, atol=0.0)
    assert 1.0 - ok.mean() <= 0.005


def test_pallas_capacity_overflow_drops_only_late_triangles():
    # with a tiny capacity the earliest triangles still render and the
    # drop count is reported
    edges = edges_for(4)  # sphere, thousands of triangles
    pcov, _, pstats = jax.jit(
        rasterize_pallas, static_argnums=(1, 2, 3, 8)
    )(edges, H, W, 8, None, None, 0, 0, "mask")
    assert int(pstats["bins_dropped"]) > 0
    assert np.asarray(pcov).sum() > 0


class TestQueueBinning:
    def test_invariants(self):
        from tpu_renderer.ops.binning import bin_triangles_queue

        edges = edges_for(4)
        q = bin_triangles_queue(edges, H, W, 32, 128, 64)
        starts = np.asarray(q.starts)
        items = np.asarray(q.item_start)
        counts = np.asarray(q.counts)
        wi = np.asarray(q.wi_tile)
        ntiles = counts.shape[0] - 1
        # tile entry ranges tile the sorted stream: contiguous, in order
        np.testing.assert_array_equal(starts[1:] - starts[:-1], counts[:-1])
        assert (counts[:-1] >= 0).all()
        # work items are tile-sorted with the dummy tail last
        assert (np.diff(wi) >= 0).all()
        # every tile has at least one work item, and exactly the number of
        # record blocks its (unaligned) entry range touches
        for t in range(ntiles):
            nwi = items[t + 1] - items[t]
            b_lo = starts[t] // 64
            b_hi = -(-int(starts[t] + counts[t]) // 64)
            assert nwi == max(b_hi - b_lo, 1)
        # entries of tile t sit at sorted_tri[starts[t]:starts[t]+counts[t]]
        # in ascending (submission) order
        st = np.asarray(q.sorted_tri)
        for t in range(0, ntiles, 7):
            seg = st[starts[t] : starts[t] + counts[t]]
            assert (seg >= 0).all()
            assert (np.diff(seg) > 0).all()
        assert int(q.n_dropped) == 0

    def test_merge_by_gid_tie_break(self):
        from tpu_renderer.ops.raster_pallas import _merge_by_gid
        import jax.numpy as jnp

        z_a = jnp.float32([[1.0, 2.0, -3.4028235e38]])
        g_a = jnp.int32([[5, 7, -1]])
        z_b = jnp.float32([[1.0, 3.0, 0.5]])
        g_b = jnp.int32([[3, 9, 2]])
        z, g = _merge_by_gid(z_a, g_a, z_b, g_b)
        # equal z: smaller gid (earlier submission) wins
        assert int(g[0, 0]) == 3
        # larger z wins
        assert int(g[0, 1]) == 9
        # covered beats uncovered
        assert int(g[0, 2]) == 2


def test_shade_planes_matches_shade():
    """The channel-unrolled in-kernel shader (shade_planes + ARGB plane
    pack) is bit-identical to the XLA shade()+pack_argb path on the same
    backend, for both Gouraud and Phong."""
    import jax.numpy as jnp
    from tpu_renderer.core.math import pack_argb
    from tpu_renderer.core.types import ObjectConfig, make_lights, make_transform
    from tpu_renderer.ops.shading import pack_argb_planes, shade, shade_planes

    rng = np.random.default_rng(7)
    R, W_ = 16, 128
    z = jnp.asarray(rng.uniform(-1, 1, (R, W_)), jnp.float32)
    col = jnp.asarray(rng.uniform(0, 1, (11, R, W_)), jnp.float32)
    gbuf = col.at[0].set(z)
    nrmv = rng.normal(size=(R, W_, 3)).astype(np.float32)
    gbuf = gbuf.at[5:8].set(jnp.moveaxis(jnp.asarray(nrmv), -1, 0))
    covered = jnp.asarray(rng.uniform(0, 1, (R, W_)) > 0.3)
    gbuf = jnp.where(covered[None], gbuf, 0.0).at[0].set(
        jnp.where(covered, z, jnp.float32(-3.4028235e38))
    )

    transform = make_transform(3.0, 1.0, 300.0, (64.0, 8.0))
    lights = make_lights(
        (0.25, 0.25, 0.3, 1.0),
        [(2.0, 2.0, 1.5), (-2.5, 1.0, 2.0)],
        [(0.9, 0.85, 0.8, 1.0), (0.25, 0.3, 0.45, 1.0)],
    )
    px = jnp.broadcast_to(jnp.arange(W_, dtype=jnp.float32)[None], (R, W_))
    py = jnp.broadcast_to(jnp.arange(R, dtype=jnp.float32)[:, None], (R, W_))
    cam = (transform.distance_above_target, transform.focal_length,
           transform.meters_to_pixels, transform.screen_center[0],
           transform.screen_center[1])
    ambient = tuple(lights.ambient[c] for c in range(4))
    lp = [tuple(lights.light_p[k][i] for i in range(3)) for k in range(2)]
    li = [tuple(lights.light_intensity[k][c] for c in range(4))
          for k in range(2)]

    for phong in (False, True):
        cfg = ObjectConfig(phong=phong)
        rgba_ref, cov_ref = shade(covered, gbuf, transform, lights, cfg)
        packed_ref = np.asarray(pack_argb(rgba_ref))

        colp = [gbuf[1 + c] for c in range(4)]
        nrmp = [gbuf[5 + c] for c in range(3)]
        rgba_p = shade_planes(gbuf[0], colp, nrmp, px, py, cam, ambient,
                              lp, li, phong, 2)
        if phong:
            rgba_p = [jnp.where(covered, rgba_p[c], colp[c])
                      for c in range(4)]
        packed_p = np.asarray(
            pack_argb_planes(rgba_p[0], rgba_p[1], rgba_p[2], rgba_p[3])
        )
        np.testing.assert_array_equal(packed_p, packed_ref)


def test_fused_texture_matches_deferred_path():
    """The in-kernel MXU texture sampler must agree with the deferred XLA
    path (gbuf + sample_texture) pixel-for-pixel on the CPU backend.
    Config 3 is BILINEAR (the BASELINE contract), so this exercises the
    4-texel one-hot + lerp sampler against shading.sample_texture."""
    import jax.numpy as jnp
    from tpu_renderer.core.math import pack_argb
    from tpu_renderer.core.types import make_framebuffer
    from tpu_renderer.ops.raster_pallas import rasterize_pallas_shaded
    from tpu_renderer.ops.shading import shade

    scene_g, tr_d, li_d = scenes.baseline_scene(3, H, W)
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    obj, cfg = scene_j[0]
    assert cfg.filter_mode == "bilinear"
    edges = setup_triangles(obj, tr, li, cfg)

    covered_f, z_f, color_f, _ = rasterize_pallas_shaded(
        edges, tr, li, cfg.phong, H, W, texture=obj.texture,
        filter_mode=cfg.filter_mode,
    )

    from tpu_renderer.ops.raster_pallas import rasterize_pallas
    covered_d, gbuf, _ = rasterize_pallas(edges, H, W)
    rgba, covered_d = shade(covered_d, gbuf, tr, li, cfg, obj.texture, 0, 0)
    color_d = pack_argb(rgba)

    cf, cd = np.asarray(covered_f), np.asarray(covered_d)
    np.testing.assert_array_equal(cf, cd)
    colf, cold = np.asarray(color_f), np.asarray(color_d)
    m = cf  # uncovered pixels pack the zero base color in both paths
    assert (colf[m] == cold[m]).mean() > 0.999
    zf, zd = np.asarray(z_f), np.asarray(gbuf[0])
    ok = (zf[m] == zd[m]) | np.isclose(zf[m], zd[m], rtol=1e-6, atol=0.0)
    assert ok.mean() > 0.999


def test_fused_mixed_filter_scene_vs_reference():
    """A scene mixing nearest and bilinear textured objects renders in ONE
    fused kernel (nearest rides the bilinear sampler as a zero-t lerp);
    output must match the reference backend's per-object deferred path."""
    from tpu_renderer.engine.renderer import _scene_batchable
    from tpu_renderer.models.primitives import construct_quad
    from tpu_renderer.models.textures import checkerboard

    tex = checkerboard(32, 32, 4)
    q = construct_quad(1.2)
    scene_g = [
        (dict(p=(-0.35, 0.0, 0.0), **q), {"texture": tex}),
        (dict(p=(0.45, 0.2, 0.3), **q),
         {"texture": tex, "filter_mode": "bilinear"}),
    ]
    _, tr_d, li_d = scenes.baseline_scene(1, H, W)
    scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    assert _scene_batchable(scene_j)

    fb_r = render_scene(make_framebuffer(H, W), scene_j, tr, li,
                        backend="reference")
    fb_p = render_scene(make_framebuffer(H, W), scene_j, tr, li,
                        backend="pallas")
    cr, cp = np.asarray(fb_r.color), np.asarray(fb_p.color)
    zr, zp = np.asarray(fb_r.depth), np.asarray(fb_p.depth)
    assert (cr == cp).mean() > 0.998
    ok = (zr == zp) | np.isclose(zr, zp, rtol=1e-6, atol=0.0)
    assert 1.0 - ok.mean() <= 0.005
    assert (cr != 0).any()


@pytest.mark.parametrize("strategy", ["mask", "sorted"])
def test_tile_height_does_not_change_output(strategy):
    """tile_h is a pure performance knob: 8-row and 32-row grids must
    produce identical rasterization."""
    edges = edges_for(1)
    out = {}
    for th in (8, 32):
        cov, gbuf, st = jax.jit(
            rasterize_pallas, static_argnums=(1, 2, 3, 8, 9)
        )(edges, H, W, None, None, None, 0, 0, strategy, th)
        out[th] = (np.asarray(cov), np.asarray(gbuf), int(st["bins_dropped"]))
    np.testing.assert_array_equal(out[8][0], out[32][0])
    np.testing.assert_array_equal(out[8][1], out[32][1])
    assert out[8][2] == out[32][2] == 0


def test_queue_entry_budget_overflow_counted():
    """Entries beyond the static budget (budget_factor * T) drop and are
    COUNTED — never silent. Tall thin triangles on a fine 8-row grid span
    ~8 tiles each, far above a budget_factor=1 allowance."""
    import jax.numpy as jnp

    from tpu_renderer.core.types import (
        ObjectConfig, make_object, make_transform, no_lights,
    )
    from tpu_renderer.ops.binning import bin_triangles_queue

    n = 64
    verts = []
    for i in range(n):
        x = -0.9 + 1.8 * i / n
        # CW-visible tall sliver spanning most of the frame vertically
        verts += [[x, -0.75, 0.0], [x + 0.01, 0.75, 0.0],
                  [x + 0.02, -0.75, 0.0]]
    obj = make_object(
        (0.0, 0.0, 0.0), np.asarray(verts, F),
        np.ones((3 * n, 4), F), np.tile(np.float32([0, 0, 1]), (3 * n, 1)),
        np.zeros((3 * n, 2), F),
    )
    tr = make_transform(3.0, 1.0, 80.0, (64.0, 64.0))
    edges = setup_triangles(obj, tr, no_lights(), ObjectConfig())

    q = bin_triangles_queue(edges, H, W, 8, 128, 64, budget_factor=1)
    assert int(q.n_dropped) > 0
    # and a roomy budget keeps everything
    q2 = bin_triangles_queue(edges, H, W, 8, 128, 64, budget_factor=16)
    assert int(q2.n_dropped) == 0
    # FLOAT budget factors (the dense-grid default is 1.2) round up to a
    # whole number of blocks and keep the drop accounting
    q3 = bin_triangles_queue(edges, H, W, 8, 128, 64, budget_factor=1.5)
    assert q3.sorted_tri.shape[0] % 64 == 0
    assert int(q3.n_dropped) >= 0
    assert int(q3.n_dropped) < int(q.n_dropped)


def test_large_side_list_forms_identical():
    """The scatter-free large-triangle side-list compaction (cumsum +
    searchsorted, the default — the T-length scatter measured ~5.8
    ns/elem on-chip) must be bit-identical to the round-2 scatter form:
    submission order, -1 padding, unclamped n_large."""
    import jax.numpy as jnp

    from tpu_renderer.ops import binning

    rng = np.random.default_rng(7)
    for T in (1, 5, 997):
        for cap in (1, 8, 64):
            for p in (0.0, 0.15, 0.95, 1.0):
                large = jnp.asarray(rng.random(T) < p)
                orig = binning.LARGE_LIST_SEARCHSORTED
                try:
                    binning.LARGE_LIST_SEARCHSORTED = True
                    ids_new, n_new = binning._large_side_list(large, cap)
                    binning.LARGE_LIST_SEARCHSORTED = False
                    ids_old, n_old = binning._large_side_list(large, cap)
                finally:
                    binning.LARGE_LIST_SEARCHSORTED = orig
                np.testing.assert_array_equal(
                    np.asarray(ids_new), np.asarray(ids_old)
                )
                assert int(n_new) == int(n_old)


def test_queue_sort_paths_identical():
    """The packed-u32-key sort and the two-array stable-sort fallback
    (taken when (bins, T) exceed 32 bits — e.g. 2M triangles on a
    split-column 1080p grid) must produce identical QueueBins. Test
    scales always fit the packed key, so the fallback is pinned via
    FORCE_PAIR_SORT on the same scene, including a split-column grid
    and an overflowing budget (drop selection must match too)."""
    from tpu_renderer.ops import binning
    from tpu_renderer.ops.binning import bin_triangles_queue

    edges = edges_for(4)  # sphere, ~2.2k triangles
    cases = [
        dict(tile_h=8, tile_w=128, blk=64),
        dict(tile_h=8, tile_w=64, blk=64, col_split=2),
        dict(tile_h=8, tile_w=128, blk=64, budget_factor=0.25),
    ]
    for kw in cases:
        blk = kw.pop("blk")
        tile_h = kw.pop("tile_h")
        tile_w = kw.pop("tile_w")
        q_packed = bin_triangles_queue(edges, H, W, tile_h, tile_w, blk,
                                       **kw)
        binning.FORCE_PAIR_SORT = True
        try:
            q_pair = bin_triangles_queue(edges, H, W, tile_h, tile_w,
                                         blk, **kw)
        finally:
            binning.FORCE_PAIR_SORT = False
        for name, a, b in zip(q_packed._fields, q_packed, q_pair):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{name} differs ({kw})",
            )


def test_queue_compaction_equivalent():
    """COMPACT_ENTRIES (pre-sort cumsum+scatter compaction, an on-chip
    A/B candidate) must be bit-identical to the sorted-prefix path when
    nothing overflows the entry budget, and must count the same number
    of drops when something does (the drop SELECTION legitimately
    differs — latest submissions vs highest tiles — and is documented
    at the flag)."""
    from tpu_renderer.ops import binning
    from tpu_renderer.ops.binning import bin_triangles_queue

    edges = edges_for(4)  # sphere, ~2.2k triangles

    def both(**kw):
        q0 = bin_triangles_queue(edges, H, W, 8, 64, 64, col_split=2,
                                 **kw)
        binning.COMPACT_ENTRIES = True
        try:
            q1 = bin_triangles_queue(edges, H, W, 8, 64, 64, col_split=2,
                                     **kw)
        finally:
            binning.COMPACT_ENTRIES = False
        return q0, q1

    q0, q1 = both()
    assert int(q0.n_dropped) == 0
    n_real = int(np.asarray(q0.starts)[-1])
    for name, a, b in zip(q0._fields, q0, q1):
        a, b = np.asarray(a), np.asarray(b)
        if name == "sorted_tri":
            # Beyond the last tile's entry range the stream is padding
            # no work item ever reads; the two paths fill it differently
            # (sentinel-entry tri payloads vs zeros).
            a, b = a[:n_real], b[:n_real]
        np.testing.assert_array_equal(a, b, err_msg=f"{name} differs")

    # Overflow: same drop COUNT (selection differs by design).
    q0, q1 = both(budget_factor=0.25)
    assert int(q0.n_dropped) > 0
    assert int(q0.n_dropped) == int(q1.n_dropped)
    np.testing.assert_array_equal(
        np.asarray(q0.counts).sum(), np.asarray(q1.counts).sum()
    )


def test_mask_strategy_vmem_guard():
    """Explicit 'mask' with a capacity whose record blocks would blow VMEM
    must be rejected loudly, not OOM the chip."""
    edges = edges_for(4)
    with pytest.raises(ValueError, match="mask strategy"):
        rasterize_pallas(edges, 1024, 1920, 16384, None, None, 0, 0, "mask")


def test_narrow_queue_large_triangle_sidelist():
    """Narrow (tile_h=32, QUEUE_BLK) shaded path with n_large > 0.

    At tile_h=32 the entry expansion is 32 tiles, so forcing a triangle
    into the large side list needs a frame with > 32 tiles — a giant quad
    over a 256 x 1408 frame covers all 88. The in-kernel side-list fold
    (gid-aware merge) was previously only exercised through the wide
    (tile_h=8) path; this bit-compares the narrow path against the mask
    strategy, which has no side list at all."""
    import numpy as np

    from tpu_renderer.core.types import make_object
    from tpu_renderer.models.primitives import construct_cube, construct_quad
    from tpu_renderer.ops.binning import bin_triangles_queue
    from tpu_renderer.ops.raster_pallas import (
        _queue_expansion,
        rasterize_pallas_shaded,
    )

    h, w = 256, 1408
    sg, tr_d, li_d = scenes.baseline_scene(1, h, w)
    _, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
    cube = construct_cube()
    quad = construct_quad(16.0, color=(0.3, 0.9, 0.4, 1.0))
    quad["vertices"] = quad["vertices"] + np.float32([0.0, 0.0, -0.5])
    obj = make_object(
        (0.0, 0.0, 0.0),
        np.concatenate([cube["vertices"], quad["vertices"]]),
        np.concatenate([cube["colors"], quad["colors"]]),
        np.concatenate([cube["normals"], quad["normals"]]),
        np.concatenate([cube["uvs"], quad["uvs"]]),
    )
    from tpu_renderer.core.types import ObjectConfig

    cfg = ObjectConfig()
    edges = setup_triangles(obj, tr, li, cfg)

    # Positively assert the quad overflows the expansion into the side list.
    exp, bf = _queue_expansion(32, edges.num_triangles)
    assert exp == 32
    q = bin_triangles_queue(edges, h, w, 32, 128, 64, expansion=exp,
                            budget_factor=bf)
    assert int(q.n_large) == 2  # the quad's two triangles
    assert int(q.n_dropped) == 0

    outs = {}
    for strat in ("mask", "sorted"):
        cov, z, col, stats = rasterize_pallas_shaded(
            edges, tr, li, False, h, w, strategy=strat, tile_h=32
        )
        assert int(stats["bins_dropped"]) == 0
        outs[strat] = (np.asarray(cov), np.asarray(z), np.asarray(col))
    for a, b in zip(outs["mask"], outs["sorted"]):
        np.testing.assert_array_equal(a, b)
    assert outs["mask"][0].any()


@pytest.mark.parametrize("tile_h", [8, 32])
def test_sorted_skips_empty_tiles_bit_exact(tile_h):
    """The sorted path gives entry-less tiles NO grid step
    (bin_triangles_queue visit_empty=False) and masks their
    uninitialized output blocks back to the clear values afterwards —
    a corner object leaving most of a 256x512 frame empty must still
    bit-match the mask strategy (which visits every tile), and the
    empty region must carry the exact clear values."""
    from tpu_renderer.core.types import DEPTH_CLEAR, ObjectConfig, \
        make_object
    from tpu_renderer.models.primitives import construct_cube
    from tpu_renderer.ops.raster_pallas import rasterize_pallas_shaded

    h, w = 256, 512
    sg, tr_d, li_d = scenes.baseline_scene(1, h, w)
    _, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
    cube = construct_cube()
    # Push the cube toward the frame's top-left corner: with
    # screen_center at (w/2, h/2) the object covers only a few tiles.
    obj = make_object((-0.55, -0.35, 0.0), **cube)
    cfg = ObjectConfig(phong=True)
    edges = setup_triangles(obj, tr, li, cfg)

    outs = {}
    for strat in ("mask", "sorted"):
        cov, z, col, stats = rasterize_pallas_shaded(
            edges, tr, li, True, h, w, strategy=strat, tile_h=tile_h
        )
        assert int(stats["bins_dropped"]) == 0
        outs[strat] = (np.asarray(cov), np.asarray(z), np.asarray(col))
    for a, b in zip(outs["mask"], outs["sorted"]):
        np.testing.assert_array_equal(a, b)
    cov, z, col = outs["sorted"]
    assert cov.any() and not cov.all()
    # The bottom-right quadrant is far from the corner cube: exact clears.
    q = np.s_[h // 2:, w // 2:]
    assert not cov[q].any()
    assert (z[q] == DEPTH_CLEAR).all()
    assert (col[q] == 0).all()


def test_mask_dead_gather_equivalent():
    """MASK_DEAD_GATHER points dead (past-prefix) entries' gather indices
    at record row 0 (an on-chip A/B candidate: duplicate rows may gather
    cheaper than scattered ones). No kernel step ever reads those rows,
    so the rendered output must be bit-identical with the flag on or
    off; the QueueBins themselves must agree on everything except the
    dead tail of sorted_tri, which must be all zeros under the flag."""
    from tpu_renderer.ops import binning
    from tpu_renderer.ops.binning import bin_triangles_queue
    from tpu_renderer.ops.raster_pallas import rasterize_pallas_shaded

    sg, tr_d, li_d = scenes.baseline_scene(4, H, W)
    scene_j, tr, li = scenes.to_jax_scene(sg, tr_d, li_d)
    obj, cfg = scene_j[0]
    edges = setup_triangles(obj, tr, li, cfg)

    q0 = bin_triangles_queue(edges, H, W, 8, 128, 64)
    binning.MASK_DEAD_GATHER = True
    try:
        q1 = bin_triangles_queue(edges, H, W, 8, 128, 64)
        cov1, z1, col1, stats1 = rasterize_pallas_shaded(
            edges, tr, li, False, H, W, strategy="sorted"
        )
    finally:
        binning.MASK_DEAD_GATHER = False
    cov0, z0, col0, stats0 = rasterize_pallas_shaded(
        edges, tr, li, False, H, W, strategy="sorted"
    )

    n_kept = int(np.asarray(q0.starts)[-1])
    for name, a, b in zip(q0._fields, q0, q1):
        a, b = np.asarray(a), np.asarray(b)
        if name == "sorted_tri":
            np.testing.assert_array_equal(a[:n_kept], b[:n_kept])
            assert (b[n_kept:] == 0).all()
            assert n_kept < b.shape[0]  # the flag had a dead tail to mask
            continue
        np.testing.assert_array_equal(a, b, err_msg=f"{name} differs")
    assert int(stats0["bins_dropped"]) == int(stats1["bins_dropped"]) == 0
    for a, b in ((cov0, cov1), (z0, z1), (col0, col1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_budget_calibration_bit_identical_and_counted():
    """calibrate_budget_factor suggests a tightened BUDGET_FACTOR_OVERRIDE
    from one frame's realized stream utilization; applying it keeps the
    frame bit-identical with zero drops (the budget is pure capacity
    while it holds), and the new stats expose real demand."""
    from tpu_renderer.engine import renderer as R
    from tpu_renderer.ops import raster_pallas as rp

    scene_g, tr_d, li_d = scenes.baseline_scene(4, 256, 256)
    scene, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    stats = {}
    fb = R.render_scene(None, scene, tr, li, backend="pallas",
                        frame_height=256, frame_width=256, stats=stats)
    assert int(stats["bins_dropped"]) == 0
    assert int(stats["bins_real_entries"]) > 0
    util = float(stats["bins_budget_utilization"])
    assert 0.0 < util <= 1.0

    s = R.calibrate_budget_factor(scene, tr, li, 256, 256)
    assert s is not None and 0.0 < s <= float(stats["bins_budget_factor"])
    try:
        rp.BUDGET_FACTOR_OVERRIDE = s
        stats2 = {}
        fb2 = R.render_scene(None, scene, tr, li, backend="pallas",
                             frame_height=256, frame_width=256,
                             stats=stats2)
    finally:
        rp.BUDGET_FACTOR_OVERRIDE = None
    assert int(stats2["bins_dropped"]) == 0
    # Tightened budget, same real demand: utilization can only rise.
    assert float(stats2["bins_budget_utilization"]) >= util
    np.testing.assert_array_equal(np.asarray(fb.color), np.asarray(fb2.color))
    np.testing.assert_array_equal(np.asarray(fb.depth), np.asarray(fb2.depth))


def test_renderer_calibrate_api():
    """Renderer.calibrate() applies a validated per-renderer budget (no
    module global): tightens when safe, keeps frames bit-identical and
    drop-free, and refuses to loosen (round-5 productization)."""
    from tpu_renderer.engine.renderer import Renderer

    scene_g, tr_d, li_d = scenes.baseline_scene(4, 256, 256)
    scene, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    r = Renderer(256, 256, backend="pallas")
    fb0, stats0 = r.render(scene, tr, li, with_stats=True)
    assert int(stats0["bins_dropped"]) == 0

    applied = r.calibrate(scene, tr, li)
    if applied is not None:
        # A genuine tightening below every draw's policy factor.
        assert 0.0 < applied < float(stats0["bins_budget_factor_min"])
        assert r.budget_factor == applied
        fb1, stats1 = r.render(scene, tr, li, with_stats=True)
        assert int(stats1["bins_dropped"]) == 0
        np.testing.assert_array_equal(
            np.asarray(fb1.color), np.asarray(fb0.color)
        )
        np.testing.assert_array_equal(
            np.asarray(fb1.depth), np.asarray(fb0.depth)
        )
    else:
        # Refusal leaves the renderer untouched.
        assert r.budget_factor is None

    # A second calibration never loosens an applied budget: suggestions
    # are relative to the POLICY factor, so re-running returns the same
    # value or None — and the budget only ever moves to a validated one.
    before = r.budget_factor
    again = r.calibrate(scene, tr, li)
    if before is not None:
        assert r.budget_factor is not None
        assert r.budget_factor <= before * 1.0 + 1e-9 or again is None
