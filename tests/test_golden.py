"""Unit tests for the NumPy golden reference (the behavioral spec).

These pin the reference semantics reconstructed in SURVEY.md §2: projection
math, backface culling, edge setup gradients, span coverage, z rules, Gouraud
lighting, texture addressing, and the ARGB pack.
"""

import numpy as np
import pytest

from tpu_renderer.golden import cpu_reference as gold
from tpu_renderer.models.primitives import (
    construct_cube,
    construct_quad,
    construct_torus,
)
from tpu_renderer.models.sphere import construct_sphere
from tpu_renderer.models.textures import checkerboard

F = np.float32


def tri_obj(v0, v1, v2, colors=None):
    v = np.array([v0, v1, v2], F)
    return dict(
        p=(0, 0, 0),
        vertices=v,
        colors=np.ones((3, 4), F) if colors is None else np.asarray(colors, F),
        normals=np.tile(np.float32([0, 0, 1]), (3, 1)),
        uvs=np.array([[0, 0], [1, 0], [0, 1]], F),
    )


def no_lights():
    return dict(
        ambient=(1, 1, 1, 1),
        light_p=np.zeros((0, 3), F),
        light_intensity=np.zeros((0, 4), F),
    )


class TestProjection:
    def test_center_vertex_projects_to_screen_center(self, transform_dict):
        p = gold.project_vertex(np.array([0, 0, 0], F), transform_dict)
        np.testing.assert_allclose(p[:2], [128.0, 128.0])
        assert p[2] == F(3.0)  # stored z = DistanceToPZ (projekt.cpp:89)

    def test_formula_matches_reference_op_order(self, transform_dict):
        cam = np.array([0.3, -0.7, 1.1], F)
        p = gold.project_vertex(cam, transform_dict)
        dz = F(3.0) - cam[2]
        s = (F(1) / dz) * F(1.0)
        assert p[0] == F(128.0) + F(300.0) * (s * cam[0])
        assert p[1] == F(128.0) + F(300.0) * (s * cam[1])

    def test_near_plane_degenerates_to_zero(self, transform_dict):
        # DistanceToPZ <= 0.2 projects to the zero vector, no real clipping
        # (projekt.cpp:82-90).
        cam = np.array([1.0, 1.0, 2.9], F)  # dz = 0.1 < 0.2
        p = gold.project_vertex(cam, transform_dict)
        np.testing.assert_array_equal(p, [0, 0, 0])

    def test_unproject_inverts_project(self, transform_dict):
        cam = np.array([0.4, 0.2, -0.5], F)
        p = gold.project_vertex(cam, transform_dict)
        back = gold.unproject_vertex(p[0], p[1], F(3.0) - p[2], transform_dict)
        # unproject takes camera z; stored projected z is dz = DAT - z
        np.testing.assert_allclose(back, cam, atol=1e-6)


class TestCulling:
    def test_cw_screen_winding_is_visible(self, transform_dict):
        cw = tri_obj([-0.5, -0.5, 0], [0.0, 0.5, 0], [0.5, -0.5, 0])
        edges = gold.setup_edges(cw, transform_dict, no_lights())
        assert edges["visible"][0]

    def test_ccw_screen_winding_is_culled(self, transform_dict):
        ccw = tri_obj([-0.5, -0.5, 0], [0.5, -0.5, 0], [0.0, 0.5, 0])
        edges = gold.setup_edges(ccw, transform_dict, no_lights())
        assert not edges["visible"][0]

    def test_degenerate_triangle_culled(self, transform_dict):
        deg = tri_obj([0, 0, 0], [0, 0, 0], [0, 0, 0])
        edges = gold.setup_edges(deg, transform_dict, no_lights())
        assert not edges["visible"][0]


class TestEdgeSetup:
    def test_three_edges_unless_horizontal(self, transform_dict):
        t = tri_obj([-0.5, -0.5, 0], [0.0, 0.5, 0], [0.5, -0.5, 0])
        edges = gold.setup_edges(t, transform_dict, no_lights())
        # bottom edge (v0->v2) is horizontal in screen space -> rejected
        # (projekt.cpp:4066)
        assert edges["valid"][0].sum() == 2

    def test_gradients_use_rounded_y_diff(self, transform_dict):
        t = tri_obj([-0.5, -0.4, 0.2], [0.0, 0.5, -0.3], [0.5, -0.5, 0.1])
        edges = gold.setup_edges(t, transform_dict, no_lights())
        v = edges["valid"][0]
        ymin, ymax = edges["ymin"][0][v], edges["ymax"][0][v]
        # z gradient spans cam-z difference over ROUNDED integer y range
        # (projekt.cpp:4070-4072)
        assert np.all(ymax > ymin)

    def test_top_clip_shifts_attrs(self, transform_dict):
        # Triangle poking above screen top (y<0 after projection):
        # min y < 0 clamps ymin to 0 and advances x/z by ClippedY*gradient
        # (projekt.cpp:3990-3997, 4075-4076).
        t = tri_obj([-0.5, -3.0, 0], [0.0, 3.0, 0], [0.5, -3.0, 0])
        edges = gold.setup_edges(t, transform_dict, no_lights())
        v = edges["valid"][0]
        assert np.all(edges["ymin"][0][v] >= 0)


class TestRaster:
    def test_spans_inclusive(self, transform_dict):
        # A screen-axis-aligned right triangle: row coverage is
        # [round(xl), round(xr)] inclusive (projekt.cpp:423-425).
        t = tri_obj([-0.2, -0.2, 0], [-0.2, 0.2, 0], [0.2, -0.2, 0])
        edges = gold.setup_edges(t, transform_dict, no_lights())
        covered, gbuf = gold.rasterize(edges, 256, 256)
        assert covered.sum() > 0
        rows = np.nonzero(covered.any(axis=1))[0]
        for y in rows:
            xs = np.nonzero(covered[y])[0]
            assert np.all(np.diff(xs) == 1)  # contiguous span

    def test_z_larger_wins_first_wins_ties(self, transform_dict):
        near = tri_obj([-0.5, -0.5, 0.5], [0.0, 0.5, 0.5], [0.5, -0.5, 0.5],
                       colors=np.tile(np.float32([1, 0, 0, 1]), (3, 1)))
        far = tri_obj([-0.5, -0.5, -0.5], [0.0, 0.5, -0.5], [0.5, -0.5, -0.5],
                      colors=np.tile(np.float32([0, 1, 0, 1]), (3, 1)))
        same = tri_obj([-0.5, -0.5, 0.5], [0.0, 0.5, 0.5], [0.5, -0.5, 0.5],
                       colors=np.tile(np.float32([0, 0, 1, 1]), (3, 1)))
        L = no_lights()
        # far drawn after near: near wins everywhere they overlap
        c, d = gold.render(
            [(near, {}), (far, {})], transform_dict, L, 256, 256
        )
        overlap = d > gold.DEPTH_CLEAR
        assert np.all(d[overlap] == F(0.5)) or np.any(d[overlap] == F(-0.5))
        center = c[128, 118]
        assert center == np.uint32(0xFFFF0000)  # red (near)
        # equal z drawn after: first writer keeps the pixel (strict >,
        # projekt.cpp:495)
        c2, _ = gold.render(
            [(near, {}), (same, {})], transform_dict, L, 256, 256
        )
        assert c2[128, 118] == np.uint32(0xFFFF0000)

    def test_offscreen_right_clamps_to_last_column(self, transform_dict):
        # Reference clamps spans into the frame instead of rejecting them
        # (projekt.cpp:381-400): fully offscreen-right spans paint x = W-1.
        t = tri_obj([5.0, -0.5, 0], [5.5, 0.5, 0], [6.0, -0.5, 0])
        edges = gold.setup_edges(t, transform_dict, no_lights())
        covered, _ = gold.rasterize(edges, 256, 256)
        cols = np.nonzero(covered.any(axis=0))[0]
        assert list(cols) == [255]


class TestGouraud:
    def test_ambient_plus_diffuse_clamped(self, transform_dict, lights_dict):
        col = gold.gouraud_vertex_color(
            np.float32([1, 0, 0, 1]),
            np.float32([0, 0, 1]),
            np.float32([0, 0, 0]),
            lights_dict,
            textured=False,
        )
        assert col.shape == (4,)
        assert np.all(col >= 0) and np.all(col <= 1)

    def test_textured_uses_white_base(self, transform_dict, lights_dict):
        c1 = gold.gouraud_vertex_color(
            np.float32([1, 0, 0, 1]), np.float32([0, 0, 1]),
            np.float32([0, 0, 0]), lights_dict, textured=True,
        )
        c2 = gold.gouraud_vertex_color(
            np.float32([0, 1, 0, 1]), np.float32([0, 0, 1]),
            np.float32([0, 0, 0]), lights_dict, textured=True,
        )
        np.testing.assert_array_equal(c1, c2)  # projekt.cpp:4036-4037

    def test_zero_lights_passthrough(self, transform_dict):
        col = gold.gouraud_vertex_color(
            np.float32([0.2, 0.4, 0.6, 1]), np.float32([0, 0, 1]),
            np.float32([0, 0, 0]), no_lights(), textured=False,
        )
        np.testing.assert_array_equal(col, np.float32([0.2, 0.4, 0.6, 1]))


class TestTexture:
    def test_scalar_mode_round_dim_minus_1(self):
        tex = checkerboard(8, 8, cell=4)
        rgba, mask = gold.sample_texture(tex, F(0.0), F(0.0), "scalar")
        assert mask
        # cell (0,0) is color_b (blue)
        np.testing.assert_allclose(
            rgba, [40 / 255, 40 / 255, 160 / 255, 1], atol=1e-6
        )
        rgba2, _ = gold.sample_texture(tex, F(1.0), F(0.0), "scalar")
        np.testing.assert_allclose(rgba2, [1, 1, 1, 1])  # x=7 -> white cell

    def test_avx_mode_masks_outside_01(self):
        tex = checkerboard(8, 8)
        _, mask = gold.sample_texture(tex, F(1.5), F(0.5), "avx")
        assert not mask
        _, mask2 = gold.sample_texture(tex, F(0.5), F(0.5), "avx")
        assert mask2


class TestPack:
    def test_argb_pack_layout(self):
        rgba = np.float32([1.0, 0.5, 0.0, 1.0]).reshape(1, 1, 4)
        packed = gold.pack_argb(rgba)
        assert packed[0, 0] == np.uint32(0xFFFF8000)

    def test_round_half_away(self):
        assert gold.roundf(F(0.5)) == 1.0
        assert gold.roundf(F(-0.5)) == -1.0
        assert gold.roundf(F(2.5)) == 3.0
        assert gold.roundf(F(127.5)) == 128.0


class TestEndToEnd:
    def test_cube_flat(self, transform_dict):
        obj = dict(p=(0, 0, 0), **construct_cube())
        c, d = gold.render([(obj, {})], transform_dict, no_lights(), 256, 256)
        cov = d > gold.DEPTH_CLEAR
        assert 10000 < cov.sum() < 40000
        assert d[cov].max() == F(0.5)  # front face camera z

    def test_sphere_phong(self, transform_dict, lights_dict):
        obj = dict(p=(0, 0, 0), **construct_sphere())
        c, d = gold.render(
            [(obj, {"phong": True})], transform_dict, lights_dict, 128, 128
        )
        cov = d > gold.DEPTH_CLEAR
        assert cov.sum() > 1500
        assert len(np.unique(c[cov])) > 100  # smooth shading variety

    def test_textured_quad(self, transform_dict, lights_dict):
        obj = dict(p=(0, 0, 0), **construct_quad())
        tex = checkerboard()
        c, d = gold.render(
            [(obj, {"texture": tex})], transform_dict, lights_dict, 256, 256
        )
        cov = d > gold.DEPTH_CLEAR
        vals = np.unique(c[cov])
        # unlit texture passthrough: exactly the two checker colors
        assert set(vals) == {np.uint32(0xFFFFFFFF), np.uint32(0xFF2828A0)}


class TestBilinear:
    def test_bilinear_interpolates_between_texels(self):
        # 2x2 texture: black and white corners; center uv samples mid-gray
        tex = np.array([[0xFF000000, 0xFFFFFFFF],
                        [0xFFFFFFFF, 0xFF000000]], np.uint32)
        rgba, mask = gold.sample_texture(
            tex, F(0.5), F(0.5), "scalar", "bilinear"
        )
        assert mask
        np.testing.assert_allclose(rgba[:3], [0.5, 0.5, 0.5], atol=1e-6)

    def test_bilinear_matches_jax(self, transform_dict, lights_dict):
        import jax.numpy as jnp
        from tpu_renderer.ops.shading import sample_texture as jax_sample

        tex = checkerboard(16, 16, cell=3)
        rng = np.random.RandomState(3)
        u = rng.rand(64).astype(F)
        v = rng.rand(64).astype(F)
        g_rgba, _ = gold.sample_texture(tex, u, v, "scalar", "bilinear")
        j_rgba, _ = jax_sample(jnp.asarray(tex), jnp.asarray(u),
                               jnp.asarray(v), "scalar", "bilinear")
        np.testing.assert_allclose(np.asarray(j_rgba), g_rgba, atol=2e-7)

    def test_end_to_end_bilinear_quad(self, transform_dict, lights_dict):
        obj = dict(p=(0, 0, 0), **construct_quad())
        tex = checkerboard(8, 8, cell=1)
        c, d = gold.render(
            [(obj, {"texture": tex, "filter_mode": "bilinear"})],
            transform_dict, lights_dict, 128, 128,
        )
        cov = d > gold.DEPTH_CLEAR
        # bilinear produces intermediate colors (more unique values than the
        # two checker colors)
        assert len(np.unique(c[cov])) > 10
