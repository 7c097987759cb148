"""Utility layer: image IO, transforms, profiling, renderer stats."""

import numpy as np
import jax.numpy as jnp

from tpu_renderer.core.types import make_object
from tpu_renderer.geometry.transform import (
    rotate_object,
    rotation_x,
    rotation_y,
    rotation_z,
    translate_object,
)
from tpu_renderer.utils.image import read_png, write_png, write_ppm
from tpu_renderer.utils.profiling import FrameTimer


def random_argb(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2**32, (h, w), np.uint64).astype(np.uint32)


class TestImage:
    def test_png_round_trip(self, tmp_path):
        img = random_argb(33, 47) | np.uint32(0xFF000000)
        p = str(tmp_path / "x.png")
        write_png(p, img)
        back = read_png(p)
        # RGB-only round trip (alpha forced opaque)
        np.testing.assert_array_equal(back & 0xFFFFFF, img & 0xFFFFFF)

    def test_png_alpha_round_trip(self, tmp_path):
        img = random_argb(16, 16)
        p = str(tmp_path / "a.png")
        write_png(p, img, alpha=True)
        np.testing.assert_array_equal(read_png(p), img)

    def test_ppm(self, tmp_path):
        img = random_argb(8, 8)
        p = str(tmp_path / "x.ppm")
        write_ppm(p, img)
        with open(p, "rb") as f:
            header = f.readline()
        assert header == b"P6\n"


class TestTransform:
    def test_rotation_orthonormal(self):
        for rot_fn in (rotation_x, rotation_y, rotation_z):
            r = np.asarray(rot_fn(0.7))
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)

    def test_rotate_object(self):
        obj = make_object(
            (0, 0, 0),
            np.float32([[1, 0, 0], [0, 1, 0], [0, 0, 1]]),
            np.ones((3, 4), np.float32),
            np.float32([[1, 0, 0], [0, 1, 0], [0, 0, 1]]),
            np.zeros((3, 2), np.float32),
        )
        spun = rotate_object(obj, rotation_y(jnp.float32(np.pi / 2)))
        # channel-major (3, 3, T) -> classic (V, 3) rows for the assertions
        v = np.asarray(spun.vertices)[:, :, 0].T
        np.testing.assert_allclose(v[0], [0, 0, -1], atol=1e-6)  # x -> -z
        np.testing.assert_allclose(v[1], [0, 1, 0], atol=1e-6)  # y fixed
        # normals rotate with vertices
        np.testing.assert_allclose(
            np.asarray(spun.normals)[:, :, 0].T, v, atol=1e-6
        )

    def test_translate(self):
        obj = make_object(
            (0, 0, 0), np.zeros((3, 3), np.float32),
            np.ones((3, 4), np.float32), np.ones((3, 3), np.float32),
            np.zeros((3, 2), np.float32),
        )
        moved = translate_object(obj, (1, 2, 3))
        np.testing.assert_array_equal(np.asarray(moved.p), [1, 2, 3])


class TestProfiling:
    def test_frame_timer(self):
        t = FrameTimer()
        for _ in range(3):
            with t.tick():
                pass
        s = t.summary()
        assert s["frames"] == 3
        assert s["fps"] > 0


class TestSSAA:
    def test_ssaa_smooths_edges(self):
        import jax
        from tpu_renderer.engine.antialias import render_scene_ssaa
        from tpu_renderer.engine.renderer import render_scene
        from tpu_renderer.core.types import make_framebuffer
        from tpu_renderer.models import scenes

        h = w = 64
        scene_g, tr_d, li_d = scenes.baseline_scene(1, h, w)
        scene_j, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
        fb1 = render_scene(make_framebuffer(h, w), scene_j, tr, li,
                           backend="reference")
        fb2 = render_scene_ssaa(scene_j, tr, li, h, w, factor=2,
                                backend="reference")
        c1, c2 = np.asarray(fb1.color), np.asarray(fb2.color)
        # SSAA introduces intermediate edge colors
        assert len(np.unique(c2)) > len(np.unique(c1))
        # interiors agree up to subsample-shift quantization
        both = (np.asarray(fb1.depth) > -3e38) & (np.asarray(fb2.depth) > -3e38)

        def chans(c):
            return np.stack(
                [(c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF], -1
            ).astype(np.int32)

        diff = np.abs(chans(c1)[both] - chans(c2)[both])
        assert np.median(diff) <= 2
        assert fb2.color.shape == (h, w)
