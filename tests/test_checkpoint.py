"""Scene / framebuffer serialization round trips (SURVEY aux 5.4)."""

import numpy as np

from tpu_renderer.core.types import make_framebuffer
from tpu_renderer.models import scenes
from tpu_renderer.utils.checkpoint import (
    load_framebuffer,
    load_scene,
    save_framebuffer,
    save_scene,
)


def test_scene_round_trip(tmp_path):
    scene_g, tr_d, li_d = scenes.baseline_scene(5, 64, 64)
    scene, tr, li = scenes.to_jax_scene(scene_g, tr_d, li_d)
    p = str(tmp_path / "scene.npz")
    save_scene(p, scene, tr, li)
    scene2, tr2, li2 = load_scene(p)
    assert len(scene2) == len(scene)
    for (o1, c1), (o2, c2) in zip(scene, scene2):
        np.testing.assert_array_equal(np.asarray(o1.vertices),
                                      np.asarray(o2.vertices))
        assert c1 == c2
        assert (o1.texture is None) == (o2.texture is None)
    np.testing.assert_array_equal(np.asarray(li.light_p),
                                  np.asarray(li2.light_p))
    assert float(tr.meters_to_pixels) == float(tr2.meters_to_pixels)


def test_framebuffer_round_trip(tmp_path):
    fb = make_framebuffer(32, 64, clear_color=0xFF102030)
    p = str(tmp_path / "fb.npz")
    save_framebuffer(p, fb)
    fb2 = load_framebuffer(p)
    np.testing.assert_array_equal(np.asarray(fb.color), np.asarray(fb2.color))
    np.testing.assert_array_equal(np.asarray(fb.depth), np.asarray(fb2.depth))
