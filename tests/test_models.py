"""Model assets: the teapot OBJ pipeline (generator -> Wavefront text ->
loader -> renderable soup) and baseline config 2 using it end-to-end."""

import numpy as np

from tpu_renderer.golden import cpu_reference as gold
from tpu_renderer.models import scenes
from tpu_renderer.models.obj import load_obj
from tpu_renderer.models.teapot import construct_teapot, generate_teapot_obj


def test_teapot_obj_roundtrip():
    text = generate_teapot_obj()
    # real indexed OBJ: shared vertex/normal/uv lists + f statements
    assert text.count("\nv ") > 1000
    assert text.count("\nvn ") > 1000
    assert text.count("\nvt ") > 1000
    nfaces = text.count("\nf ")
    mesh = load_obj(text, color_ramp=True)
    T = mesh["vertices"].shape[0] // 3
    assert T == nfaces  # generator emits triangles only
    assert 3000 < T < 20000  # teapot-class density
    for key, width in (("vertices", 3), ("colors", 4),
                       ("normals", 3), ("uvs", 2)):
        assert mesh[key].shape == (3 * T, width)
        assert mesh[key].dtype == np.float32
    # shading normals are unit length
    ln = np.linalg.norm(mesh["normals"], axis=-1)
    assert np.abs(ln - 1.0).max() < 1e-3


def test_teapot_winding_matches_normals():
    # triangle geometric normals agree with shading normals (outward), the
    # property the backface cull keys on
    mesh = construct_teapot()
    v = mesh["vertices"].reshape(-1, 3, 3)
    n = mesh["normals"].reshape(-1, 3, 3)
    geo = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    dots = np.einsum("ij,ij->i", geo, n.sum(1))
    assert (dots >= 0).all()


def test_config2_renders_teapot_via_obj_loader():
    scene_g, tr_d, li_d = scenes.baseline_scene(2, 128, 128)
    T = scene_g[0][0]["vertices"].shape[0] // 3
    assert T > 3000  # the OBJ teapot, not a stand-in primitive
    c, d = gold.render(scene_g, tr_d, li_d, 128, 128)
    covered = (d > np.float32(-3.0e38)).sum()
    assert covered > 1500  # teapot silhouette at 128x128
    # spout/handle silhouette: coverage extends well past the body's width
    cols = np.nonzero((d > np.float32(-3.0e38)).any(0))[0]
    assert cols.max() - cols.min() > 70
