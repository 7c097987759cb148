"""Multi-chip sharding on the 8-virtual-device CPU mesh (SURVEY.md §4.3).

Both parallel modes must match the single-device render bit-exactly:
- tile parallelism: every pixel is computed by exactly one device with
  identical formulas, so equality is exact by construction;
- geometry parallelism: the all-gather + in-order fold reproduces the
  submission-order depth rule exactly.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from tpu_renderer.core.types import make_framebuffer
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.models import scenes
from tpu_renderer.parallel.mesh import (
    render_scene_geometry_sharded,
    render_scene_tiled,
)

H, W = 64, 512  # (2,4) tile mesh -> per-device 32x128 (one Pallas tile)


def build(config):
    scene_g, tr_d, li_d = scenes.baseline_scene(config, H, W)
    return scenes.to_jax_scene(scene_g, tr_d, li_d)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return np.array(jax.devices()[:8])


@pytest.mark.parametrize("config", [1, 5])
def test_tiled_matches_single_device(config, eight_devices):
    scene_j, tr, li = build(config)
    fb0 = render_scene(
        make_framebuffer(H, W), scene_j, tr, li, backend="reference"
    )
    mesh = Mesh(eight_devices.reshape(2, 4), ("ty", "tx"))
    fb1 = render_scene_tiled(scene_j, tr, li, H, W, mesh,
                             backend="reference")
    np.testing.assert_array_equal(np.asarray(fb1.color),
                                  np.asarray(fb0.color))
    np.testing.assert_array_equal(np.asarray(fb1.depth),
                                  np.asarray(fb0.depth))


def test_geometry_sharded_matches_single_device(eight_devices):
    scene_j, tr, li = build(1)
    fb0 = render_scene(
        make_framebuffer(H, W), scene_j, tr, li, backend="reference"
    )
    mesh = Mesh(eight_devices.reshape(2, 2, 2), ("tr", "ty", "tx"))
    fb1 = render_scene_geometry_sharded(
        scene_j, tr, li, H, W, mesh, backend="reference"
    )
    np.testing.assert_array_equal(np.asarray(fb1.color),
                                  np.asarray(fb0.color))
    np.testing.assert_array_equal(np.asarray(fb1.depth),
                                  np.asarray(fb0.depth))


def test_geometry_sharded_pallas_backend(eight_devices):
    # the pallas path (interpret mode on CPU) under shard_map
    scene_j, tr, li = build(1)
    fb0 = render_scene(
        make_framebuffer(H, W), scene_j, tr, li, backend="reference"
    )
    mesh = Mesh(eight_devices.reshape(8, 1, 1), ("tr", "ty", "tx"))
    fb1 = render_scene_geometry_sharded(
        scene_j, tr, li, H, W, mesh, backend="pallas"
    )
    c0, c1 = np.asarray(fb0.color), np.asarray(fb1.color)
    d0, d1 = np.asarray(fb0.depth), np.asarray(fb1.depth)
    assert 1.0 - (c0 == c1).mean() <= 0.002
    ok = (d0 == d1) | np.isclose(d0, d1, rtol=1e-6, atol=0.0)
    assert 1.0 - ok.mean() <= 0.005


def _multi_sphere_scene(n=5):
    """n same-config overlapping spheres at staggered depths/positions —
    depth ties and occlusion exercise the submission-order rule."""
    from tpu_renderer.core.types import ObjectConfig, make_object
    from tpu_renderer.models.sphere import construct_sphere

    mesh = construct_sphere(12)
    scene = []
    for i in range(n):
        p = (-0.6 + 0.3 * i, 0.15 * (i % 3) - 0.15, 0.2 * (i % 2))
        scene.append((make_object(p, **mesh), ObjectConfig()))
    return scene


def test_object_sharded_matches_single_device(eight_devices):
    from tpu_renderer.parallel.mesh import render_scene_object_sharded

    _, tr, li = build(1)
    scene = _multi_sphere_scene(5)  # pads to 8 objects over 8 shards
    fb0 = render_scene(
        make_framebuffer(H, W), scene, tr, li, backend="reference"
    )
    mesh = Mesh(eight_devices.reshape(8), ("obj",))
    fb1 = render_scene_object_sharded(
        scene, tr, li, H, W, mesh, backend="reference"
    )
    np.testing.assert_array_equal(np.asarray(fb1.color),
                                  np.asarray(fb0.color))
    np.testing.assert_array_equal(np.asarray(fb1.depth),
                                  np.asarray(fb0.depth))


def test_object_sharded_composes_with_tiles(eight_devices):
    from tpu_renderer.parallel.mesh import render_scene_object_sharded

    _, tr, li = build(1)
    scene = _multi_sphere_scene(4)
    fb0 = render_scene(
        make_framebuffer(H, W), scene, tr, li, backend="reference"
    )
    mesh = Mesh(eight_devices.reshape(2, 2, 2), ("obj", "ty", "tx"))
    fb1 = render_scene_object_sharded(
        scene, tr, li, H, W, mesh, backend="reference"
    )
    np.testing.assert_array_equal(np.asarray(fb1.color),
                                  np.asarray(fb0.color))
    np.testing.assert_array_equal(np.asarray(fb1.depth),
                                  np.asarray(fb0.depth))


def test_object_sharded_heterogeneous_configs(eight_devices):
    """Mixed-material scene (config 5: Phong + Gouraud + textured) under an
    ('obj','ty') mesh — objects group by config internally; the key-plane
    fold must reproduce single-device submission order bit-exactly."""
    from tpu_renderer.parallel.mesh import render_scene_object_sharded

    scene_j, tr, li = build(5)
    assert len({cfg for _, cfg in scene_j}) > 1  # genuinely heterogeneous
    fb0 = render_scene(
        make_framebuffer(H, W), scene_j, tr, li, backend="reference"
    )
    mesh = Mesh(eight_devices.reshape(4, 2), ("obj", "ty"))
    fb1 = render_scene_object_sharded(
        scene_j, tr, li, H, W, mesh, backend="reference"
    )
    np.testing.assert_array_equal(np.asarray(fb1.color),
                                  np.asarray(fb0.color))
    np.testing.assert_array_equal(np.asarray(fb1.depth),
                                  np.asarray(fb0.depth))


def test_2level_host_mesh_matches_single_device(eight_devices):
    """('host', 'ty') two-level mesh: triangles over the cross-host DCN
    axis, tiles over 'ty' — the fold must be bit-equal to single-device
    (submission order preserved: contiguous triangle shards fold in
    ascending host order)."""
    from tpu_renderer.parallel.mesh import render_scene_2level

    scene_j, tr, li = build(1)
    fb0 = render_scene(
        make_framebuffer(H, W), scene_j, tr, li, backend="reference"
    )
    mesh = Mesh(eight_devices.reshape(2, 4), ("host", "ty"))
    fb1 = render_scene_2level(
        scene_j, tr, li, H, W, mesh, backend="reference"
    )
    np.testing.assert_array_equal(np.asarray(fb1.color),
                                  np.asarray(fb0.color))
    np.testing.assert_array_equal(np.asarray(fb1.depth),
                                  np.asarray(fb0.depth))


def test_graft_entry_points(eight_devices):
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (256, 256)
    g.dryrun_multichip(8)


def test_gather_framebuffer_replicates(eight_devices):
    from tpu_renderer.parallel.mesh import gather_framebuffer

    scene_j, tr, li = build(1)
    mesh = Mesh(eight_devices.reshape(2, 4), ("ty", "tx"))
    fb_sharded = render_scene_tiled(scene_j, tr, li, H, W, mesh,
                                    backend="reference")
    fb_full = gather_framebuffer(fb_sharded, mesh)
    fb0 = render_scene(make_framebuffer(H, W), scene_j, tr, li,
                       backend="reference")
    np.testing.assert_array_equal(np.asarray(fb_full.color),
                                  np.asarray(fb0.color))
