"""The five BASELINE.json benchmark scene configs, in both golden-dict and
JAX forms, so tests/bench/graft-entry share one definition.

Configs (BASELINE.json):
  1. Flat-shaded rotating cube, 512x512
  2. Gouraud-shaded OBJ mesh (Utah-teapot-class, via the Wavefront loader)
  3. Texture-mapped mesh, perspective-correct UVs
  4. Per-pixel Phong, multiple point lights, 1080p
  5. Multi-object animated scene for the TPU-mesh sharded path
"""

from __future__ import annotations

import numpy as np

from ..core.types import ObjectConfig, make_lights, make_object, make_transform
from .primitives import construct_cube, construct_quad, construct_torus
from .sphere import construct_sphere
from .textures import checkerboard

F = np.float32


def rotate_y(mesh: dict, angle: float) -> dict:
    """Rotate a mesh's vertices/normals about +y (the reference has no object
    rotation — its demo rotated vertices host-side before submission)."""
    c, s = np.cos(F(angle), dtype=F), np.sin(F(angle), dtype=F)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], F)
    out = dict(mesh)
    out["vertices"] = mesh["vertices"] @ rot.T
    out["normals"] = mesh["normals"] @ rot.T
    return out


def camera_for(height: int, width: int, dat: float = 3.0,
               m2p_scale: float = 1.2):
    """Camera framing the unit-ish meshes at the frame center."""
    m2p = m2p_scale * min(height, width)
    return dict(
        distance_above_target=float(dat),
        focal_length=1.0,
        meters_to_pixels=float(m2p),
        screen_center=(width / 2.0, height / 2.0),
    )


def default_lights():
    return dict(
        ambient=np.array([0.25, 0.25, 0.3, 1.0], F),
        light_p=np.array([[2.0, 2.0, 1.5], [-2.5, 1.0, 2.0]], F),
        light_intensity=np.array(
            [[0.9, 0.85, 0.8, 1.0], [0.25, 0.3, 0.45, 1.0]], F
        ),
    )


def baseline_scene(config: int, height: int, width: int, angle: float = 0.3):
    """Returns (scene_golden, transform_dict, lights_dict) for config 1-5.

    scene_golden: list of (obj_dict, cfg_dict) consumable by the golden; use
    ``to_jax_scene`` for the JAX form.
    """
    tr = camera_for(height, width)
    lights = default_lights()
    if config == 1:  # flat cube
        mesh = rotate_y(construct_cube(), angle)
        scene = [(dict(p=(0.0, 0.0, 0.0), **mesh), {})]
    elif config == 2:  # Gouraud-shaded OBJ mesh (teapot via the loader)
        from .teapot import construct_teapot

        mesh = rotate_y(construct_teapot(), angle)
        scene = [(dict(p=(0.0, 0.0, 0.0), **mesh), {})]
    elif config == 3:  # textured mesh, perspective-correct UVs, BILINEAR
        # (BASELINE.json config 3's contract names bilinear sampling; the
        # fused kernel samples it on the MXU — 4-texel one-hot + lerp.)
        mesh = rotate_y(construct_cube(), angle)
        scene = [
            (dict(p=(0.0, 0.0, 0.0), **mesh),
             {"texture": checkerboard(64, 64, 8),
              "filter_mode": "bilinear"})
        ]
    elif config == 4:  # phong multi-light
        mesh = construct_sphere()
        scene = [(dict(p=(0.0, 0.0, 0.0), **mesh), {"phong": True})]
    elif config == 5:  # multi-object
        sph = construct_sphere()
        tor = rotate_y(construct_torus(), angle)
        cub = rotate_y(construct_cube(0.7), -angle)
        quad = construct_quad(2.2)
        scene = [
            (dict(p=(-0.45, 0.3, 0.3), **sph), {"phong": True}),
            (dict(p=(0.55, -0.35, 0.0), **tor), {}),
            (dict(p=(0.5, 0.55, -0.3), **cub), {}),
            (dict(p=(0.0, 0.0, -1.0), **quad),
             {"texture": checkerboard(64, 64, 8)}),
        ]
    else:
        raise ValueError(f"config must be 1-5, got {config}")
    return scene, tr, lights


def to_jax_scene(scene_golden, tr_dict, lights_dict):
    """Convert golden-form scene to (scene, transform, lights) JAX pytrees."""
    transform = make_transform(
        tr_dict["distance_above_target"],
        tr_dict["focal_length"],
        tr_dict["meters_to_pixels"],
        tr_dict["screen_center"],
    )
    lights = make_lights(
        lights_dict["ambient"],
        lights_dict["light_p"],
        lights_dict["light_intensity"],
    )
    scene = []
    for obj_d, cfg_d in scene_golden:
        texture = cfg_d.get("texture")
        obj = make_object(
            obj_d["p"], obj_d["vertices"], obj_d["colors"],
            obj_d["normals"], obj_d["uvs"], texture,
        )
        cfg = ObjectConfig(
            phong=bool(cfg_d.get("phong", False)),
            textured=texture is not None,
            uv_mode=cfg_d.get("uv_mode", "scalar"),
            filter_mode=cfg_d.get("filter_mode", "nearest"),
        )
        scene.append((obj, cfg))
    return scene, transform, lights
