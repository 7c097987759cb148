"""Scene / framebuffer serialization (SURVEY.md §5.4 — absent in the
reference; the renderer is stateless per frame, so "checkpoint/resume" here
means saving and restoring scenes, camera/light setups, and rendered frames).

Plain .npz — no external dependencies, stable across versions.
"""

from __future__ import annotations

import json

import numpy as np

from ..core.types import (
    Framebuffer,
    LightData,
    ObjectConfig,
    ProjectiveTransform,
    RenderObject,
    make_lights,
    make_object,
    make_transform,
)


def save_scene(path, scene, transform: ProjectiveTransform,
               lights: LightData) -> None:
    """Save (scene, transform, lights) to an .npz file.

    scene: list of (RenderObject, ObjectConfig).
    """
    from ..core.types import classic_arrays

    blobs = {}
    meta = []
    for i, (obj, cfg) in enumerate(scene):
        # Serialize in the classic (V, C) vertex-major form — a stable
        # on-disk format independent of the device layout; make_object
        # converts back on load.
        classic = classic_arrays(obj)
        blobs[f"obj{i}_p"] = np.asarray(obj.p)
        blobs[f"obj{i}_vertices"] = classic["vertices"]
        blobs[f"obj{i}_colors"] = classic["colors"]
        blobs[f"obj{i}_normals"] = classic["normals"]
        blobs[f"obj{i}_uvs"] = classic["uvs"]
        if obj.texture is not None:
            blobs[f"obj{i}_texture"] = np.asarray(obj.texture)
        meta.append(
            dict(phong=cfg.phong, textured=cfg.textured, uv_mode=cfg.uv_mode,
                 filter_mode=cfg.filter_mode,
                 has_texture=obj.texture is not None)
        )
    blobs["transform"] = np.array(
        [
            float(transform.distance_above_target),
            float(transform.focal_length),
            float(transform.meters_to_pixels),
            float(transform.screen_center[0]),
            float(transform.screen_center[1]),
        ],
        np.float32,
    )
    blobs["ambient"] = np.asarray(lights.ambient)
    blobs["light_p"] = np.asarray(lights.light_p)
    blobs["light_intensity"] = np.asarray(lights.light_intensity)
    blobs["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **blobs)


def load_scene(path):
    """Load a scene saved by save_scene -> (scene, transform, lights)."""
    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    scene = []
    for i, m in enumerate(meta):
        obj = make_object(
            data[f"obj{i}_p"],
            data[f"obj{i}_vertices"],
            data[f"obj{i}_colors"],
            data[f"obj{i}_normals"],
            data[f"obj{i}_uvs"],
            data[f"obj{i}_texture"] if m["has_texture"] else None,
        )
        cfg = ObjectConfig(
            phong=m["phong"], textured=m["textured"], uv_mode=m["uv_mode"],
            filter_mode=m.get("filter_mode", "nearest"),
        )
        scene.append((obj, cfg))
    t = data["transform"]
    transform = make_transform(
        float(t[0]), float(t[1]), float(t[2]), (float(t[3]), float(t[4]))
    )
    lights = make_lights(
        data["ambient"], data["light_p"], data["light_intensity"]
    )
    return scene, transform, lights


def save_framebuffer(path, fb: Framebuffer) -> None:
    np.savez_compressed(
        path, color=np.asarray(fb.color), depth=np.asarray(fb.depth)
    )


def load_framebuffer(path) -> Framebuffer:
    import jax.numpy as jnp

    data = np.load(path)
    return Framebuffer(
        color=jnp.asarray(data["color"]), depth=jnp.asarray(data["depth"])
    )
