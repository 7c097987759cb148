"""Multi-chip rendering over a jax.sharding.Mesh (SURVEY.md §5.8).

The reference's only concurrency is a shared-memory work queue + a z-buffer
spinlock; its TPU-native analog is mesh sharding with XLA collectives over
ICI:

- **Tile parallelism** (axes 'ty', 'tx'): the framebuffer is sharded into
  per-device sub-rects; geometry is replicated (it is tiny next to pixel
  work). Each device runs the full pipeline on its rect — no communication
  at all until host readback, because every tile has exactly one owner
  (this is what makes the reference's ZMask spinlock unnecessary).
- **Geometry parallelism** (axis 'tr'): the triangle soup is sharded; each
  device rasterizes its triangle subset over its rect, then the visibility
  buffers are combined with an all-gather over 'tr' + a fold that keeps the
  reference's depth rule (larger z wins, lowest global triangle id keeps
  ties = submission order). The all-gather rides ICI; payload is
  (z, idx, packed color) per pixel.

Composed, a 3D mesh ('tr', 'ty', 'tx') gives geometry x tile parallelism.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.math import pack_argb
from ..core.types import (
    DEPTH_CLEAR,
    Framebuffer,
    LightData,
    ObjectConfig,
    ProjectiveTransform,
    RenderObject,
)
from ..engine.renderer import render_object
from ..geometry.vertex import setup_triangles
from ..ops.shading import shade

F32 = jnp.float32


def pad_scene_triangles(scene, multiple: int):
    """Pad each object's triangle soup to a multiple (degenerate triangles:
    all-zero vertices are backface-culled) so the soup splits evenly over
    the 'tr' axis."""
    out = []
    for obj, cfg in scene:
        v = obj.vertices.shape[0]
        t = v // 3
        pad_t = (-t) % multiple
        if pad_t:
            pv = pad_t * 3
            obj = RenderObject(
                p=obj.p,
                vertices=jnp.concatenate(
                    [obj.vertices, jnp.zeros((pv, 3), F32)]
                ),
                colors=jnp.concatenate([obj.colors, jnp.zeros((pv, 4), F32)]),
                normals=jnp.concatenate(
                    [obj.normals, jnp.zeros((pv, 3), F32)]
                ),
                uvs=jnp.concatenate([obj.uvs, jnp.zeros((pv, 2), F32)]),
                texture=obj.texture,
            )
        out.append((obj, cfg))
    return out


def render_scene_tiled(
    scene: Sequence[Tuple[RenderObject, ObjectConfig]],
    transform: ProjectiveTransform,
    lights: LightData,
    height: int,
    width: int,
    mesh: Mesh,
    backend: str = "pallas",
    clear_color: int = 0,
) -> Framebuffer:
    """Frame sharded over mesh axes ('ty', 'tx'); scene replicated.

    Returns a Framebuffer whose arrays are sharded P('ty', 'tx') — each
    device owns its sub-rect in HBM; no collective is needed (assemble on
    host readback, or all_gather explicitly if a replicated frame is
    wanted).
    """
    ny = mesh.shape["ty"]
    nx = mesh.shape["tx"]
    assert height % ny == 0 and width % nx == 0
    lh, lw = height // ny, width // nx
    cfgs = tuple(cfg for _, cfg in scene)
    objs = tuple(obj for obj, _ in scene)

    def per_device(objs, transform, lights):
        row0 = jax.lax.axis_index("ty") * lh
        col0 = jax.lax.axis_index("tx") * lw
        fb = Framebuffer(
            color=jnp.full((lh, lw), jnp.uint32(clear_color)),
            depth=jnp.full((lh, lw), DEPTH_CLEAR, F32),
        )
        for obj, cfg in zip(objs, cfgs):
            fb = render_object(
                fb, obj, transform, lights, cfg, backend,
                frame_height=height, frame_width=width,
                row0=row0, col0=col0,
            )
        return fb

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=Framebuffer(color=P("ty", "tx"), depth=P("ty", "tx")),
        check_vma=False,
    )
    return fn(objs, transform, lights)


def render_scene_geometry_sharded(
    scene: Sequence[Tuple[RenderObject, ObjectConfig]],
    transform: ProjectiveTransform,
    lights: LightData,
    height: int,
    width: int,
    mesh: Mesh,
    backend: str = "pallas",
    clear_color: int = 0,
) -> Framebuffer:
    """Triangles sharded over 'tr' (optionally x tiles over 'ty'/'tx').

    Each device draws its triangle shard into its (sub-)frame; shards are
    combined per object with an all-gather over 'tr' + a depth fold that
    keeps the reference's submission-order tie rule: since shard s owns the
    contiguous triangle range [s*Ts, (s+1)*Ts), smaller shard index ==
    earlier triangles, and within a shard the local winner already is the
    earliest — so folding shards in index order with strict > is exact.
    """
    n_tr = mesh.shape["tr"]
    ny = mesh.shape.get("ty", 1)
    nx = mesh.shape.get("tx", 1)
    assert height % ny == 0 and width % nx == 0
    lh, lw = height // ny, width // nx
    scene = pad_scene_triangles(scene, n_tr)
    cfgs = tuple(cfg for _, cfg in scene)
    objs = tuple(obj for obj, _ in scene)

    have_tiles = ("ty" in mesh.shape) or ("tx" in mesh.shape)

    obj_specs = tuple(
        RenderObject(
            p=P(), vertices=P("tr"), colors=P("tr"), normals=P("tr"),
            uvs=P("tr"), texture=None if obj.texture is None else P(),
        )
        for obj in objs
    )

    def per_device(objs, transform, lights):
        row0 = (jax.lax.axis_index("ty") * lh) if ny > 1 else 0
        col0 = (jax.lax.axis_index("tx") * lw) if nx > 1 else 0
        color = jnp.full((lh, lw), jnp.uint32(clear_color))
        depth = jnp.full((lh, lw), DEPTH_CLEAR, F32)
        for obj, cfg in zip(objs, cfgs):
            edges = setup_triangles(obj, transform, lights, cfg)
            if backend == "pallas":
                from ..ops.raster_pallas import rasterize_pallas

                covered, gbuf, _ = rasterize_pallas(
                    edges, lh, lw, None, height, width, row0, col0
                )
            else:
                from ..ops.raster_reference import rasterize_reference

                covered, gbuf = rasterize_reference(
                    edges, lh, lw, width, row0, col0
                )
            rgba, covered = shade(
                covered, gbuf, transform, lights, cfg, obj.texture,
                row0, col0,
            )
            packed = pack_argb(rgba)
            z = jnp.where(covered, gbuf[:, :, 0], DEPTH_CLEAR)

            # Combine shards over ICI: all-gather (z, color), fold in shard
            # order (earlier shard keeps depth ties).
            z_all = jax.lax.all_gather(z, "tr")  # (n_tr, lh, lw)
            c_all = jax.lax.all_gather(packed, "tr")
            obj_z = jnp.full_like(z, DEPTH_CLEAR)
            obj_c = jnp.zeros_like(packed)
            for s in range(n_tr):
                win = z_all[s] > obj_z
                obj_z = jnp.where(win, z_all[s], obj_z)
                obj_c = jnp.where(win, c_all[s], obj_c)

            win = obj_z > depth
            depth = jnp.where(win, obj_z, depth)
            color = jnp.where(win, obj_c, color)
        return Framebuffer(color=color, depth=depth)

    out_color = P("ty", "tx") if have_tiles else P()
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(obj_specs, P(), P()),
        out_specs=Framebuffer(color=out_color, depth=out_color),
        check_vma=False,
    )
    # Zip/unzip because shard_map wants pytrees matching in_specs.
    return fn(objs, transform, lights)


def gather_framebuffer(fb: Framebuffer, mesh: Mesh) -> Framebuffer:
    """All-gather a tile-sharded framebuffer into a replicated one (ICI).

    The tiled renderers return per-device sub-rects (no communication);
    call this when every device (or the host, cheaply) needs the full frame
    — e.g. before a device-side encode or a collective post-process.
    """
    # gather rows over 'ty' (axis 0) and cols over 'tx' (axis 1)
    def fixed(color, depth):
        c, d = color, depth
        if "ty" in mesh.shape:
            c = jax.lax.all_gather(c, "ty", axis=0, tiled=True)
            d = jax.lax.all_gather(d, "ty", axis=0, tiled=True)
        if "tx" in mesh.shape:
            c = jax.lax.all_gather(c, "tx", axis=1, tiled=True)
            d = jax.lax.all_gather(d, "tx", axis=1, tiled=True)
        return Framebuffer(color=c, depth=d)

    fn = shard_map(
        fixed,
        mesh=mesh,
        in_specs=(P("ty", "tx"), P("ty", "tx")),
        out_specs=Framebuffer(color=P(), depth=P()),
        check_vma=False,
    )
    return fn(fb.color, fb.depth)
