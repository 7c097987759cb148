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
- **Object parallelism** (axis 'obj'): whole models are sharded — the true
  analog of the reference's per-model work queue (``DoModelRenderWork``,
  projekt.cpp:3873-3878), except the reference ACCEPTED cross-model z races
  there (its per-model path skips the ZMask lock); here the shard fold is
  ordered and deterministic. Each device renders its contiguous slice of
  the object list in submission order, then shards fold over an ICI
  all-gather in shard order (earlier shard = earlier objects keep ties).

Composed, meshes like ('tr', 'ty', 'tx') or ('obj', 'ty', 'tx') give
geometry/object x tile parallelism.
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
from ..engine.renderer import render_object, render_scene
from ..geometry.vertex import setup_triangles
from ..ops.shading import shade

F32 = jnp.float32


def _pad_triangle_axis(obj: RenderObject, pad_t: int) -> RenderObject:
    """Append ``pad_t`` degenerate (all-zero => backface-culled) triangles
    along the minor triangle axis of every (C, 3, T) soup array."""
    if pad_t == 0:
        return obj

    def pad(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, pad_t)))

    return obj._replace(
        vertices=pad(obj.vertices),
        colors=pad(obj.colors),
        normals=pad(obj.normals),
        uvs=pad(obj.uvs),
    )


def pad_scene_triangles(scene, multiple: int):
    """Pad each object's triangle soup to a multiple (degenerate triangles:
    all-zero vertices are backface-culled) so the soup splits evenly over
    the 'tr' axis."""
    out = []
    for obj, cfg in scene:
        pad_t = (-obj.num_triangles) % multiple
        out.append((_pad_triangle_axis(obj, pad_t), cfg))
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
        # render_scene batches the whole scene into ONE kernel per device
        # when every object is fused-path-eligible (engine.renderer).
        return render_scene(
            fb, list(zip(objs, cfgs)), transform, lights, backend,
            frame_height=height, frame_width=width, row0=row0, col0=col0,
        )

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

    # Soup arrays are (C, 3, T): the triangle axis (minor) shards over 'tr'.
    tr_spec = P(None, None, "tr")
    obj_specs = tuple(
        RenderObject(
            p=P(), vertices=tr_spec, colors=tr_spec, normals=tr_spec,
            uvs=tr_spec, texture=None if obj.texture is None else P(),
        )
        for obj in objs
    )

    def per_device(objs, transform, lights):
        row0 = (jax.lax.axis_index("ty") * lh) if ny > 1 else 0
        col0 = (jax.lax.axis_index("tx") * lw) if nx > 1 else 0
        color = jnp.full((lh, lw), jnp.uint32(clear_color))
        depth = jnp.full((lh, lw), DEPTH_CLEAR, F32)
        for obj, cfg in zip(objs, cfgs):
            if backend == "pallas":
                from ..geometry.vertex import setup_records
                from ..ops.raster_pallas import rasterize_pallas

                rec_t = setup_records(obj, transform, lights, cfg)
                covered, gbuf, _ = rasterize_pallas(
                    rec_t, lh, lw, None, height, width, row0, col0
                )
            else:
                from ..ops.raster_reference import rasterize_reference

                edges = setup_triangles(obj, transform, lights, cfg)
                covered, gbuf = rasterize_reference(
                    edges, lh, lw, width, row0, col0
                )
            rgba, covered = shade(
                covered, gbuf, transform, lights, cfg, obj.texture,
                row0, col0,
            )
            packed = pack_argb(rgba)
            z = jnp.where(covered, gbuf[0], DEPTH_CLEAR)

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


def render_scene_object_sharded(
    scene: Sequence[Tuple[RenderObject, ObjectConfig]],
    transform: ProjectiveTransform,
    lights: LightData,
    height: int,
    width: int,
    mesh: Mesh,
    backend: str = "pallas",
    clear_color: int = 0,
) -> Framebuffer:
    """Whole objects sharded over 'obj' (optionally x tiles over 'ty'/'tx').

    The ``DoModelRenderWork`` analog (projekt.cpp:3873-3878): model-level
    parallel granularity. All objects must share one ObjectConfig (the
    reference's per-model work items likewise all ran the same draw path);
    soups are padded to a common triangle count (degenerate all-zero
    triangles are backface-culled) and stacked on a leading object axis
    sharded P('obj').

    Determinism: device s owns the contiguous object range
    [s*K, (s+1)*K); within a device, objects merge in submission order with
    the strict-greater z test, and the cross-shard fold runs in shard-index
    order — so depth ties resolve to the earliest-submitted object exactly
    as a single-device loop would (unlike the reference, which skipped the
    ZMask lock on this path and accepted cross-model races).
    """
    n_obj = mesh.shape["obj"]
    ny = mesh.shape.get("ty", 1)
    nx = mesh.shape.get("tx", 1)
    assert height % ny == 0 and width % nx == 0
    lh, lw = height // ny, width // nx

    cfgs = tuple(cfg for _, cfg in scene)
    assert len(set(cfgs)) == 1, (
        "'obj' sharding stacks objects on one axis; all objects must share "
        "one ObjectConfig (group heterogeneous scenes by config)"
    )
    cfg = cfgs[0]
    objs = [obj for obj, _ in scene]
    textures = [o.texture for o in objs]
    if cfg.textured:
        assert all(t is not None for t in textures)
        assert len({t.shape for t in textures}) == 1, (
            "'obj' sharding requires a common texture shape"
        )

    # Pad every soup to the max triangle count, then pad the object count to
    # a multiple of n_obj with fully degenerate (never-visible) objects.
    max_t = max(o.num_triangles for o in objs)
    padded = [_pad_triangle_axis(o, max_t - o.num_triangles) for o in objs]
    pad_o = (-len(padded)) % n_obj
    for _ in range(pad_o):
        z = padded[0]
        padded.append(RenderObject(
            p=jnp.zeros((3,), F32),
            vertices=jnp.zeros_like(z.vertices),
            colors=jnp.zeros_like(z.colors),
            normals=jnp.zeros_like(z.normals),
            uvs=jnp.zeros_like(z.uvs),
            texture=z.texture,
        ))
    n_local = len(padded) // n_obj

    stacked = RenderObject(
        p=jnp.stack([o.p for o in padded]),
        vertices=jnp.stack([o.vertices for o in padded]),
        colors=jnp.stack([o.colors for o in padded]),
        normals=jnp.stack([o.normals for o in padded]),
        uvs=jnp.stack([o.uvs for o in padded]),
        texture=(jnp.stack([o.texture for o in padded])
                 if cfg.textured else None),
    )
    obj_spec = RenderObject(
        p=P("obj"), vertices=P("obj"), colors=P("obj"), normals=P("obj"),
        uvs=P("obj"), texture=P("obj") if cfg.textured else None,
    )
    have_tiles = ("ty" in mesh.shape) or ("tx" in mesh.shape)

    def per_device(stacked, transform, lights):
        row0 = (jax.lax.axis_index("ty") * lh) if ny > 1 else 0
        col0 = (jax.lax.axis_index("tx") * lw) if nx > 1 else 0
        color = jnp.full((lh, lw), jnp.uint32(clear_color))
        depth = jnp.full((lh, lw), DEPTH_CLEAR, F32)
        for i in range(n_local):
            obj = RenderObject(
                p=stacked.p[i],
                vertices=stacked.vertices[i],
                colors=stacked.colors[i],
                normals=stacked.normals[i],
                uvs=stacked.uvs[i],
                texture=(stacked.texture[i] if cfg.textured else None),
            )
            fb = render_object(
                Framebuffer(color=color, depth=depth), obj, transform,
                lights, cfg, backend, frame_height=height,
                frame_width=width, row0=row0, col0=col0,
            )
            color, depth = fb.color, fb.depth

        # Fold shards in shard order over ICI: earlier shard = earlier
        # objects keep depth ties (strict >).
        z_all = jax.lax.all_gather(depth, "obj")  # (n_obj, lh, lw)
        c_all = jax.lax.all_gather(color, "obj")
        out_z = jnp.full_like(depth, DEPTH_CLEAR)
        out_c = jnp.full((lh, lw), jnp.uint32(clear_color))
        for s in range(n_obj):
            win = z_all[s] > out_z
            out_z = jnp.where(win, z_all[s], out_z)
            out_c = jnp.where(win, c_all[s], out_c)
        return Framebuffer(color=out_c, depth=out_z)

    out_spec = P("ty", "tx") if have_tiles else P()
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(obj_spec, P(), P()),
        out_specs=Framebuffer(color=out_spec, depth=out_spec),
        check_vma=False,
    )
    return fn(stacked, transform, lights)


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
