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

# Winner-key plane sentinel: no object has written this pixel. Any real
# object index compares smaller, so the tie-break fold leaves untouched
# pixels to the clear color.
_NO_WINNER = 2 ** 31 - 1


def _tile_out_spec(mesh: Mesh):
    """Framebuffer PartitionSpec naming only the tile axes the mesh has
    (a spec may not reference absent axes — ('obj','ty') has no 'tx')."""
    return P(
        "ty" if "ty" in mesh.shape else None,
        "tx" if "tx" in mesh.shape else None,
    )


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
    tr_axis: str = "tr",
) -> Framebuffer:
    """Triangles sharded over 'tr' (optionally x tiles over 'ty'/'tx').

    Each device draws its triangle shard of EVERY object into a local
    (z, color, object-key) accumulator, then shards combine with ONE
    all-gather over 'tr' per frame — the collective count is independent
    of the scene's object count (a dozen-object scene used to pay a dozen
    ICI round-trips per frame).

    The fold keeps the reference's submission-order depth rule exactly:
    the key plane records each pixel's winning OBJECT index, so the
    cross-shard fold resolves equal-z pixels to the smaller key (earlier
    object). For equal z AND equal key (one object's triangles split
    across shards), folding in ascending shard order with strict > keeps
    the earlier shard — and shard s owns the contiguous triangle range
    [s*Ts, (s+1)*Ts), so the earlier shard IS the earlier triangle.

    ``tr_axis`` renames the geometry axis — render_scene_2level passes
    'host' so the one per-frame collective rides the cross-host (DCN)
    axis of a two-level mesh.
    """
    n_tr = mesh.shape[tr_axis]
    ny = mesh.shape.get("ty", 1)
    nx = mesh.shape.get("tx", 1)
    assert height % ny == 0 and width % nx == 0
    lh, lw = height // ny, width // nx
    scene = pad_scene_triangles(scene, n_tr)
    cfgs = tuple(cfg for _, cfg in scene)
    objs = tuple(obj for obj, _ in scene)

    have_tiles = ("ty" in mesh.shape) or ("tx" in mesh.shape)

    # Soup arrays are (C, 3, T): the triangle axis (minor) shards over 'tr'.
    tr_spec = P(None, None, tr_axis)
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
        okey = jnp.full((lh, lw), _NO_WINNER, jnp.int32)
        for i, (obj, cfg) in enumerate(zip(objs, cfgs)):
            if backend == "pallas":
                from ..ops.raster_pallas import rasterize_pallas
                from ..ops.setup_pallas import setup_for_raster

                rec_t = setup_for_raster(
                    obj, transform, lights, cfg,
                    frame_height=height, frame_width=width,
                )
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

            # Local merge in submission order: strict > keeps the earlier
            # object on ties (first writer), exactly the single-device rule.
            win = z > depth
            depth = jnp.where(win, z, depth)
            color = jnp.where(win, packed, color)
            okey = jnp.where(win, jnp.int32(i), okey)

        # ONE collective per frame: all-gather (z, color, key) over 'tr'
        # and fold in ascending shard order — (greater z) wins, equal z
        # resolves to the smaller object key, and equal z + equal key
        # (same object split across shards) to the earlier shard.
        z_all = jax.lax.all_gather(depth, tr_axis)  # (n_tr, lh, lw)
        c_all = jax.lax.all_gather(color, tr_axis)
        k_all = jax.lax.all_gather(okey, tr_axis)
        out_z = jnp.full_like(depth, DEPTH_CLEAR)
        out_c = jnp.full_like(color, jnp.uint32(clear_color))
        out_k = jnp.full_like(okey, _NO_WINNER)
        for s in range(n_tr):
            win = (z_all[s] > out_z) | (
                (z_all[s] == out_z) & (k_all[s] < out_k)
            )
            out_z = jnp.where(win, z_all[s], out_z)
            out_c = jnp.where(win, c_all[s], out_c)
            out_k = jnp.where(win, k_all[s], out_k)
        return Framebuffer(color=out_c, depth=out_z)

    out_color = _tile_out_spec(mesh) if have_tiles else P()
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(obj_specs, P(), P()),
        out_specs=Framebuffer(color=out_color, depth=out_color),
        check_vma=False,
    )
    # Zip/unzip because shard_map wants pytrees matching in_specs.
    return fn(objs, transform, lights)


def render_scene_2level(
    scene: Sequence[Tuple[RenderObject, ObjectConfig]],
    transform: ProjectiveTransform,
    lights: LightData,
    height: int,
    width: int,
    mesh: Mesh,
    backend: str = "pallas",
    clear_color: int = 0,
) -> Framebuffer:
    """Two-level DCN x ICI mesh: geometry over the cross-host 'host' axis,
    framebuffer tiles over 'ty'/'tx' within each host's chip slice.

    Deployment layout: build the mesh with hosts OUTERMOST (e.g.
    ``mesh_utils.create_hybrid_device_mesh((n_hosts, chips_per_host),
    ...)`` or ``Mesh(np.array(jax.devices()).reshape(n_hosts, -1),
    ('host', 'ty'))`` — jax.devices() orders devices process-major, so
    rows of the reshape are per-host chip groups). Communication then
    splits by level exactly as the axes do:

    - 'ty'/'tx' (intra-host, ICI): NO collective at all — every tile has
      one owner (the property that already replaced the reference's ZMask
      spinlock, projekt.cpp:1378-1409).
    - 'host' (DCN): the ONE per-frame collective — the (z, color, key)
      all-gather + ordered fold of render_scene_geometry_sharded — rides
      the slow inter-host links, and its payload is each host's LOCAL
      tile rect (height/ny x width/nx x 9 bytes), not the full frame.

    Each host rasterizes its contiguous triangle shard (submission-order
    contiguous, so the ordered fold keeps the reference's first-writer
    depth ties exactly); the fold is bit-equal to the unsharded render
    (asserted by dryrun_multichip shape 4 and tests/test_parallel.py).
    """
    return render_scene_geometry_sharded(
        scene, transform, lights, height, width, mesh, backend,
        clear_color, tr_axis="host",
    )


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
    parallel granularity for HETEROGENEOUS scenes — objects are grouped
    internally by (ObjectConfig, texture shape) (the reference's per-model
    work items likewise carried mixed models, projekt.h:90-98); each group
    is padded to a common triangle count (degenerate all-zero triangles
    are backface-culled), stacked on a leading object axis sharded
    P('obj'), and every device renders its slice of every group.

    Determinism: a per-pixel KEY plane carries the winning object's
    submission index. Local merges and the cross-shard fold resolve equal
    depths to the smaller key — the submission-order rule — regardless of
    the group-major local draw order; the fold costs ONE all-gather of
    (z, color, key) per frame, independent of object or group count
    (unlike the reference, which skipped the ZMask lock on this path and
    accepted cross-model races).
    """
    n_obj = mesh.shape["obj"]
    ny = mesh.shape.get("ty", 1)
    nx = mesh.shape.get("tx", 1)
    assert height % ny == 0 and width % nx == 0
    lh, lw = height // ny, width // nx

    # Group by draw path: config + texture shape (stacking needs uniform
    # array shapes; the config is a static trace-time switch).
    group_index: dict = {}
    groups: list = []  # [(cfg, [(submission_index, obj), ...])]
    for i, (obj, cfg) in enumerate(scene):
        tex_shape = (
            tuple(obj.texture.shape) if obj.texture is not None else None
        )
        if cfg.textured:
            assert obj.texture is not None
        gk = (cfg, tex_shape)
        if gk not in group_index:
            group_index[gk] = len(groups)
            groups.append((cfg, []))
        groups[group_index[gk]][1].append((i, obj))

    def degenerate_like(o: RenderObject) -> RenderObject:
        return RenderObject(
            p=jnp.zeros((3,), F32),
            vertices=jnp.zeros_like(o.vertices),
            colors=jnp.zeros_like(o.colors),
            normals=jnp.zeros_like(o.normals),
            uvs=jnp.zeros_like(o.uvs),
            texture=o.texture,
        )

    # Per group: pad soups to the group max, pad the object count to a
    # multiple of n_obj, stack, and record each slot's submission key
    # (_NO_WINNER for padding slots — they never draw a pixel anyway).
    stacked_groups = []  # (cfg, stacked RenderObject, keys (n,) static)
    for cfg, members in groups:
        max_t = max(o.num_triangles for _, o in members)
        padded = [
            (i, _pad_triangle_axis(o, max_t - o.num_triangles))
            for i, o in members
        ]
        for _ in range((-len(padded)) % n_obj):
            padded.append((_NO_WINNER, degenerate_like(padded[0][1])))
        keys = tuple(i for i, _ in padded)
        objs = [o for _, o in padded]
        stacked = RenderObject(
            p=jnp.stack([o.p for o in objs]),
            vertices=jnp.stack([o.vertices for o in objs]),
            colors=jnp.stack([o.colors for o in objs]),
            normals=jnp.stack([o.normals for o in objs]),
            uvs=jnp.stack([o.uvs for o in objs]),
            texture=(jnp.stack([o.texture for o in objs])
                     if objs[0].texture is not None else None),
        )
        stacked_groups.append((cfg, stacked, keys))

    obj_specs = tuple(
        RenderObject(
            p=P("obj"), vertices=P("obj"), colors=P("obj"),
            normals=P("obj"), uvs=P("obj"),
            texture=P("obj") if stacked.texture is not None else None,
        )
        for _, stacked, _ in stacked_groups
    )
    static_cfg_keys = tuple(
        (cfg, keys) for cfg, _, keys in stacked_groups
    )
    def per_device(stacked_list, transform, lights):
        row0 = (jax.lax.axis_index("ty") * lh) if ny > 1 else 0
        col0 = (jax.lax.axis_index("tx") * lw) if nx > 1 else 0
        shard = jax.lax.axis_index("obj")
        color = jnp.full((lh, lw), jnp.uint32(clear_color))
        depth = jnp.full((lh, lw), DEPTH_CLEAR, F32)
        okey = jnp.full((lh, lw), _NO_WINNER, jnp.int32)
        clear = Framebuffer(
            color=jnp.full((lh, lw), jnp.uint32(clear_color)),
            depth=jnp.full((lh, lw), DEPTH_CLEAR, F32),
        )
        for g, ((cfg, keys), stacked) in enumerate(
            zip(static_cfg_keys, stacked_list)
        ):
            n_local = len(keys) // n_obj
            # This device's slot i holds submission key keys[shard*K + i]
            # — a traced gather over the static key table.
            key_tab = jnp.asarray(keys, jnp.int32)
            for i in range(n_local):
                obj = RenderObject(
                    p=stacked.p[i],
                    vertices=stacked.vertices[i],
                    colors=stacked.colors[i],
                    normals=stacked.normals[i],
                    uvs=stacked.uvs[i],
                    texture=(stacked.texture[i]
                             if stacked.texture is not None else None),
                )
                fb = render_object(
                    clear, obj, transform, lights, cfg, backend,
                    frame_height=height, frame_width=width, row0=row0,
                    col0=col0,
                )
                k = key_tab[shard * n_local + i]
                covered = fb.depth > DEPTH_CLEAR
                # Key-aware merge: groups draw out of submission order
                # locally, so equal depths resolve by key, not draw order.
                win = (fb.depth > depth) | (
                    covered & (fb.depth == depth) & (k < okey)
                )
                depth = jnp.where(win, fb.depth, depth)
                color = jnp.where(win, fb.color, color)
                okey = jnp.where(win, k, okey)

        # ONE collective per frame: shards fold by (z, key) in ascending
        # shard order ('obj' never splits one object across shards, so
        # equal z + equal key cannot disagree on color).
        z_all = jax.lax.all_gather(depth, "obj")  # (n_obj, lh, lw)
        c_all = jax.lax.all_gather(color, "obj")
        k_all = jax.lax.all_gather(okey, "obj")
        out_z = jnp.full_like(depth, DEPTH_CLEAR)
        out_c = jnp.full((lh, lw), jnp.uint32(clear_color))
        out_k = jnp.full_like(okey, _NO_WINNER)
        for s in range(n_obj):
            win = (z_all[s] > out_z) | (
                (z_all[s] == out_z) & (k_all[s] < out_k)
            )
            out_z = jnp.where(win, z_all[s], out_z)
            out_c = jnp.where(win, c_all[s], out_c)
            out_k = jnp.where(win, k_all[s], out_k)
        return Framebuffer(color=out_c, depth=out_z)

    out_spec = _tile_out_spec(mesh)
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(obj_specs, P(), P()),
        out_specs=Framebuffer(color=out_spec, depth=out_spec),
        check_vma=False,
    )
    return fn(tuple(s for _, s, _ in stacked_groups), transform, lights)


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
