"""Frame orchestration: the public ``Renderer`` API.

TPU-native equivalent of the reference's absent platform frame loop
(SURVEY.md §1.1): per object, build the edge table (vertex stage) and draw
over a shared z-buffer; then pack ARGB. One jitted function per
scene-signature replaces the per-frame dispatch + work-queue completion
barrier — the whole frame is a single XLA program.

Draw-path selection (the reference's four DrawModel* variants, SURVEY §1.1)
maps to ``backend=``:
  'reference'  pure-JAX scan rasterizer (the scalar DrawModel analog)
  'pallas'     tile-binned Pallas kernels (the AVX+workqueue analog)
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.math import pack_argb
from ..core.types import (
    Framebuffer,
    LightData,
    ObjectConfig,
    ProjectiveTransform,
    RenderObject,
    make_framebuffer,
)
from ..geometry.vertex import setup_triangles
from ..ops.raster_reference import rasterize_reference
from ..ops.shading import shade

F32 = jnp.float32


def _merge_stats(stats: dict | None, rstats: dict) -> None:
    """Accumulate one draw's raster stats into the caller's dict.

    Counters (drops, real entries) sum across draws; budget utilization
    takes the max (it is per-stream-budget relative, so the scene's
    binding constraint is its worst draw); 'bins_budget_factor' keeps the
    MAX policy factor over all draws (conservative for headroom) and
    'bins_budget_factor_min' the MIN, so calibrate_budget_factor can
    clamp its global suggestion below EVERY draw's policy factor — a
    suggestion above the min would loosen the tight-policy draws' budget
    (larger gather/work-item grid) in mixed-policy scenes."""
    if stats is None:
        return
    stats["bins_dropped"] = (
        stats.get("bins_dropped", 0) + rstats["bins_dropped"]
    )
    if "bins_real_entries" not in rstats:  # mask strategy: no stream
        return
    stats["bins_real_entries"] = (
        stats.get("bins_real_entries", 0) + rstats["bins_real_entries"]
    )
    util = rstats["bins_budget_utilization"]
    prev = stats.get("bins_budget_utilization")
    if prev is None:
        stats["bins_budget_utilization"] = util
        stats["bins_budget_factor"] = rstats["bins_budget_factor"]
        stats["bins_budget_factor_min"] = rstats["bins_budget_factor"]
    else:
        stats["bins_budget_utilization"] = jnp.maximum(prev, util)
        # Trace-time constants; scenes mixing policies keep both extremes.
        stats["bins_budget_factor"] = max(
            stats["bins_budget_factor"], rstats["bins_budget_factor"]
        )
        stats["bins_budget_factor_min"] = min(
            stats["bins_budget_factor_min"], rstats["bins_budget_factor"]
        )


def _texture_fits_fused(texture) -> bool:
    from ..ops.raster_pallas import MAX_FUSED_TEX_DIM, MAX_FUSED_TEX_PIXELS

    th, tw = int(texture.shape[0]), int(texture.shape[1])
    return max(th, tw) <= MAX_FUSED_TEX_DIM and th * tw <= MAX_FUSED_TEX_PIXELS


def render_object(
    framebuffer: Framebuffer,
    obj: RenderObject,
    transform: ProjectiveTransform,
    lights: LightData,
    cfg: ObjectConfig,
    backend: str = "reference",
    frame_height: int | None = None,
    frame_width: int | None = None,
    row0=0,
    col0=0,
    capacity: int | None = None,
    stats: dict | None = None,
    budget_override: float | None = None,
    zcull: bool | None = None,
) -> Framebuffer:
    """Draw one object over the shared framebuffer (FillEdgeTable +
    DrawModel* pair, SURVEY.md §1.1).

    ``framebuffer`` may be a local sub-rect of a larger
    (frame_height, frame_width) frame with traced origin (row0, col0) —
    this is how shard_map devices render their tile of the mesh-sharded
    frame (SURVEY.md §5.8).

    ``framebuffer=None`` means a FRESH zero-cleared frame of
    (frame_height, frame_width): the fused kernel's outputs already carry
    exactly the clear values (packed color 0, DEPTH_CLEAR) on uncovered
    pixels, so the clear + 3-plane select merge — ~50 MB of pure HBM
    traffic per 1080p frame — is skipped entirely on that path.
    """
    fresh = framebuffer is None
    if fresh:
        if frame_height is None or frame_width is None:
            raise ValueError(
                "render_object(framebuffer=None) needs frame dims"
            )
        height, width = frame_height, frame_width
    else:
        height, width = framebuffer.height, framebuffer.width
    if frame_height is None:
        frame_height = height
    if frame_width is None:
        frame_width = width
    fused_tex = (
        cfg.textured
        and cfg.uv_mode == "scalar"
        and cfg.filter_mode in ("nearest", "bilinear")
        and obj.texture is not None
        and _texture_fits_fused(obj.texture)
    )
    if backend == "pallas" and (not cfg.textured or fused_tex):
        # Fully-fused fast path: raster + interpolate + shade + pack in one
        # Pallas kernel; the G-buffer never exists in HBM, and the vertex
        # stage writes the packed record table directly (the fused Pallas
        # setup kernel above FUSED_SETUP_MIN triangles, the XLA
        # setup_records chain below — no EdgeTable materializes either
        # way). Small 'scalar'/nearest textures sample in-kernel via an
        # MXU one-hot contraction (TPU per-element gathers are
        # pathological); bilinear, 'avx' uv-masking, and large textures
        # stay on the deferred XLA path.
        from ..ops.raster_pallas import rasterize_pallas_shaded
        from ..ops.setup_pallas import setup_for_raster

        rec_t = setup_for_raster(
            obj, transform, lights, cfg,
            frame_height=frame_height, frame_width=frame_width,
        )
        covered, z, packed, rstats = rasterize_pallas_shaded(
            rec_t, transform, lights, cfg.phong, height, width, capacity,
            frame_height, frame_width, row0, col0,
            texture=obj.texture if fused_tex else None,
            filter_mode=cfg.filter_mode,
            budget_override=budget_override,
            zcull=zcull,
        )
        _merge_stats(stats, rstats)
        if fresh:
            return Framebuffer(color=packed, depth=z)
        win = covered & (z > framebuffer.depth)
        return Framebuffer(
            color=jnp.where(win, packed, framebuffer.color),
            depth=jnp.where(win, z, framebuffer.depth),
        )
    if fresh:
        framebuffer = make_framebuffer(height, width)
    if backend == "reference":
        edges = setup_triangles(obj, transform, lights, cfg)
        covered, gbuf = rasterize_reference(
            edges, height, width, frame_width, row0, col0
        )
    elif backend == "pallas":
        from ..ops.raster_pallas import rasterize_pallas
        from ..ops.setup_pallas import setup_for_raster

        rec_t = setup_for_raster(
            obj, transform, lights, cfg,
            frame_height=frame_height, frame_width=frame_width,
        )
        covered, gbuf, rstats = rasterize_pallas(
            rec_t, height, width, capacity, frame_height, frame_width,
            row0, col0, budget_override=budget_override,
        )
        _merge_stats(stats, rstats)
    else:
        raise ValueError(f"unknown backend: {backend}")

    rgba, covered = shade(
        covered, gbuf, transform, lights, cfg, obj.texture, row0, col0
    )
    packed = pack_argb(rgba)
    win = covered & (gbuf[0] > framebuffer.depth)
    return Framebuffer(
        color=jnp.where(win, packed, framebuffer.color),
        depth=jnp.where(win, gbuf[0], framebuffer.depth),
    )


def _obj_fusable(obj: RenderObject, cfg: ObjectConfig) -> bool:
    """Eligible for the fully-fused (in-kernel shading) path?"""
    if not cfg.textured:
        return True
    return (
        cfg.uv_mode == "scalar"
        and cfg.filter_mode in ("nearest", "bilinear")
        and obj.texture is not None
        and _texture_fits_fused(obj.texture)
    )


def _scene_batchable(scene) -> bool:
    """Whole-scene single-kernel eligibility: every object fusable AND the
    combined texture atlas within the VMEM budget."""
    from ..ops.raster_pallas import MAX_FUSED_TEX_DIM, MAX_FUSED_TEX_PIXELS

    if not all(_obj_fusable(obj, cfg) for obj, cfg in scene):
        return False
    seen, ah, aw = set(), 0, 0
    for obj, cfg in scene:
        if cfg.textured and id(obj.texture) not in seen:
            seen.add(id(obj.texture))
            ah += int(obj.texture.shape[0])
            aw = max(aw, int(obj.texture.shape[1]))
    return max(ah, aw) <= MAX_FUSED_TEX_DIM and ah * aw <= MAX_FUSED_TEX_PIXELS


def _render_scene_batched(
    framebuffer, scene, transform, lights, frame_height, frame_width,
    row0, col0, capacity, stats, budget_override=None, zcull=None,
):
    """ONE fused kernel launch for the whole scene: per-object record
    tables concatenate into a scene-global channel-major table (gid lanes
    carry the global submission order), per-object shading selects by
    static gid ranges in-kernel, and all textures ride one packed atlas.
    Replaces len(scene) kernel dispatches + framebuffer merges per frame —
    the reference's per-model work items (projekt.cpp:3873-3878) collapsed
    into one grid. Each object's table pads its triangle axis to 128 so the
    lane-axis concat stays tile-aligned (pad rows are all-zero = invalid =
    never render; their gid lanes are 0 but unreachable)."""
    from ..geometry.vertex import setup_records
    from ..ops.raster_pallas import (
        ObjSpec,
        pack_texture_atlas,
        rasterize_scene_shaded,
    )
    from ..ops.setup_pallas import (
        FUSED_SETUP_MIN,
        SetupOut,
        setup_for_raster,
    )

    fresh = framebuffer is None
    if fresh:
        height, width = frame_height, frame_width
    else:
        height, width = framebuffer.height, framebuffer.width
    if frame_height is None:
        frame_height = height
    if frame_width is None:
        frame_width = width
    # One setup form for the whole scene (the concatenated table must be
    # homogeneous): the fused Pallas setup when the scene is big enough
    # for the XLA assembly tax to matter, the XLA chain otherwise.
    fused_setup = (
        sum(obj.num_triangles for obj, _ in scene) >= FUSED_SETUP_MIN
    )
    textures, tex_slot = [], {}
    rec_ts, bboxes, raw = [], [], []
    objspecs, gid, true_t = [], 0, 0
    for obj, cfg in scene:
        T = obj.num_triangles
        if fused_setup:
            out = setup_for_raster(
                obj, transform, lights, cfg, gid0=gid,
                frame_height=frame_height, frame_width=frame_width,
            )
            if isinstance(out, SetupOut):
                rt, pad = out.recs, out.recs.shape[0] - T
                bboxes.append(out.bbox)
            else:  # small object below the kernel's own threshold
                from ..ops.binning import triangle_bbox_rows
                from ..ops.raster_pallas import finish_records

                pad = -T % 128
                rt_cm = jnp.pad(out, ((0, 0), (0, pad)))
                rt = finish_records(rt_cm)[: T + pad]
                bboxes.append(
                    triangle_bbox_rows(rt_cm, frame_height, frame_width)
                )
        else:
            rt = setup_records(obj, transform, lights, cfg, gid0=gid)
            pad = -T % 128
            if pad:
                rt = jnp.pad(rt, ((0, 0), (0, pad)))
        rec_ts.append(rt)
        slot = None
        if cfg.textured:
            key = id(obj.texture)
            if key not in tex_slot:
                tex_slot[key] = len(textures)
                textures.append(obj.texture)
            slot = tex_slot[key]
        raw.append((cfg.phong, slot, gid, T, cfg.filter_mode))
        gid += T + pad
        true_t += T
    if textures:
        atlas, offs = pack_texture_atlas(textures)
    else:
        atlas, offs = None, []
    for phong, slot, gid_lo, T, filt in raw:
        tex = None
        if slot is not None:
            t = textures[slot]
            tex = (offs[slot], int(t.shape[0]), int(t.shape[1])) + (
                ("bilinear",) if filt == "bilinear" else ()
            )
        objspecs.append(ObjSpec(gid_lo, gid_lo + T, bool(phong), tex))
    if fused_setup:
        rec_t = SetupOut(
            recs=(jnp.concatenate(rec_ts, axis=0) if len(rec_ts) > 1
                  else rec_ts[0]),
            bbox=tuple(
                jnp.concatenate(parts, axis=0) if len(rec_ts) > 1
                else parts[0]
                for parts in zip(*bboxes)
            ),
            num_triangles=true_t,
        )
    else:
        rec_t = (
            jnp.concatenate(rec_ts, axis=1) if len(rec_ts) > 1
            else rec_ts[0]
        )
    covered, z, packed, rstats = rasterize_scene_shaded(
        rec_t, tuple(objspecs), transform, lights, height, width, capacity,
        frame_height, frame_width, row0, col0, atlas=atlas,
        budget_override=budget_override, zcull=zcull,
    )
    _merge_stats(stats, rstats)
    if fresh:
        return Framebuffer(color=packed, depth=z)
    win = covered & (z > framebuffer.depth)
    return Framebuffer(
        color=jnp.where(win, packed, framebuffer.color),
        depth=jnp.where(win, z, framebuffer.depth),
    )


def render_scene(
    framebuffer: Framebuffer | None,
    scene: Sequence[Tuple[RenderObject, ObjectConfig]],
    transform: ProjectiveTransform,
    lights: LightData,
    backend: str = "reference",
    frame_height: int | None = None,
    frame_width: int | None = None,
    row0=0,
    col0=0,
    capacity: int | None = None,
    stats: dict | None = None,
    budget_override: float | None = None,
    zcull: bool | None = None,
) -> Framebuffer:
    """Draw a list of objects in submission order (shared z-buffer).

    On the pallas backend a scene whose objects are all fused-path-eligible
    renders in ONE kernel launch (_render_scene_batched); otherwise objects
    draw one at a time (bit-identical output either way — tested).

    ``framebuffer=None`` = a fresh zero-cleared (frame_height, frame_width)
    frame; the fused paths then return the kernel outputs directly instead
    of clearing + merging (see render_object). An empty scene yields the
    clear frame either way."""
    if framebuffer is None and (
        frame_height is None or frame_width is None
    ):
        raise ValueError("render_scene(framebuffer=None) needs frame dims")
    if backend == "pallas" and len(scene) > 1 and _scene_batchable(scene):
        return _render_scene_batched(
            framebuffer, scene, transform, lights, frame_height,
            frame_width, row0, col0, capacity, stats, budget_override,
            zcull,
        )
    if framebuffer is None and not scene:
        return make_framebuffer(frame_height, frame_width)
    for obj, cfg in scene:
        framebuffer = render_object(
            framebuffer, obj, transform, lights, cfg, backend,
            frame_height, frame_width, row0, col0, capacity, stats,
            budget_override, zcull,
        )
    return framebuffer


class Renderer:
    """Jit-compiling frame renderer.

    Static across calls: frame size, object configs, object shapes, backend.
    Dynamic: vertex data, object positions, camera, lights. A scene signature
    compiles once; subsequent frames are pure device execution.
    """

    def __init__(self, height: int, width: int, backend: str = "reference",
                 clear_color: int = 0, capacity: int | None = None,
                 budget_factor: float | None = None,
                 zcull: bool | None = None):
        self.height = height
        self.width = width
        self.backend = backend
        self.clear_color = clear_color
        self.capacity = capacity  # per-tile triangle list size (pallas)
        # Per-RENDERER entry-budget override (sorted strategy): replaces
        # the policy budget factor for every draw this renderer compiles.
        # Set directly, or measured by .calibrate(); None = policy
        # defaults. Scoped here (not the module global) so two renderers
        # with different scene families never fight over one flag.
        self.budget_factor = budget_factor
        # Occlusion block-skip (ZCULL_BLOCKS semantics, bit-exact by
        # construction): None = module default (off). Wins on
        # depth-complex painter's-order scenes (-12.7% on a 6-deep
        # stack, measurements/r4/ab_zcull.log), costs ~15% on
        # single-layer ones — a per-renderer scene-class choice.
        self.zcull = zcull
        self._compiled = {}

    def render(
        self,
        scene: Sequence[Tuple[RenderObject, ObjectConfig]],
        transform: ProjectiveTransform,
        lights: LightData,
        with_stats: bool = False,
    ):
        """Render a frame. with_stats=True additionally returns a dict of
        render statistics (e.g. 'bins_dropped': triangles dropped by tile
        capacity overflow — nonzero means raise ``capacity``)."""
        cfgs = tuple(cfg for _, cfg in scene)
        objs = tuple(obj for obj, _ in scene)
        key = (cfgs, tuple(o.vertices.shape for o in objs), with_stats,
               self.budget_factor, self.zcull)
        fn = self._compiled.get(key)
        if fn is None:
            budget = self.budget_factor

            @jax.jit
            def fn(objs, transform, lights):
                # clear_color 0 (the default) takes the fresh-frame fast
                # path: no clear + no merge on fused pallas scenes.
                fb = (
                    None if self.clear_color == 0
                    else make_framebuffer(
                        self.height, self.width, self.clear_color
                    )
                )
                stats = {}
                fb = render_scene(
                    fb, list(zip(objs, cfgs)), transform, lights,
                    self.backend, frame_height=self.height,
                    frame_width=self.width, capacity=self.capacity,
                    stats=stats, budget_override=budget,
                    zcull=self.zcull,
                )
                return (fb, stats) if with_stats else fb

            self._compiled[key] = fn
        return fn(objs, transform, lights)

    def calibrate(
        self,
        scene: Sequence[Tuple[RenderObject, ObjectConfig]],
        transform: ProjectiveTransform,
        lights: LightData,
        margin: float = 1.25,
    ) -> Optional[float]:
        """Measure one representative frame's real binning demand and
        tighten THIS renderer's entry budget (self.budget_factor).

        The sorted strategy's static budget (ROADMAP) sets the per-frame
        record-gather length and the work-item grid bound; the policy
        default carries open-mesh headroom a known scene family may not
        need. This renders ``scene`` once at the CURRENT budget, computes
        ``max_policy_factor * realized_utilization * margin``, and applies
        it only when it is SAFE and a genuine tightening:

        - refuses to loosen: a suggestion at or above the minimum policy
          factor across the scene's draws is discarded (applying it would
          grow some draw's gather/grid for nothing — including the
          density-scaled rows default, which can sit below utilization
          math on very dense scenes);
        - validates: re-renders the frame at the tightened budget and
          REVERTS if anything drops (depth-complex scenes whose demand
          the utilization of a single frame understates stay at policy).

        Returns the applied factor, or None when nothing changed. Later
        frames remain guarded: drops are always counted in
        stats['bins_dropped'] — re-calibrate on the worst frame of the
        family if it ever reports nonzero."""
        _, stats = self.render(scene, transform, lights, with_stats=True)
        suggestion = _suggest_budget_factor(stats, margin)
        if suggestion is None:
            return None
        prev = self.budget_factor
        self.budget_factor = suggestion
        _, stats2 = self.render(scene, transform, lights, with_stats=True)
        if int(stats2["bins_dropped"]) > 0:
            self.budget_factor = prev
            return None
        return suggestion


def _suggest_budget_factor(stats: dict, margin: float) -> Optional[float]:
    """Budget-factor suggestion from one frame's realized stats, or None.

    Suggestion = max_policy_factor * max_stream_utilization * margin.
    REFUSED (None) when it would not tighten every draw: in a
    mixed-policy scene the max-utilization draw's realized demand
    (util * its factor) can exceed the minimum policy factor, so
    clamping the global suggestion to the min — the round-4 behavior —
    could sit BELOW that draw's demand and introduce drops on the very
    frame used to calibrate (advisor r4). A suggestion >= the min
    factor is therefore discarded rather than clamped."""
    if "bins_budget_utilization" not in stats:
        return None
    util = float(stats["bins_budget_utilization"])
    used = float(stats["bins_budget_factor"])
    used_min = float(stats["bins_budget_factor_min"])
    if util <= 0.0:
        return None
    suggestion = used * util * margin
    if suggestion >= used_min:
        return None
    return suggestion


def calibrate_budget_factor(
    scene: Sequence[Tuple[RenderObject, ObjectConfig]],
    transform: ProjectiveTransform,
    lights: LightData,
    frame_height: int,
    frame_width: int,
    margin: float = 1.25,
) -> Optional[float]:
    """Measure one frame's real binning demand and suggest a tightened
    entry-budget factor for this scene family (None = keep policy).

    The sorted strategy's static entry budget (budget_factor * T per
    stream) drives the per-frame record-gather length and the work-item
    grid bound, but the open-mesh-safe default carries ~2x headroom over
    a typical closed mesh's real demand (ROADMAP: real entries ~0.7/tri
    closed vs the 1.2 default). jit forbids a dynamic budget, so the
    production escape hatch is: render ONE representative frame here,
    read the realized max-stream utilization, and suggest
    ``max_factor * utilization * margin`` — REFUSING (None) any value
    that fails to tighten every draw's budget (see
    _suggest_budget_factor; the round-4 min-policy clamp could sit
    below the max-utilization draw's realized demand in mixed-policy
    scenes).

    Prefer the product form: ``Renderer.calibrate()``, which applies the
    suggestion to that renderer's compiled functions and validates it
    drop-free before keeping it. This function remains for callers
    managing their own jit (apply via the ``budget_override`` parameter
    of render_scene/rasterize_*, or the module-global
    ``raster_pallas.BUDGET_FACTOR_OVERRIDE`` before first jit). Drops
    remain counted in stats['bins_dropped'] — if a later frame of the
    family overflows the tightened budget, re-run calibration on that
    frame; nothing is ever silently lost."""
    stats: dict = {}
    render_scene(
        None, list(scene), transform, lights, backend="pallas",
        frame_height=frame_height, frame_width=frame_width, stats=stats,
    )
    return _suggest_budget_factor(stats, margin)
