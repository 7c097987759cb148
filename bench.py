#!/usr/bin/env python
"""Benchmark: flagship TPU path vs the CPU golden reference.

Headline config (BASELINE.json #4): per-pixel Blinn-Phong with multiple
point lights at 1920x1080. The TPU path is the Pallas visibility-buffer
rasterizer + deferred shading; the baseline is this repo's CPU golden
(the reference's semantics, measured on this machine and cached in
.bench_cpu_baseline.json — delete the file to re-measure).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEIGHT, WIDTH = 1080, 1920
CONFIG = 4
WARMUP = 3
ITERS = 30
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cpu_baseline.json")


def measure_tpu_fps():
    """Device throughput via an in-graph frame loop.

    ITERS frames run inside one compiled lax.scan with per-frame varying
    rotation and a chained carry, then ONE host fetch forces completion —
    this defeats both async-dispatch under-counting and any runtime caching
    of identical executions (both observed on tunneled TPU runtimes; naive
    block_until_ready timing here can be off by orders of magnitude).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_renderer.core.math import pack_argb
    from tpu_renderer.core.types import make_framebuffer
    from tpu_renderer.engine.renderer import render_scene
    from tpu_renderer.geometry.transform import rotate_object, rotation_y
    from tpu_renderer.models import scenes

    scene_g, tr_d, li_d = scenes.baseline_scene(CONFIG, HEIGHT, WIDTH)
    scene_j, transform, lights = scenes.to_jax_scene(scene_g, tr_d, li_d)
    objs = tuple(jax.device_put(o) for o, _ in scene_j)
    cfgs = tuple(c for _, c in scene_j)

    @jax.jit
    def frames(objs, transform, lights, angles):
        def body(carry, angle):
            a = angle + carry * jnp.float32(1e-30)  # chain frames
            spun = tuple(rotate_object(o, rotation_y(a)) for o in objs)
            fb = render_scene(
                make_framebuffer(HEIGHT, WIDTH),
                list(zip(spun, cfgs)),
                transform,
                lights,
                backend="pallas",
            )
            check = jnp.sum(
                jnp.where(fb.depth > -3.0e38, fb.depth, 0.0)
            ) + (fb.color[13, 17] & 255).astype(jnp.float32)
            covered = jnp.sum((fb.depth > -3.0e38).astype(jnp.int32))
            return carry + check * jnp.float32(1e-20), covered
        return jax.lax.scan(body, jnp.float32(0.0), angles)

    angles = jnp.linspace(0.0, 0.6, ITERS).astype(jnp.float32)
    out = frames(objs, transform, lights, angles)
    _ = float(out[0])  # compile + warm

    t0 = time.perf_counter()
    out = frames(objs, transform, lights, angles)
    _ = float(out[0])  # single fetch forces the whole chain
    dt = (time.perf_counter() - t0) / ITERS

    tris = sum(int(o.vertices.shape[0]) // 3 for o in objs)
    covered = int(np.asarray(out[1])[-1])
    return 1.0 / dt, tris, covered


def measure_cpu_fps():
    """CPU baseline fps at the same config (cached across runs).

    Preferred baseline: the native C++ golden (faithful reference semantics,
    -O3 -march=native, multithreaded); falls back to the NumPy golden when
    no toolchain is available.
    """
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["cpu_fps"]
    from tpu_renderer.models import scenes

    scene_g, tr_d, li_d = scenes.baseline_scene(CONFIG, HEIGHT, WIDTH)
    from tpu_renderer.golden import native

    if native.available():
        native.render(scene_g, tr_d, li_d, 64, 64)  # warm up / build
        # median of 3 runs of 5 frames (single-core timing is noisy)
        runs = []
        for _ in range(3):
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                native.render(scene_g, tr_d, li_d, HEIGHT, WIDTH)
            runs.append((time.perf_counter() - t0) / iters)
        dt = sorted(runs)[1]
        baseline = "native-avx"
    else:
        from tpu_renderer.golden import cpu_reference as gold

        t0 = time.perf_counter()
        gold.render(scene_g, tr_d, li_d, HEIGHT, WIDTH)
        dt = time.perf_counter() - t0
        baseline = "numpy"
    cpu_fps = 1.0 / dt
    with open(CACHE, "w") as f:
        json.dump({"cpu_fps": cpu_fps, "config": CONFIG, "kind": baseline,
                   "resolution": [HEIGHT, WIDTH]}, f)
    return cpu_fps


def main():
    tpu_fps, tris, covered = measure_tpu_fps()
    cpu_fps = measure_cpu_fps()
    result = {
        "metric": "fps_1080p_phong_multilight",
        "value": round(tpu_fps, 2),
        "unit": "fps",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
    }
    print(json.dumps(result))
    print(
        f"# detail: {tris} tris, {covered} px covered, "
        f"tpu {tpu_fps:.1f} fps vs cpu-golden {cpu_fps:.3f} fps",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
