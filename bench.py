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
    import jax

    from tpu_renderer.core.types import make_framebuffer
    from tpu_renderer.engine.renderer import render_scene
    from tpu_renderer.models import scenes

    scene_g, tr_d, li_d = scenes.baseline_scene(CONFIG, HEIGHT, WIDTH)
    scene_j, transform, lights = scenes.to_jax_scene(scene_g, tr_d, li_d)
    objs = tuple(o for o, _ in scene_j)
    cfgs = tuple(c for _, c in scene_j)

    @jax.jit
    def step(objs, transform, lights):
        fb = render_scene(
            make_framebuffer(HEIGHT, WIDTH),
            list(zip(objs, cfgs)),
            transform,
            lights,
            backend="pallas",
        )
        return fb.color, fb.depth

    for _ in range(WARMUP):
        out = step(objs, transform, lights)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(objs, transform, lights)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS

    import numpy as np

    tris = sum(int(o.vertices.shape[0]) // 3 for o in objs)
    covered = int((np.asarray(out[1]) > -3.0e38).sum())
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
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            native.render(scene_g, tr_d, li_d, HEIGHT, WIDTH)
        dt = (time.perf_counter() - t0) / iters
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
