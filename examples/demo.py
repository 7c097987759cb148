#!/usr/bin/env python
"""Animated demo: the reference's spinning-scene use case, TPU-native.

Renders N frames of the multi-object baseline scene with in-graph rotation
(the reference rotated vertex data host-side each frame; here rotation is
jitted into the frame program) and writes them as PNGs.

Usage: python examples/demo.py [--frames 24] [--size 512] [--out /tmp/frames]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_renderer import Renderer, make_framebuffer
from tpu_renderer.engine.renderer import render_scene
from tpu_renderer.geometry.transform import rotation_y, rotate_object
from tpu_renderer.models import scenes
from tpu_renderer.utils.image import write_png
from tpu_renderer.utils.profiling import FrameTimer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="/tmp/frames")
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "reference"])
    args = ap.parse_args()

    h = w = args.size
    scene_g, tr_d, li_d = scenes.baseline_scene(5, h, w)
    scene_j, transform, lights = scenes.to_jax_scene(scene_g, tr_d, li_d)
    objs = tuple(o for o, _ in scene_j)
    cfgs = tuple(c for _, c in scene_j)

    @jax.jit
    def frame(objs, transform, lights, angle):
        rot = rotation_y(angle)
        spun = tuple(rotate_object(o, rot) for o in objs)
        fb = render_scene(
            make_framebuffer(h, w), list(zip(spun, cfgs)),
            transform, lights, backend=args.backend,
        )
        return fb.color

    os.makedirs(args.out, exist_ok=True)
    timer = FrameTimer()
    for i in range(args.frames):
        angle = jnp.float32(2.0 * np.pi * i / args.frames)
        with timer.tick() as t:
            color = frame(objs, transform, lights, angle)
            jax.block_until_ready(color)
        write_png(os.path.join(args.out, f"frame_{i:03d}.png"),
                  np.asarray(color))
    s = timer.summary()
    # first frame includes compile; steady-state excludes it
    steady = FrameTimer(samples=timer.samples[1:])
    print(f"wrote {args.frames} frames to {args.out}")
    print(f"first frame (compile): {timer.samples[0]*1e3:.0f} ms; "
          f"steady state: {steady.summary().get('ms_mean', 0):.2f} ms/frame "
          f"({steady.fps:.1f} fps)")


if __name__ == "__main__":
    main()
