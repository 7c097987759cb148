"""Multi-chip rendering example: tile, geometry, and 2-level meshes.

Runs on N virtual CPU devices by default (so it works anywhere); on a
real TPU pod slice, drop the virtual-device setup and build the meshes
from the real ``jax.devices()`` (hosts-outermost for 'host' axes — see
parallel.mesh.render_scene_2level).

    python examples/multichip.py [--devices 8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--devices", type=int, default=8)
parser.add_argument("--out", default="multichip.png")
parser.add_argument("--real-devices", action="store_true",
                    help="use the real backend (pod slice) instead of virtual CPU devices")
args = parser.parse_args()

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()

import jax  # noqa: E402

# Force the CPU backend BEFORE any device query (a pinned JAX_PLATFORMS
# would otherwise initialize the real backend first — CLAUDE.md). Pass
# --real-devices on an actual pod slice.
if not args.real_devices:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from tpu_renderer.models import scenes  # noqa: E402
from tpu_renderer.parallel.mesh import (  # noqa: E402
    gather_framebuffer,
    render_scene_2level,
    render_scene_tiled,
)
from tpu_renderer.utils.image import write_png  # noqa: E402

n = args.devices
devices = np.array(jax.devices()[:n])
ny = max(d for d in range(1, n + 1) if n % d == 0 and d * d <= n)
nx = n // ny
H, W = 64 * ny, 128 * nx

scene_g, tr_d, li_d = scenes.baseline_scene(5, H, W)
scene_j, transform, lights = scenes.to_jax_scene(scene_g, tr_d, li_d)

# 1) Tile mesh: frame sharded (ty, tx), geometry replicated, ZERO
# collectives — each device's sub-rect lives in its own HBM.
mesh = Mesh(devices.reshape(ny, nx), ("ty", "tx"))
fb = render_scene_tiled(scene_j, transform, lights, H, W, mesh,
                        backend="pallas")
fb = gather_framebuffer(fb, mesh)
print(f"tiled ({ny}x{nx}): frame {fb.color.shape}, "
      f"covered {int(np.asarray(fb.depth > -3e38).sum())} px")

# 2) Two-level DCN x ICI mesh: triangles sharded over the cross-host
# 'host' axis (ONE DCN all-gather per frame), tiles over 'ty' within
# each host (no collective).
if n % 2 == 0:
    mesh2 = Mesh(devices.reshape(2, n // 2), ("host", "ty"))
    H2, W2 = 32 * (n // 2), 128
    scene_g2, tr_d2, li_d2 = scenes.baseline_scene(5, H2, W2)
    scene_j2, t2, l2 = scenes.to_jax_scene(scene_g2, tr_d2, li_d2)
    fb2 = render_scene_2level(scene_j2, t2, l2, H2, W2, mesh2,
                              backend="pallas")
    print(f"2-level (2 hosts x {n // 2}): frame {fb2.color.shape}, "
          f"covered {int(np.asarray(fb2.depth > -3e38).sum())} px")

write_png(args.out, np.asarray(fb.color))
print("wrote", args.out)
