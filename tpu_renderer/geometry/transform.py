"""In-graph model transforms (jnp) for animated scenes.

The reference has no object rotation — its demo rotated vertex data on the
host each frame before resubmission (object transform is position-only,
projekt.cpp:3900-3903). These helpers do that vertex-data rotation inside
the jitted frame so animation costs no host round-trip; applying them before
``setup_triangles`` is semantically identical to the reference's host-side
mutation.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import RenderObject

F32 = jnp.float32


def rotation_y(angle):
    c, s = jnp.cos(jnp.asarray(angle, F32)), jnp.sin(jnp.asarray(angle, F32))
    one, zero = F32(1.0), F32(0.0)
    return jnp.array([[c, zero, s], [zero, one, zero], [-s, zero, c]], F32)


def rotation_x(angle):
    c, s = jnp.cos(jnp.asarray(angle, F32)), jnp.sin(jnp.asarray(angle, F32))
    one, zero = F32(1.0), F32(0.0)
    return jnp.array([[one, zero, zero], [zero, c, -s], [zero, s, c]], F32)


def rotation_z(angle):
    c, s = jnp.cos(jnp.asarray(angle, F32)), jnp.sin(jnp.asarray(angle, F32))
    one, zero = F32(1.0), F32(0.0)
    return jnp.array([[c, -s, zero], [s, c, zero], [zero, zero, one]], F32)


# Rotation application form. 'elementwise' (default): out_i =
# rot[i,0]*x + rot[i,1]*y + rot[i,2]*z as scalar-broadcast VPU math —
# bandwidth-bound, fully fusable. 'matmul' (rounds 1-4): rot @ (3, 3T) —
# an M=3/K=3 dot that lowers pathologically on the MXU (padded tiles):
# the round-5 gap probe measured the per-frame rotation of a 2M-triangle
# soup at 13.9 ms (measurements/r5/gap2m.log) — ~40x its ~0.35 ms HBM
# floor — hiding inside every scan-timed frame. Kept for A/B.
ROTATE_FORM = "elementwise"


def rotate_object(obj: RenderObject, rot: jnp.ndarray) -> RenderObject:
    """Rotate vertices and normals by a 3x3 matrix (colors/uvs unchanged).

    Channel-major layout: the component axis leads (3, 3, T), so each
    output component is a scalar-weighted sum of the three input
    component planes (ROTATE_FORM comment above)."""
    t = obj.num_triangles

    if ROTATE_FORM == "matmul":
        def rot3(arr):
            return (rot @ arr.reshape(3, 3 * t)).reshape(3, 3, t)
    else:
        def rot3(arr):
            return jnp.stack([
                rot[i, 0] * arr[0] + rot[i, 1] * arr[1]
                + rot[i, 2] * arr[2]
                for i in range(3)
            ])

    return obj._replace(
        vertices=rot3(obj.vertices),
        normals=rot3(obj.normals),
    )


def translate_object(obj: RenderObject, p) -> RenderObject:
    """Set the object's camera-space position (the reference's Object->P)."""
    return obj._replace(p=jnp.asarray(p, F32).reshape(3))
