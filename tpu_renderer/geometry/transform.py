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


def rotate_object(obj: RenderObject, rot: jnp.ndarray) -> RenderObject:
    """Rotate vertices and normals by a 3x3 matrix (colors/uvs unchanged).

    Channel-major layout: component axis leads, so the rotation is
    rot @ v over a (3, 3T) view — one small-K matmul with the triangle
    axis on lanes."""
    t = obj.num_triangles

    def rot3(arr):
        return (rot @ arr.reshape(3, 3 * t)).reshape(3, 3, t)

    return obj._replace(
        vertices=rot3(obj.vertices),
        normals=rot3(obj.normals),
    )


def translate_object(obj: RenderObject, p) -> RenderObject:
    """Set the object's camera-space position (the reference's Object->P)."""
    return obj._replace(p=jnp.asarray(p, F32).reshape(3))
