"""Minimal 3D transform math (jnp), replacing Mitsuba's Transform4f.

Only what the TVAM pipeline needs: look_at frames, scale/translate, and
applying 3x3+translation to points/vectors. Everything is float32 and
shaped (..., 3) so it vmaps/jits cleanly.

Reference semantics: Mitsuba's Transform4f().look_at (used by
drtvam/motion.py:36) builds the frame
    dir  = normalize(target - origin)
    left = normalize(cross(up, dir))
    up2  = cross(dir, left)
with columns [left, up2, dir | origin].
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(v, axis=-1, eps=0.0):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def look_at(origin, target, up):
    """Return (R, t): world-from-camera rotation columns + translation.

    R has columns [left, up2, dir] so that a camera-space point p maps to
    world as R @ p + origin. Matches Mitsuba's Transform4f.look_at.
    Batched over leading dims of `origin`.
    """
    origin = jnp.asarray(origin, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    d = normalize(target - origin)
    left = normalize(jnp.cross(jnp.broadcast_to(up, d.shape), d))
    up2 = jnp.cross(d, left)
    # columns are the camera axes
    R = jnp.stack([left, up2, d], axis=-1)
    return R, origin


def apply_rt_point(R, t, p):
    return jnp.einsum("...ij,...j->...i", R, p) + t


def apply_rt_vector(R, v):
    return jnp.einsum("...ij,...j->...i", R, v)


def rotz(angle):
    """Rotation matrix about +z by `angle` (radians). Batched."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1),
         jnp.stack([s, c, z], -1),
         jnp.stack([z, z, o], -1)], -2)
