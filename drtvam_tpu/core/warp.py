"""Sampling warps (replaces mi.warp.* used by the reference).

square_to_uniform_sphere: drtvam/sensor.py:91, utils.py:118
square_to_uniform_disk_concentric: drtvam/projector.py:224,278
"""
from __future__ import annotations

import jax.numpy as jnp


def square_to_uniform_sphere(u):
    """u: (..., 2) in [0,1)^2 -> unit vectors (..., 3)."""
    z = 1.0 - 2.0 * u[..., 1]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_cosine_hemisphere(u):
    """Cosine-weighted unit hemisphere (z >= 0) via the concentric disk
    lift; pdf = cos(theta)/pi. Used by diffuse occlusion BSDFs
    (reference geometry.py:55-72 allows arbitrary occlusion BSDFs,
    default black diffuse)."""
    d = square_to_uniform_disk_concentric(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.sum(d * d, axis=-1)))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def square_to_uniform_disk_concentric(u):
    """Concentric (Shirley) mapping of [0,1)^2 to the unit disk, (...,2)."""
    x = 2.0 * u[..., 0] - 1.0
    y = 2.0 * u[..., 1] - 1.0
    # Handle degenerate origin without NaNs.
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    safe = jnp.where((x == 0.0) & (y == 0.0), 1.0, jnp.where(use_x, x, y))
    ratio = jnp.where(use_x, y / safe, x / safe)
    phi = jnp.where(use_x, (jnp.pi / 4.0) * ratio,
                    (jnp.pi / 2.0) - (jnp.pi / 4.0) * ratio)
    phi = jnp.where((x == 0.0) & (y == 0.0), 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
