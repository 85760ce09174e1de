"""Homogeneous participating medium + phase functions.

Replaces Mitsuba's `homogeneous` medium (exponential free-flight,
transmittance) and the `rayleigh` / `hg` phase plugins used by the vial
medium (reference: geometry.py:37-45, volume.py:199-261). Closed forms:

  free flight   t  = -log(1 - u) / sigma_t
  transmittance Tr = exp(-sigma_t * t)

Phase sampling is perfect importance sampling (weight == 1), matching
Mitsuba's implementations. Directions are sampled around the current ray
direction d (forward axis), with a branchless orthonormal basis.
"""
from __future__ import annotations

import jax.numpy as jnp

# registry: name -> sample_cos(u1, g) returning cos(theta)
phase_functions = {}


def register_phase(name, fn):
    phase_functions[name] = fn


def _rayleigh_cos(u, g):
    # Invert the Rayleigh CDF: x^3 + 3x = 8u - 4 (Cardano, x = w - 1/w).
    c = 4.0 * (2.0 * u - 1.0)
    w = jnp.cbrt(c / 2.0 + jnp.sqrt(c * c / 4.0 + 1.0))
    return jnp.clip(w - 1.0 / w, -1.0, 1.0)


def _hg_cos(u, g):
    g = jnp.asarray(g, jnp.float32)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u)
    cos_iso = 1.0 - 2.0 * u
    cos_hg = (1.0 + g * g - sqr * sqr) / (2.0 * jnp.where(g == 0.0, 1.0, g))
    return jnp.clip(jnp.where(g == 0.0, cos_iso, cos_hg), -1.0, 1.0)


def _isotropic_cos(u, g):
    return 1.0 - 2.0 * u


def _forward_delta_cos(u, g):
    # Example extension mirroring the reference's tests/delta_phase.py:
    # always continue straight ahead.
    return jnp.ones_like(u)


register_phase("rayleigh", _rayleigh_cos)
register_phase("hg", _hg_cos)
register_phase("isotropic", _isotropic_cos)
register_phase("forward_delta", _forward_delta_cos)


def build_onb(d):
    """Branchless orthonormal basis around unit vectors d (..., 3)."""
    s = jnp.where(d[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + d[..., 2])
    b = d[..., 0] * d[..., 1] * a
    t1 = jnp.stack(
        [1.0 + s * d[..., 0] ** 2 * a, s * b, -s * d[..., 0]], -1)
    t2 = jnp.stack([b, s + d[..., 1] ** 2 * a, -d[..., 1]], -1)
    return t1, t2


def sample_phase_direction(phase_name, g, d, u1, u2):
    """Sample an outgoing direction around forward axis d.

    u1 drives cos(theta) via the named phase function; u2 the azimuth.
    Returns unit directions (..., 3). Weight is 1 (perfect importance
    sampling), as in Mitsuba's rayleigh/hg plugins.
    """
    cos_t = phase_functions[phase_name](u1, g)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    t1, t2 = build_onb(d)
    return (sin_t * jnp.cos(phi))[..., None] * t1 + \
        (sin_t * jnp.sin(phi))[..., None] * t2 + cos_t[..., None] * d


def sample_free_flight(u, sigma_t):
    """Exponential free-flight distance; u in [0,1)."""
    return -jnp.log1p(-jnp.clip(u, 0.0, 1.0 - 1e-7)) / sigma_t


def transmittance(sigma_t, t):
    return jnp.exp(-sigma_t * t)
