"""Snell refraction + unpolarized Fresnel for smooth dielectrics.

Replaces Mitsuba's `dielectric` BSDF as used by the reference's vial
interfaces (reference: geometry.py:152-183, volume.py:230-247). The
conventions follow Mitsuba's smooth dielectric:

  * `eta` is the surface's int_ior/ext_ior ratio; the relative IOR along
    the crossing is eta if the ray arrives from outside (cos_i > 0
    against the outward normal), else 1/eta.
  * transmission weight includes the radiance solid-angle compression
    factor 1/eta_rel^2 (Mitsuba applies it in Radiance transport mode,
    which is what drtvam's emitter-launched rays use by default).
  * total internal reflection makes transmission impossible: in
    transmission_only mode the ray dies (weight 0).
"""
from __future__ import annotations

import jax.numpy as jnp


def fresnel_dielectric(cos_i_abs, eta_rel):
    """Unpolarized Fresnel reflectance for |cos theta_i|, relative IOR.

    Returns (F, cos_t_abs, tir) where cos_t_abs is |cos theta_t| (0 under
    TIR) and tir is a bool mask.
    """
    ci = jnp.clip(cos_i_abs, 0.0, 1.0)
    sin_t2 = (1.0 - ci * ci) / (eta_rel * eta_rel)
    tir = sin_t2 >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t2))
    r_par = (eta_rel * ci - ct) / (eta_rel * ci + ct)
    r_perp = (ci - eta_rel * ct) / (ci + eta_rel * ct)
    F = 0.5 * (r_par * r_par + r_perp * r_perp)
    F = jnp.where(tir, 1.0, F)
    return F, jnp.where(tir, 0.0, ct), tir


def refract(d, n, eta):
    """Refract direction `d` (unit, pointing along the ray) at a surface
    with outward normal `n` (unit) and int/ext IOR ratio `eta`.

    Returns (d_t, d_r, F, tir):
      d_t: refracted direction (garbage under TIR — mask with `tir`)
      d_r: mirror-reflected direction
      F:   Fresnel reflectance
    All inputs (..., 3) / (...,). Handles both crossing orientations.
    """
    cos_i = -jnp.sum(d * n, axis=-1)  # >0 when hitting the outside
    outside = cos_i > 0.0
    eta_rel = jnp.where(outside, eta, 1.0 / eta)
    nl = jnp.where(outside[..., None], n, -n)  # normal on incident side
    ci = jnp.abs(cos_i)
    F, ct, tir = fresnel_dielectric(ci, eta_rel)
    inv_eta = 1.0 / eta_rel
    d_t = inv_eta[..., None] * d + (inv_eta * ci - ct)[..., None] * nl
    d_r = d + 2.0 * ci[..., None] * nl
    return d_t, d_r, F, tir, eta_rel
