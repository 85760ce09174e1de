"""Projector motion models (reference: drtvam/motion.py).

A motion maps normalized time t in [0,1] to the projector's rigid pose.
CircularMotion orbits the static vial (equivalent to rotating the vial,
see reference docs plugin_reference/projector.rst:130-133): position
distance*(cos a, sin a, 0) with a = 2*pi*t (negated when clockwise),
looking at the origin with +z up.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.transforms import look_at

motions = {}


def register_motion(name, cls):
    motions[name] = cls


class CircularMotion:
    def __init__(self, props):
        self.distance = float(props["distance"])
        self.tilt = float(props.get("tilt", 0.0))  # stored; reference
        # CircularMotion also accepts-but-ignores tilt (motion.py:22)
        self.clockwise = bool(props.get("clockwise", False))

    def eval(self, time):
        """time (...,) in [0,1] -> (R (...,3,3), t (...,3)) world-from-cam."""
        alpha = 2.0 * jnp.pi * time
        if self.clockwise:
            alpha = -alpha
        origin = self.distance * jnp.stack(
            [jnp.cos(alpha), jnp.sin(alpha), jnp.zeros_like(alpha)], -1)
        target = jnp.zeros_like(origin)
        up = jnp.array([0.0, 0.0, 1.0], jnp.float32)
        return look_at(origin, target, up)


register_motion("circular", CircularMotion)
