"""Volumetric sensor + film: the dose voxel grid and its estimators.

Replaces the reference's VolumetricFilm (film.py) + VolumetricSensor
family (sensor.py). The film is just a dose tensor of shape
(Z, Y, X, C) with C = 2 when surface-aware (channel 0 = inside-target
dose, 1 = outside), C = 1 otherwise.

Resolution quirk preserved from the reference (film.py:10-11): the film
maps config 'resx' to the Y extent and 'resy' to X, i.e. the data tensor
is (resz, cfg_resx, cfg_resy, C). All shipped configs use resx == resy
so this is invisible, but non-square grids must match.

The estimator kind ('dda' | 'ratio' | 'delta') selects how ray segments
deposit dose (implemented in ops/march.py / ops/dda.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ..ops.voxelize import occupancy, fractional_volumes


@dataclass(frozen=True)
class SensorStatic:
    estimator: str            # 'dda' | 'ratio' | 'delta'
    res: Tuple[int, int, int]  # (X, Y, Z)
    surface_aware: bool

    @property
    def channels(self):
        return 2 if self.surface_aware else 1

    @property
    def shape(self):
        X, Y, Z = self.res
        return (Z, Y, X, self.channels)

    @property
    def n_cells(self):
        X, Y, Z = self.res
        return X * Y * Z * self.channels


class Sensor:
    def __init__(self, props):
        est = props["type"]
        if est not in ("dda", "ratio", "delta"):
            raise ValueError(f"Unknown sensor type '{est}'")
        film = props.get("film", {})
        if film.get("type", "vfilm") != "vfilm":
            raise ValueError("The film must be of type vfilm.")
        resz = int(film.get("resz", 256))
        res_y = int(film.get("resx", 256))  # quirk: resx -> Y
        res_x = int(film.get("resy", 256))  # quirk: resy -> X
        self.surface_aware = bool(film.get("surface_aware", False))
        self.static = SensorStatic(est, (res_x, res_y, resz),
                                   self.surface_aware)
        sx = float(props.get("scalex", 1.0))
        sy = float(props.get("scaley", 1.0))
        sz = float(props.get("scalez", 1.0))
        self.bbox_min = np.array([-0.5 * sx, -0.5 * sy, -0.5 * sz],
                                 np.float32)
        self.bbox_max = -self.bbox_min
        self.majorant = float(props.get("majorant", 0.0))
        if est == "ratio" and self.majorant <= 0.0:
            raise ValueError("Ratio sensor requires a positive 'majorant'.")
        self._volumes = None

    @property
    def voxel_size(self):
        X, Y, Z = self.static.res
        return (self.bbox_max - self.bbox_min) / np.array([X, Y, Z],
                                                          np.float32)

    @property
    def voxel_volume(self):
        return float(np.prod(self.voxel_size))

    def compute_volume(self, target_bank=None, oversample=4):
        """Per-voxel integration volume: scalar voxel volume, or the
        surface-aware (Z,Y,X,2) inside/outside fractional volumes
        (reference sensor.py:47-110). Cached like the reference."""
        if not self.surface_aware:
            return jnp.float32(self.voxel_volume)
        if self._volumes is None:
            if target_bank is None:
                raise ValueError("surface-aware sensor needs the target "
                                 "mesh to compute fractional volumes")
            self._volumes = fractional_volumes(
                target_bank, self.bbox_min, self.bbox_max,
                self.static.res, oversample=oversample)
        return self._volumes

    def inv_volume(self, target_bank=None, oversample=4):
        vol = self.compute_volume(target_bank, oversample)
        return jnp.where(vol != 0.0, 1.0 / jnp.maximum(vol, 1e-30), 0.0)

    def discretize(self, target_bank):
        """Binary occupancy of the target inside this sensor's grid
        (reference utils.py:83-128)."""
        return occupancy(target_bank, self.bbox_min, self.bbox_max,
                         self.static.res)
