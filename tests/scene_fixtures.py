"""Shared tiny-scene builders importable from spawned worker processes
(pytest fixtures can't cross a process boundary)."""
import os

import jax.numpy as jnp
import numpy as np


def tiny_scattering_scene(work_dir):
    """Deterministic tiny scattering scene: returns (static, arr,
    active_data, inv_vol). The target mesh is (re)written under
    work_dir so every process builds the identical scene."""
    from drtvam_tpu.models.scene import Scene
    from drtvam_tpu.ops.mesh import make_box, save_ply

    path = os.path.join(work_dir, "mh_target.ply")
    if not os.path.exists(path):
        # concurrent workers race here: write to a per-process temp
        # name and os.replace (atomic) so a reader never sees a
        # half-written PLY
        tmp = f"{path}.{os.getpid()}.tmp"
        save_ply(make_box((0.5, 0.5, 0.5)), tmp)
        os.replace(tmp, path)
    cfg = {
        "vial": {"type": "cylindrical", "r_int": 7, "r_ext": 8,
                 "ior": 1.54,
                 "medium": {"ior": 1.40, "phase": {"type": "rayleigh"},
                            "extinction": 0.1, "albedo": 0.5}},
        "projector": {"type": "collimated", "n_patterns": 12, "resx": 16,
                      "resy": 8, "pixel_size": 0.3, "motion": "circular",
                      "distance": 20},
        "sensor": {"type": "dda", "scalex": 5, "scaley": 5,
                   "scalez": 1.25,
                   "film": {"type": "vfilm", "resx": 16, "resy": 16,
                            "resz": 8}},
        "target": {"filename": path, "size": 4.0},
        "output": ".",
    }
    scene = Scene(cfg)
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=8, rr_depth=6)
    n = scene.projector.active_size()
    data = jnp.linspace(0.5, 2.0, n, dtype=jnp.float32)
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    return static, arr, data, inv_vol
