"""Driver-level medium calibration: `optimize_medium` recovers sigma_t.

The reference exposes sigma_t / sigma_s gradients through its adjoint
(volume.py:277-280) for calibration workflows (docs calibration
tutorials). Here the driver-level API is exercised end to end: a dose
volume is recorded at the TRUE extinction, then an optimization with a
WRONG initial extinction, a frozen pattern vector (sgd lr=0), an L2
dose-volume target ("dose_npy") and `optimize_medium` must move
sigma_t toward the truth and write the medium.json artifact.
"""
import json
import os

import numpy as np
import jax.numpy as jnp


def make_cfg(out, extinction, patterns, dose_path):
    return {
        "vial": {"type": "cylindrical", "r_int": 3.0, "r_ext": 3.4,
                 "ior": 1.54,
                 "medium": {"ior": 1.40, "extinction": extinction,
                            "albedo": 0.0}},
        "projector": {"type": "collimated", "patterns": patterns,
                      "pixel_size": 4.0 / 16, "motion": "circular",
                      "distance": 10},
        "sensor": {"type": "dda", "scalex": 4, "scaley": 4, "scalez": 1.5,
                   "film": {"type": "vfilm", "resx": 24, "resy": 24,
                            "resz": 9}},
        "target": {"dose_npy": dose_path},
        "loss": {"type": "l2"},
        "optimizer": {"type": "sgd", "lr": 0.0},
        "spp": 2,
        "n_steps": 10,
        "output": out,
    }


def test_sigma_t_calibration(tmp_path):
    from drtvam_tpu.models.scene import Scene
    from drtvam_tpu.ops.render import render
    from drtvam_tpu.opt.optimize import optimize

    st_true = 0.12
    st_init = 0.06
    patterns = np.ones((12, 6, 16), np.float32)
    dose_path = str(tmp_path / "measured.npy")
    np.save(dose_path, np.zeros((9, 24, 24, 1), np.float32))

    # record the "measured" dose at the true extinction
    out1 = str(tmp_path / "rec")
    os.makedirs(out1, exist_ok=True)
    scene = Scene(make_cfg(out1, st_true, patterns, dose_path))
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=6, rr_depth=6)
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    measured = np.asarray(render(
        static, arr, jnp.asarray(scene.projector.active_data), inv_vol,
        seed=0, spp=2, chunk=1 << 14))
    assert measured.sum() > 0
    np.save(dose_path, measured)

    # calibrate starting from the wrong extinction
    out2 = str(tmp_path / "cal")
    os.makedirs(out2, exist_ok=True)
    cfg = make_cfg(out2, st_init, patterns, dose_path)
    cfg["optimize_medium"] = {"lr": 0.015, "sigma_t": True}
    optimize(cfg)

    with open(os.path.join(out2, "medium.json")) as f:
        med = json.load(f)
    st_final = med["sigma_t"]
    assert abs(st_final - st_true) < 0.5 * abs(st_init - st_true), \
        f"sigma_t {st_init} -> {st_final}, true {st_true}"
