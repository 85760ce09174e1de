"""Double-cylindrical (vial-in-vial) e2e optimization vs a committed
golden volume — mirrors reference tests/test_optimization.py:18-39
(double_cylindrical.json + target_hollow_gear.npy): a hollow gear is
optimized in the annular printing region between the outer vial and an
inner water-filled vial (4 nested dielectric interfaces), and the dose
thresholded at 0.6 must match the golden voxelization.

The golden (tests/files/target_hollow_gear.npy) is this repo's own
discretization of the procedural gear (ops/mesh.make_hollow_gear) on
the 50x50x1 sensor grid — regenerate with the parameters below if the
gear or voxelizer semantics deliberately change.
"""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "files",
                      "target_hollow_gear.npy")


def make_cfg(tmp_path, **extra):
    from drtvam_tpu.ops.mesh import make_hollow_gear, save_ply
    mesh = make_hollow_gear(r_out=1.0, r_root=0.9, r_hole=0.78,
                            n_teeth=14, half_height=0.5, segments=120)
    path = str(tmp_path / "hollow_gear.ply")
    save_ply(mesh, path)
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    cfg = {
        "vial": {"type": "double_cylindrical", "r_ext_outer": 7,
                 "r_int_outer": 6, "r_ext_inner": 3, "r_int_inner": 2,
                 "ior_outer": 1.53, "ior_inner": 1.553,
                 "ior_inside_inner": 1.33,
                 "medium": {"ior": 1.48, "extinction": 0.05,
                            "albedo": 0.0}},
        "projector": {"type": "collimated", "n_patterns": 200,
                      "resx": 200, "resy": 10, "pixel_size": 75e-3,
                      "motion": "circular", "distance": 20},
        "sensor": {"type": "dda", "scalex": 14, "scaley": 14,
                   "scalez": 1,
                   "film": {"type": "vfilm", "resx": 50, "resy": 50,
                            "resz": 1}},
        "target": {"filename": path, "size": 8.0},
        "loss": {"type": "threshold", "tl": 0.6, "tu": 0.85},
        "progressive": True, "spp": 2,
        "n_steps": 30, "max_depth": 10,
        "output": out,
    }
    cfg.update(extra)
    return cfg


def run_and_check(cfg):
    from drtvam_tpu.opt.optimize import optimize
    vol = optimize(cfg)
    golden = np.load(GOLDEN)
    assert golden.sum() > 0
    pred = vol[..., 0] > 0.6
    percent = np.isclose(golden, pred).mean() * 100
    assert percent > 99.4, f"agreement {percent:.2f}%"


def test_double_cylindrical(tmp_path):
    """Reference config minus filter_radon (~10 s on 2-core CPU; the
    radon cull re-traces the gear mesh and dominates wall-clock — the
    faithful config runs in the slow suite)."""
    run_and_check(make_cfg(tmp_path))


@pytest.mark.slow
def test_double_cylindrical_filter_radon(tmp_path):
    """The reference double_cylindrical.json verbatim, including the
    Radon DMD-pixel culling pass (~2.5 min on 2-core CPU)."""
    run_and_check(make_cfg(tmp_path, filter_radon=True))
