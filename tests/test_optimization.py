"""End-to-end pattern optimization against analytic phantoms (mirrors
reference tests/test_optimization.py: a box with a cylindrical hole is
optimized and the thresholded final dose must agree with the analytic
voxelization).

The quick test uses a reduced workload for the default CI gate; the
`slow`-marked tests replicate the reference's full configs (200 angles,
100x100x50 film, 30 steps) and thresholds (>99.4% / >99.0%).
"""
import json
import os

import numpy as np
import pytest


def make_config(mesh_path, out, vial, n_patterns=200, resx=200, resy=20,
                film=(100, 100, 50), n_steps=30, loss=None, **extra):
    cfg = {
        "vial": vial,
        "projector": {
            "type": "collimated",
            "n_patterns": n_patterns,
            "resx": resx,
            "resy": resy,
            "pixel_size": 50e-3,
            "motion": "circular",
            "distance": 20,
        },
        "sensor": {
            "type": "dda",
            "scalex": 5, "scaley": 5, "scalez": 1.25,
            "film": {"type": "vfilm", "resx": film[0], "resy": film[1],
                     "resz": film[2]},
        },
        "target": {"filename": mesh_path, "size": 4.0},
        "loss": loss or {"type": "threshold", "tl": 0.85, "tu": 0.95},
        "progressive": True,
        "n_steps": n_steps,
        "output": out,
    }
    cfg.update(extra)
    return cfg


def analytic_phantom(film=(100, 100, 50)):
    """Box with cylindrical hole, as voxelized by the reference test
    (test_optimization.py:104-127) for the (100,100,50) grid."""
    X, Y, Z = film
    ref = np.zeros((Z, Y, X))
    ref[Z // 10:Z - Z // 10, Y // 10:Y - Y // 10, X // 10:X - X // 10] = 1
    radius = X // 5
    cx, cy = X // 10 + radius, Y // 2  # hole at (X=30, Y=50) for 100^2
    yy, xx = np.meshgrid(np.arange(Y), np.arange(X), indexing="ij")
    mask = (xx - cx) ** 2 + (yy - cy) ** 2 < (radius + 0.5) ** 2
    hole = np.zeros((Z, Y, X), int)
    hole[Z // 10:Z - Z // 10, mask] = 1
    return ref - hole


def run_optimize(cfg):
    from drtvam_tpu.opt.optimize import optimize
    os.makedirs(cfg["output"], exist_ok=True)
    return optimize(cfg)


def check(cfg, vol_final, min_percent, film=(100, 100, 50)):
    ref = analytic_phantom(film)
    thr = (cfg["loss"]["tl"] + cfg["loss"]["tu"]) / 2
    ok = np.isclose(ref, vol_final[:, :, :, 0] > thr)
    percent = np.mean(ok) * 100
    assert percent > min_percent, f"agreement {percent:.2f}%"
    return percent


@pytest.fixture
def hole_mesh(tmp_path):
    """The reference's box_hole.ply phantom, procedurally: a 4x4x2 box
    (after size-4 normalization) with a radius-0.8 through-hole offset
    to x = -1.2 of the center, matching the analytic reference grid."""
    from drtvam_tpu.ops.mesh import make_box_with_hole, save_ply
    # sensor is 5 x 5 x 1.25; film 100x100x50 -> phantom occupies
    # [10:90] x [10:90] x [5:45] voxels = 4 x 4 x 1.0 world units.
    # target 'size' 4.0 rescales max extent to 4 -> build box half
    # (2, 2, 0.5). Hole: radius 20 voxels = 1.0, center x offset
    # (30-50 voxels) = -1.0 in y-grid coords.
    mesh = make_box_with_hole((2.0, 2.0, 0.5), 1.0,
                              hole_center_xy=(-1.0, 0.0), segments=99)
    path = str(tmp_path / "box_hole.ply")
    save_ply(mesh, path)
    return path


def test_e2e_index_matched_quick(hole_mesh, tmp_path):
    """Reduced workload smoke gate: 100 angles, 100x10 DMD, 15 steps."""
    film = (100, 100, 50)
    cfg = make_config(
        hole_mesh, str(tmp_path / "out"),
        {"type": "index_matched", "r": 2.9,
         "medium": {"ior": 1.347, "phase": {"type": "rayleigh"},
                    "extinction": 0.03, "albedo": 0.0}},
        n_patterns=100, resx=100, resy=20, film=film, n_steps=15)
    vol = run_optimize(cfg)
    check(cfg, vol, 97.0, film)


@pytest.mark.slow
def test_e2e_index_matched_full(hole_mesh, tmp_path):
    cfg = make_config(
        hole_mesh, str(tmp_path / "out"),
        {"type": "index_matched", "r": 2.9,
         "medium": {"ior": 1.347, "phase": {"type": "rayleigh"},
                    "extinction": 0.03, "albedo": 0.0}})
    vol = run_optimize(cfg)
    check(cfg, vol, 99.4)


@pytest.mark.slow
def test_e2e_cylindrical_full(hole_mesh, tmp_path):
    cfg = make_config(
        hole_mesh, str(tmp_path / "out"),
        {"type": "cylindrical", "r_int": 7, "r_ext": 8, "ior": 1.54,
         "medium": {"ior": 1.40, "phase": {"type": "rayleigh"},
                    "extinction": 0.1, "albedo": 0.5}})
    vol = run_optimize(cfg)
    check(cfg, vol, 99.4)


@pytest.mark.slow
def test_e2e_square_full(hole_mesh, tmp_path):
    cfg = make_config(
        hole_mesh, str(tmp_path / "out"),
        {"type": "square", "w_int": 7.0, "w_ext": 8.0, "ior": 1.24,
         "medium": {"ior": 1.347, "phase": {"type": "rayleigh"},
                    "extinction": 0.07, "albedo": 0.0}},
        loss={"type": "threshold", "tl": 0.9, "tu": 0.95})
    vol = run_optimize(cfg)
    check(cfg, vol, 99.4)
