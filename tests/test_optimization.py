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


REF_PLY = "/root/reference/tests/files/box_hole.ply"


@pytest.fixture
def hole_mesh(tmp_path):
    """The reference's box_hole.ply phantom. When the reference checkout
    is mounted, the parity tests load the ACTUAL binary PLY the
    reference's own tests optimize (tests/test_optimization.py:95-130);
    otherwise a procedural equivalent is built: a 4x4x2 box (after
    size-4 normalization) with a radius-0.8 through-hole offset to
    x = -1.2 of the center, matching the analytic reference grid.
    (Quick-gate agreement measured identical: 99.48% either way.)"""
    from drtvam_tpu.ops.mesh import make_box_with_hole, save_ply
    if os.path.exists(REF_PLY):
        return REF_PLY
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
    """Reference box_hole_cylindrical.json: albedo 0.5 scattering,
    tl 0.85 / tu 0.95, 200 angles, 30 steps (>99.4% bar,
    reference test_optimization.py:155). The hybrid engine renders the
    unscattered transport analytically and the scattered residual with
    the scene's configured dda estimator — the reference's own deposit
    scheme. (Round-3 shipped this with a delta residual, whose one-
    deposit-per-medium-event gradient variance stalled convergence at
    94.28%; dda measures 99.42% — bisected in round 4.)"""
    cfg = make_config(
        hole_mesh, str(tmp_path / "out"),
        {"type": "cylindrical", "r_int": 7, "r_ext": 8, "ior": 1.54,
         "medium": {"ior": 1.40, "phase": {"type": "rayleigh"},
                    "extinction": 0.1, "albedo": 0.5}})
    vol = run_optimize(cfg)
    check(cfg, vol, 99.4)


def test_e2e_scattering_bounded(hole_mesh, tmp_path):
    """Bounded scattering gate for the default suite (~90 s on a
    2-core CPU): the reference's box_hole_scattering.json style —
    square vial, albedo 0.9 Rayleigh, tl 0.35 / tu 0.55, filter_radon —
    at reduced scale (128 angles, 64x16 DMD, 64^2x32 film, 15 steps,
    spp 4 / spp_grad 8, delta residual). Calibrated agreement at this
    scale: 94.9% — the bar gates regressions of the albedo-0.9 hybrid
    path, not reference parity (that is the slow full test)."""
    film = (64, 64, 32)
    cfg = make_config(
        hole_mesh, str(tmp_path / "out"),
        {"type": "square", "w_int": 7.0, "w_ext": 8.0, "ior": 1.24,
         "medium": {"ior": 1.347, "phase": {"type": "rayleigh"},
                    "extinction": 0.09, "albedo": 0.9}},
        n_patterns=128, resx=64, resy=16, film=film, n_steps=15, spp=4,
        loss={"type": "threshold", "tl": 0.35, "tu": 0.55},
        hybrid_estimator="delta", spp_grad=8, filter_radon=True)
    cfg["projector"]["pixel_size"] = 5.0 / 64
    vol = run_optimize(cfg)
    check(cfg, vol, 93.0, film)


@pytest.mark.slow
def test_e2e_square_scattering_full(hole_mesh, tmp_path):
    """Reference box_hole_scattering.json verbatim: square vial,
    albedo 0.9, tl 0.35 / tu 0.55, filter_radon, spp 4 / spp_grad 16,
    200 angles, 30 steps; >99.0% bar (test_optimization.py:153).
    Scattered residual uses the scene's configured dda estimator (the
    round-3 delta residual measured 98.90%, just under the bar)."""
    cfg = make_config(
        hole_mesh, str(tmp_path / "out"),
        {"type": "square", "w_int": 7.0, "w_ext": 8.0, "ior": 1.24,
         "medium": {"ior": 1.347, "phase": {"type": "rayleigh"},
                    "extinction": 0.09, "albedo": 0.9}},
        loss={"type": "threshold", "tl": 0.35, "tu": 0.55},
        spp=4, spp_grad=16, filter_radon=True, spp_ref=16)
    vol = run_optimize(cfg)
    check(cfg, vol, 99.0)


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
