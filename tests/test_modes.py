"""psf_analysis and forward_mode drives (reference optimize.py:240-284).

Both modes skip the optimization loop: psf_analysis traces a handful of
isolated DMD pixels to image the system's point-spread, forward_mode
re-projects previously saved patterns (the reference's
`--forward_mode --patterns x.npz` flow). These were implemented but
untested through round 3 — the classic "compiles but unproven" gap.
"""
import json
import os

import numpy as np
import pytest


def tiny_config(mesh_path, out, **extra):
    cfg = {
        "vial": {"type": "index_matched", "r": 2.9,
                 "medium": {"ior": 1.347,
                            "phase": {"type": "rayleigh"},
                            "extinction": 0.03, "albedo": 0.0}},
        "projector": {"type": "collimated", "n_patterns": 40,
                      "resx": 48, "resy": 12, "pixel_size": 0.1,
                      "motion": "circular", "distance": 20},
        "sensor": {"type": "dda", "scalex": 5, "scaley": 5,
                   "scalez": 1.25,
                   "film": {"type": "vfilm", "resx": 48, "resy": 48,
                            "resz": 24}},
        "target": {"filename": mesh_path, "size": 4.0},
        "loss": {"type": "threshold", "tl": 0.85, "tu": 0.95},
        "n_steps": 6,
        "output": out,
    }
    cfg.update(extra)
    return cfg


def test_psf_analysis_two_pixels(box_hole_mesh, tmp_path):
    """A psf_analysis config with two isolated pixels must produce a
    final dose that is exactly two beam footprints: for a collimated
    projector each lit pixel deposits along one straight chord, so the
    dose support collapses to two thin tracks (a tiny fraction of the
    volume), confined to the two pixels' z-rows."""
    from drtvam_tpu.opt.optimize import optimize

    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    cfg = tiny_config(
        box_hole_mesh, out,
        psf_analysis=[
            {"x": 10, "y": 3, "index_pattern": 0, "intensity": 1.0},
            {"x": 30, "y": 9, "index_pattern": 5, "intensity": 2.0},
        ])
    vol = optimize(cfg)

    assert os.path.exists(os.path.join(out, "final.npy"))
    dose = vol[..., 0]
    assert dose.max() > 0.0
    # two collimated beams through a 48^2 x 24 grid: support is two
    # ~1-voxel-thick chords -> well under 1% of all voxels
    frac_lit = np.count_nonzero(dose > 1e-6 * dose.max()) / dose.size
    assert frac_lit < 0.01, f"dose support {frac_lit:.3%} is not beam-like"
    # each beam stays in the z-slab of its DMD row: row y (of 12 rows)
    # maps to a 2-voxel slab of the 24-row film
    z_any = np.nonzero(dose.sum(axis=(1, 2)) > 1e-6 * dose.max())[0]
    # each DMD row's 0.1-high jittered footprint covers <= 3 of the
    # 0.052-high film voxels; two rows -> <= 6 lit z-slices, in two
    # separated groups
    assert len(z_any) <= 6
    assert np.max(np.diff(z_any)) > 2  # two disjoint beams in z
    # the saved patterns must contain exactly the two requested pixels
    pats = np.load(os.path.join(out, "patterns.npz"))["patterns"]
    lit = np.nonzero(pats)
    assert len(lit[0]) == 2
    assert set(zip(lit[0], lit[1], lit[2])) == {(0, 3, 10), (5, 9, 30)}
    np.testing.assert_allclose(sorted(pats[lit]), [1.0, 2.0])


def test_psf_analysis_rejects_out_of_range(box_hole_mesh, tmp_path):
    from drtvam_tpu.opt.optimize import optimize
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    cfg = tiny_config(
        box_hole_mesh, out,
        psf_analysis=[{"x": 48, "y": 0, "index_pattern": 0,
                       "intensity": 1.0}])
    with pytest.raises(ValueError, match="outside"):
        optimize(cfg)
    cfg = tiny_config(
        box_hole_mesh, out,
        psf_analysis=[{"x": 0, "y": 0, "index_pattern": 40,
                       "intensity": 1.0}])
    with pytest.raises(ValueError, match="n_patterns"):
        optimize(cfg)


def test_forward_mode_reproduces_final_dose(box_hole_mesh, tmp_path):
    """Optimize briefly, save patterns, then forward-project them: the
    forward render must reproduce the optimization's final dose exactly
    (same physics, same spp_ref, deterministic ballistic engine) —
    the reference contract for --forward_mode --patterns
    (optimize.py:240-243,433-438)."""
    from drtvam_tpu.opt.optimize import optimize

    out_a = str(tmp_path / "opt")
    os.makedirs(out_a, exist_ok=True)
    cfg = tiny_config(box_hole_mesh, out_a)
    vol_opt = optimize(cfg)

    pats = np.load(os.path.join(out_a, "patterns.npz"))["patterns"]

    out_b = str(tmp_path / "fwd")
    os.makedirs(out_b, exist_ok=True)
    cfg_b = tiny_config(box_hole_mesh, out_b)
    vol_fwd = optimize(cfg_b, patterns_fwd=pats)

    np.testing.assert_allclose(vol_fwd, vol_opt, rtol=1e-5, atol=1e-7)
    assert os.path.exists(os.path.join(out_b, "final.npy"))


def test_forward_mode_cli_flow(box_hole_mesh, tmp_path):
    """The CLI flag plumbing: --forward_mode --patterns file.npz loads
    the npz and routes it into optimize(patterns_fwd=...)."""
    from drtvam_tpu.opt.optimize import main

    out_a = str(tmp_path / "opt")
    os.makedirs(out_a, exist_ok=True)
    cfg = tiny_config(box_hole_mesh, out_a)
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    main([cfg_path])
    final_a = np.load(os.path.join(out_a, "final.npy"))

    out_b = str(tmp_path / "fwd")
    cfg["output"] = out_b
    os.makedirs(out_b, exist_ok=True)
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    main([cfg_path, "--forward_mode", "--patterns",
          os.path.join(out_a, "patterns.npz")])
    final_b = np.load(os.path.join(out_b, "final.npy"))
    np.testing.assert_allclose(final_b, final_a, rtol=1e-5, atol=1e-7)
