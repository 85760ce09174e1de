"""Checkpoint/resume: an interrupted optimization continued from its
checkpoint must reproduce the uninterrupted run exactly (per-step RNG
seeds are the step index, and the optimizer state round-trips)."""
import json
import os

import numpy as np
import pytest

from drtvam_tpu.opt.optimize import optimize


def _config(mesh_path, out, **kw):
    cfg = {
        "vial": {"type": "index_matched", "r": 5.0,
                 "medium": {"ior": 1.4, "extinction": 0.05, "albedo": 0.0}},
        "projector": {"type": "collimated", "n_patterns": 24, "resx": 24,
                      "resy": 8, "pixel_size": 0.2,
                      "motion": "circular", "distance": 20},
        "sensor": {"type": "dda", "scalex": 4, "scaley": 4, "scalez": 1.4,
                   "film": {"type": "vfilm", "resx": 24, "resy": 24,
                            "resz": 8}},
        "target": {"filename": mesh_path, "size": 3.0},
        "loss": {"type": "threshold", "tl": 0.85, "tu": 0.95},
        "n_steps": 6,
        "output": out,
    }
    cfg.update(kw)
    return cfg


@pytest.mark.parametrize("optimizer", [{"type": "lbfgs"},
                                       {"type": "adam", "lr": 0.05}])
def test_resume_matches_uninterrupted(box_hole_mesh, tmp_path, optimizer):
    out_a = str(tmp_path / "straight")
    out_b = str(tmp_path / "resumed")
    os.makedirs(out_a)
    os.makedirs(out_b)

    optimize(_config(box_hole_mesh, out_a, optimizer=optimizer))
    pat_a = np.load(os.path.join(out_a, "patterns.npz"))["patterns"]

    # interrupted run: 3 steps with checkpointing...
    optimize(_config(box_hole_mesh, out_b, optimizer=optimizer,
                     n_steps=3, checkpoint_every=1))
    assert os.path.exists(os.path.join(out_b, "checkpoint.npz"))
    ck = dict(np.load(os.path.join(out_b, "checkpoint.npz")))
    assert int(ck["step"]) == 2
    # ...then resumed to the full 6
    optimize(_config(box_hole_mesh, out_b, optimizer=optimizer,
                     checkpoint_every=2, resume=True))
    pat_b = np.load(os.path.join(out_b, "patterns.npz"))["patterns"]

    assert np.allclose(pat_a, pat_b, rtol=1e-5, atol=1e-7), \
        float(np.abs(pat_a - pat_b).max())
    loss_b = np.load(os.path.join(out_b, "loss.npy"))
    loss_a = np.load(os.path.join(out_a, "loss.npy"))
    assert np.allclose(loss_a, loss_b, rtol=1e-4)


def test_optimizer_type_mismatch_raises(box_hole_mesh, tmp_path):
    out = str(tmp_path / "o")
    os.makedirs(out)
    optimize(_config(box_hole_mesh, out, n_steps=2, checkpoint_every=1))
    with pytest.raises(ValueError, match="optimizer"):
        optimize(_config(box_hole_mesh, out, resume=True,
                         optimizer={"type": "adam"}))
