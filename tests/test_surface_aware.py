"""Surface-aware discretization: fractional-volume film, 2-channel
loss, and e2e optimization (reference film.py:16-21, sensor.py:47-110,
loss.py:39-47; no reference test config exists for this mode, so the
quality bar is our own: the final binary-sensor print must match the
phantom).
"""
import numpy as np
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_e2e_surface_aware(tmp_path):
    from drtvam_tpu.ops.mesh import make_box_with_hole, save_ply
    from drtvam_tpu.opt.optimize import optimize

    mesh = make_box_with_hole((2.0, 2.0, 0.5), 1.0,
                              hole_center_xy=(-1.0, 0.0), segments=99)
    path = str(tmp_path / "box_hole.ply")
    save_ply(mesh, path)
    cfg = {
        "vial": {"type": "index_matched", "r": 2.9,
                 "medium": {"ior": 1.347, "phase": {"type": "rayleigh"},
                            "extinction": 0.03, "albedo": 0.0}},
        "projector": {"type": "collimated", "n_patterns": 120,
                      "resx": 120, "resy": 20, "pixel_size": 50e-3,
                      "motion": "circular", "distance": 20},
        "sensor": {"type": "dda", "scalex": 5, "scaley": 5,
                   "scalez": 1.25,
                   "film": {"type": "vfilm", "resx": 60, "resy": 60,
                            "resz": 30, "surface_aware": True}},
        "final_sensor": {"type": "dda", "scalex": 5, "scaley": 5,
                         "scalez": 1.25,
                         "film": {"type": "vfilm", "resx": 100,
                                  "resy": 100, "resz": 50}},
        "target": {"filename": path, "size": 4.0},
        "loss": {"type": "threshold", "tl": 0.85, "tu": 0.95},
        "n_steps": 20,
        "output": str(tmp_path / "out"),
    }
    vol = optimize(cfg)

    target_binary = np.load(str(tmp_path / "out" / "target_binary.npy"))
    pred = vol[..., 0] > 0.9
    agree = np.mean(pred == (target_binary[..., 0] > 0)) * 100
    assert agree > 97.0, f"agreement {agree:.2f}%"

    # surface-aware target artifact has 2 channels summing to voxel vol
    target = np.load(str(tmp_path / "out" / "target.npy"))
    assert target.shape[-1] == 2
    voxel_vol = (5.0 / 60) ** 2 * (1.25 / 30)
    np.testing.assert_allclose(target.sum(-1), voxel_vol, rtol=1e-3)


def test_surface_aware_ballistic_matches_wavefront(tmp_path):
    """SA ballistic (mask channel split) vs SA wavefront (parity
    channel split): interior voxels must agree; boundary voxels may
    differ in channel attribution."""
    import jax
    from drtvam_tpu.models.scene import Scene
    from drtvam_tpu.ops.render import render
    from drtvam_tpu.ops.ballistic import BallisticEngine
    from drtvam_tpu.ops.mesh import make_box, save_ply

    path = str(tmp_path / "t.ply")
    save_ply(make_box((1.0, 1.0, 0.4)), path)
    cfg = {
        "vial": {"type": "index_matched", "r": 2.9,
                 "medium": {"ior": 1.347, "extinction": 0.03,
                            "albedo": 0.0,
                            "phase": {"type": "rayleigh"}}},
        "projector": {"type": "collimated", "n_patterns": 17, "resx": 30,
                      "resy": 12, "pixel_size": 0.1631,
                      "motion": "circular", "distance": 20},
        "sensor": {"type": "dda", "scalex": 5.07, "scaley": 5.07,
                   "scalez": 1.29,
                   "film": {"type": "vfilm", "resx": 30, "resy": 30,
                            "resz": 12, "surface_aware": True}},
        "final_sensor": {"type": "dda", "scalex": 5.07, "scaley": 5.07,
                         "scalez": 1.29,
                         "film": {"type": "vfilm", "resx": 30,
                                  "resy": 30, "resz": 12}},
        "target": {"filename": path, "size": 2.0},
        "output": str(tmp_path),
    }
    sc = Scene(cfg)
    static, arr = sc.build(mode="volume", include_target=True,
                           max_depth=10, rr_depth=32,
                           regular_sampling=True)
    assert static.sensor.channels == 2
    n = sc.projector.active_size()
    data = jnp.ones((n,), jnp.float32)
    inv_vol = jnp.float32(1.0)  # compare raw accumulators
    vw = np.asarray(jax.jit(lambda d: render(
        static, arr, d, inv_vol, seed=0, spp=1, chunk=1 << 16))(data))
    mask = sc.sensor.discretize(sc.target_bank())
    eng = BallisticEngine(static, arr, impl="xla", inside_mask=mask)
    vb = np.asarray(jax.jit(lambda d: eng.render_vol(d, inv_vol))(data))

    assert vw.sum() > 0
    # total dose (sum of channels) matches everywhere
    np.testing.assert_allclose(vb.sum(-1), vw.sum(-1), rtol=1e-3,
                               atol=1e-4 * vw.max())
    # channel attribution matches away from the target surface: voxels
    # fully inside / outside (per the mask, eroded by 1) agree per-channel
    m = np.asarray(mask)[..., 0]
    interior = np.ones_like(m, bool)
    for ax in range(3):
        for sh in (1, -1):
            interior &= np.roll(m, sh, axis=ax) == m
    sel = interior
    np.testing.assert_allclose(vb[sel], vw[sel], rtol=1e-3,
                               atol=1e-4 * vw.max())
