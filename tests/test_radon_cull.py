"""Analytic (ballistic-transport) Radon culling vs the wavefront radon
render (reference optimize.py:143-163).

For transport-eligible scenes `radon_active_ballistic` replaces the
10^8-lane radon march with one transpose matmul of the target occupancy
against the unscattered transport field W. With regular (pixel-center)
sampling both compute the support of the same refracted polyline, so
the kept-pixel sets must agree up to voxel-grazing boundary pixels.
"""
import numpy as np
import pytest


def _scene(box_hole_mesh, albedo):
    from drtvam_tpu.models.scene import Scene
    cfg = {
        "vial": {"type": "cylindrical", "r_int": 2.6, "r_ext": 2.9,
                 "ior": 1.54,
                 "medium": {"ior": 1.40, "phase": {"type": "rayleigh"},
                            "extinction": 0.1, "albedo": albedo}},
        "projector": {"type": "collimated", "n_patterns": 32,
                      "resx": 64, "resy": 16, "pixel_size": 5.0 / 64,
                      "motion": "circular", "distance": 20},
        "sensor": {"type": "dda", "scalex": 5, "scaley": 5,
                   "scalez": 1.25,
                   "film": {"type": "vfilm", "resx": 48, "resy": 48,
                            "resz": 24}},
        "target": {"filename": box_hole_mesh, "size": 1.5},
        "output": "/tmp",
    }
    return Scene(cfg)


@pytest.mark.parametrize("albedo", [0.0, 0.5])
def test_analytic_cull_matches_radon_render(box_hole_mesh, albedo):
    from drtvam_tpu.ops.ballistic import radon_active_ballistic
    from drtvam_tpu.ops.render import render_radon

    scene = _scene(box_hole_mesh, albedo)
    mask = np.asarray(scene.sensor.discretize(scene.target_bank()))

    static_v, arr_v = scene.build(mode="volume", include_target=False,
                                  max_depth=5, rr_depth=6)
    active_a = set(radon_active_ballistic(static_v, arr_v,
                                          mask).tolist())

    static_r, arr_r = scene.build(mode="radon", include_target=True,
                                  max_depth=5, rr_depth=6,
                                  regular_sampling=True)
    img = np.asarray(render_radon(static_r, arr_r, seed=0, spp=1))
    active_r = set(np.nonzero(img > 0.0)[0].tolist())

    n = scene.projector.active_size()
    # both culls must keep a nontrivial, mostly-black-free subset
    assert 0 < len(active_a) < n
    assert 0 < len(active_r) < n
    # identical support up to voxel-grazing boundary pixels: the radon
    # march scores the analytic target MESH while the matmul scores its
    # VOXELIZATION, so pixels whose ray only grazes the half-voxel skin
    # may differ. Everything else must agree.
    diff = active_a.symmetric_difference(active_r)
    assert len(diff) <= 0.02 * n, \
        f"cull sets differ on {len(diff)}/{n} pixels"
    # every differing pixel must be a boundary pixel: its immediate
    # left/right DMD neighbor IN THE SAME ROW is kept by BOTH culls
    # (flat i±1 alone could cross a row or pattern boundary and
    # accidentally accept the first pixel of the next row as a witness)
    both = active_a & active_r
    resx = scene.projector.resx
    for i in diff:
        col = i % resx
        ok = (col + 1 < resx and i + 1 in both) or \
             (col - 1 >= 0 and i - 1 in both)
        assert ok, f"non-boundary cull disagreement at flat pixel {i}"


def test_analytic_cull_sparse_store_dense_indices(box_hole_mesh):
    """When the projector already holds a SPARSE active set (cropped
    window / filter_nonzero), radon_active_ballistic must still return
    DENSE flat DMD indices: pattern_grad's output is active-subset-
    relative and has to be mapped back through the sparse store.
    Regression test for the round-4 advisor finding (wrong pixels
    silently activated for cropped projectors)."""
    from drtvam_tpu.ops.ballistic import radon_active_ballistic

    scene = _scene(box_hole_mesh, 0.0)
    mask = np.asarray(scene.sensor.discretize(scene.target_bank()))

    static_d, arr_d = scene.build(mode="volume", include_target=False,
                                  max_depth=5, rr_depth=6)
    dense_kept = set(radon_active_ballistic(static_d, arr_d,
                                            mask).tolist())

    # restrict the projector to every other dense pixel, then cull again
    n_dense = np.prod(scene.projector.size())
    subset = np.arange(0, n_dense, 2, dtype=np.int32)
    scene.projector.set_active(subset,
                               np.zeros(subset.size, np.float32))
    static_s, arr_s = scene.build(mode="volume", include_target=False,
                                  max_depth=5, rr_depth=6)
    sparse_kept = set(radon_active_ballistic(static_s, arr_s,
                                             mask).tolist())

    assert sparse_kept, "sparse cull kept nothing"
    # dense numbering: exactly the even-index survivors of the dense cull
    assert sparse_kept == {i for i in dense_kept if i % 2 == 0}
