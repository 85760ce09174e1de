"""Native C++ transport rasterizer == jitted JAX rasterizer."""
import numpy as np
import pytest

from drtvam_tpu.models.scene import Scene
from drtvam_tpu.ops.transport2d import build_transport, strip_target
from drtvam_tpu.native import build_transport_native, available

VIALS = {
    "cylindrical": {"type": "cylindrical", "r_int": 2.0, "r_ext": 2.3,
                    "ior": 1.54},
    "square": {"type": "square", "w_int": 3.4, "w_ext": 4.0, "ior": 1.54},
    "index_matched": {"type": "index_matched", "r": 2.2},
    "double_cylindrical": {
        "type": "double_cylindrical", "r_ext_outer": 2.6,
        "r_int_outer": 2.3, "r_ext_inner": 0.8, "r_int_inner": 0.6,
        "ior_outer": 1.54, "ior_inner": 1.54, "ior_inside_inner": 1.33},
}


def _scene(vial, mesh):
    cfg = {
        "vial": dict(VIALS[vial],
                     medium={"ior": 1.4, "extinction": 0.08, "albedo": 0.0}),
        "projector": {"type": "collimated", "n_patterns": 11, "resx": 40,
                      "resy": 8, "pixel_size": 0.1,
                      "motion": "circular", "distance": 15},
        "sensor": {"type": "dda", "scalex": 3, "scaley": 3, "scalez": 1,
                   "film": {"type": "vfilm", "resx": 36, "resy": 36,
                            "resz": 8}},
        "target": {"filename": mesh, "size": 2.0},
        "output": "/tmp",
    }
    return Scene(cfg)


@pytest.mark.skipif(not available(), reason="no C++ toolchain")
@pytest.mark.parametrize("vial", list(VIALS))
@pytest.mark.parametrize("supersample", [1, 2])
def test_native_matches_jax(vial, supersample, box_hole_mesh):
    scene = _scene(vial, box_hole_mesh)
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=6, rr_depth=6)
    static2, arr2 = strip_target(static, arr)
    W_j, UW_j = (np.asarray(x) for x in
                 build_transport(static2, arr2, supersample))
    out = build_transport_native(static2, arr2, supersample)
    assert out is not None
    W_n, UW_n = out
    # identical math in different fp evaluation orders; rays grazing a
    # cell corner can round a deposit into the neighbor cell
    assert np.allclose(W_n, W_j, rtol=2e-4, atol=1e-5), \
        np.abs(W_n - W_j).max()
    assert np.allclose(UW_n, UW_j, rtol=2e-4, atol=1e-4), \
        np.abs(UW_n - UW_j).max()
    assert abs(W_n.sum() - W_j.sum()) < 1e-4 * max(W_j.sum(), 1e-9)
    # the fan must actually deposit something
    assert W_n.sum() > 0
