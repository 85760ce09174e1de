"""Ballistic matmul engine vs wavefront MC engine: dose + gradients.

Geometry is deliberately non-degenerate (pixel pitch, voxel size and
angle count share no alignment) — at knife-edge alignments (rays
exactly on voxel boundaries / exact 45-degree diagonals) the two
engines make different but equally-valid f32 tie-breaks.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drtvam_tpu.models.scene import Scene
from drtvam_tpu.ops.render import render
from drtvam_tpu.ops.ballistic import BallisticEngine, ballistic_eligible


VIALS = {
    "index_matched": {
        "type": "index_matched", "r": 2.9,
        "medium": {"ior": 1.347, "extinction": 0.03, "albedo": 0.0,
                   "phase": {"type": "rayleigh"}}},
    "cylindrical": {
        "type": "cylindrical", "r_int": 2.3, "r_ext": 2.6, "ior": 1.54,
        "medium": {"ior": 1.40, "extinction": 0.1, "albedo": 0.0,
                   "phase": {"type": "rayleigh"}}},
    "square": {
        "type": "square", "w_int": 4.6, "w_ext": 5.2, "ior": 1.24,
        "medium": {"ior": 1.347, "extinction": 0.07, "albedo": 0.0,
                   "phase": {"type": "rayleigh"}}},
    "double_cylindrical": {
        "type": "double_cylindrical", "r_ext_outer": 2.6,
        "r_int_outer": 2.4, "r_ext_inner": 1.0, "r_int_inner": 0.8,
        "ior_outer": 1.54, "ior_inner": 1.52, "ior_inside_inner": 1.40,
        "medium": {"ior": 1.40, "extinction": 0.1, "albedo": 0.0,
                   "phase": {"type": "rayleigh"}}},
}


def build(vial, tmp_path_factory):
    from drtvam_tpu.ops.mesh import make_box, save_ply
    path = tmp_path_factory.mktemp("ball") / "t.ply"
    save_ply(make_box((0.5, 0.5, 0.5)), str(path))
    cfg = {
        "vial": vial,
        "projector": {"type": "collimated", "n_patterns": 23, "resx": 40,
                      "resy": 16, "pixel_size": 0.1231,
                      "motion": "circular", "distance": 20},
        "sensor": {"type": "dda", "scalex": 5.07, "scaley": 5.07,
                   "scalez": 1.29,
                   "film": {"type": "vfilm", "resx": 40, "resy": 40,
                            "resz": 20}},
        "target": {"filename": str(path), "size": 4.0},
        "output": ".",
    }
    sc = Scene(cfg)
    static, arr = sc.build(mode="volume", include_target=False,
                           max_depth=10, rr_depth=32,
                           regular_sampling=True)
    return sc, static, arr


@pytest.mark.parametrize("vial", list(VIALS))
def test_ballistic_matches_wavefront_dose(vial, tmp_path_factory):
    sc, static, arr = build(VIALS[vial], tmp_path_factory)
    assert ballistic_eligible(static)
    n = sc.projector.active_size()
    data = jnp.linspace(0.5, 1.5, n, dtype=jnp.float32)
    inv_vol = jnp.float32(1.0 / sc.sensor.voxel_volume)
    vw = np.asarray(jax.jit(lambda d: render(
        static, arr, d, inv_vol, seed=0, spp=1, chunk=1 << 16))(data))
    eng = BallisticEngine(static, arr, impl="xla")
    vb = np.asarray(jax.jit(lambda d: eng.render_vol(d, inv_vol))(data))
    assert vw.sum() > 0
    np.testing.assert_allclose(vb, vw, rtol=1e-3,
                               atol=1e-4 * np.abs(vw).max())


def test_ballistic_adjoint_is_exact_transpose(tmp_path_factory):
    """<A p, v> == <p, A^T v> for random p, v — the custom_vjp backward
    must be the exact transpose of the forward linear operator."""
    sc, static, arr = build(VIALS["cylindrical"], tmp_path_factory)
    eng = BallisticEngine(static, arr, impl="xla")
    n = sc.projector.active_size()
    inv_vol = jnp.float32(1.0 / sc.sensor.voxel_volume)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.random(n).astype(np.float32))
    v = jnp.asarray(rng.random((20, 40, 40, 1)).astype(np.float32))
    Ap = eng.render_vol(p, inv_vol)
    Atv = eng.pattern_grad(v, inv_vol)
    lhs = float(jnp.vdot(Ap, v))
    rhs = float(jnp.vdot(p, Atv))
    assert abs(lhs - rhs) / abs(lhs) < 1e-5


def test_ballistic_not_eligible_with_scattering(tmp_path_factory):
    vial = dict(VIALS["cylindrical"])
    vial["medium"] = dict(vial["medium"], albedo=0.5)
    _, static, _ = build(vial, tmp_path_factory)
    assert not ballistic_eligible(static)
