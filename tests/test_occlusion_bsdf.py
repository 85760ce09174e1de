"""Occlusion BSDF parity (reference geometry.py:55-72): occlusions
accept arbitrary BSDF dicts — default black diffuse (pure absorber),
plus null, reflective diffuse, and dielectric. The reference attaches
the printing medium as each occlusion's *exterior* medium, so rays
leaving an occlusion on the outside resume medium transport; the
null-passthrough test below pins that behavior (a ray crossing a null
occlusion must deposit identically to no occlusion at all).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from drtvam_tpu.models.scene import Scene
from drtvam_tpu.ops.render import render


def build(tmp_path, occlusion=None, albedo=0.0, transmission_only=True):
    from drtvam_tpu.ops.mesh import make_box, save_ply
    tgt = str(tmp_path / "tgt.ply")
    occ = str(tmp_path / "occ.ply")
    save_ply(make_box((0.8, 0.8, 0.4)), tgt)
    save_ply(make_box((0.8, 0.5, 0.3)), occ)
    vial = {"type": "cylindrical", "r_int": 7, "r_ext": 8, "ior": 1.54,
            "medium": {"ior": 1.40, "phase": {"type": "rayleigh"},
                       "extinction": 0.12, "albedo": albedo}}
    if occlusion is not None:
        vial["occlusions"] = [dict({"filename": occ}, **occlusion)]
    cfg = {
        "vial": vial,
        "projector": {"type": "collimated", "n_patterns": 16, "resx": 24,
                      "resy": 10, "pixel_size": 0.25,
                      "motion": "circular", "distance": 20},
        "sensor": {"type": "dda", "scalex": 5, "scaley": 5,
                   "scalez": 1.25,
                   "film": {"type": "vfilm", "resx": 24, "resy": 24,
                            "resz": 12}},
        "target": {"filename": tgt, "size": 3.0},
        "output": str(tmp_path),
    }
    scene = Scene(cfg)
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=12, rr_depth=12,
                              transmission_only=transmission_only)
    n = scene.projector.active_size()
    data = jnp.ones((n,), jnp.float32)
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    return static, arr, data, inv_vol


def dose(tmp_path, occlusion, **kw):
    static, arr, data, inv_vol = build(tmp_path, occlusion, **kw)
    return np.asarray(render(static, arr, data, inv_vol, seed=3, spp=1))


def test_null_occlusion_passthrough(tmp_path):
    """A null-BSDF occlusion never deflects rays, but its interior has
    no medium (the reference only attaches the printing medium as the
    occlusion's *exterior*): no dose inside it, and rays resume medium
    deposits after exiting — every voxel lit without the occlusion and
    outside it must stay lit. (Before round 4 the exit transition was
    dropped — medium_side defaulted to 0 — so everything downstream of
    a null occlusion went dark.)"""
    d_none = dose(tmp_path, None)[..., 0]
    d_null = dose(tmp_path, {"bsdf": {"type": "null"}})[..., 0]
    assert d_none.sum() > 0
    # voxel-center world coords of the (Z=12, Y=24, X=24) film over the
    # 5 x 5 x 1.25 sensor box; occlusion half-extents (0.8, 0.5, 0.3)
    xs = (np.arange(24) + 0.5) / 24 * 5.0 - 2.5
    zs = (np.arange(12) + 0.5) / 12 * 1.25 - 0.625
    Zc, Yc, Xc = np.meshgrid(zs, xs, xs, indexing="ij")
    vox = np.array([5.0 / 24, 5.0 / 24, 1.25 / 12])  # one-voxel margin
    inside = ((np.abs(Xc) < 0.8 - vox[0]) &
              (np.abs(Yc) < 0.5 - vox[1]) &
              (np.abs(Zc) < 0.3 - vox[2]))
    assert inside.sum() > 4
    np.testing.assert_array_equal(d_null[inside], 0.0)
    # the lit check excludes the whole occlusion bbox plus a one-voxel
    # shell: boundary voxels are mostly vacuum and may legitimately
    # catch no deposit from the finite ray set
    shell = ((np.abs(Xc) < 0.8 + vox[0]) &
             (np.abs(Yc) < 0.5 + vox[1]) &
             (np.abs(Zc) < 0.3 + vox[2]))
    lit = (d_none > 1e-6) & ~shell
    assert lit.sum() > 100
    assert (d_null[lit] > 1e-6).all(), \
        f"{(d_null[lit] <= 1e-6).sum()} voxels went dark behind the " \
        "null occlusion"


def test_black_diffuse_default_absorbs(tmp_path):
    """No bsdf given == reference's default black diffuse == explicit
    diffuse with reflectance 0 (spectrum dict form)."""
    d_default = dose(tmp_path, {})
    d_black = dose(tmp_path, {"bsdf": {
        "type": "diffuse",
        "reflectance": {"type": "spectrum", "value": 0.0}}})
    np.testing.assert_array_equal(d_default, d_black)
    # and it genuinely shadows: total dose below the unoccluded scene
    d_none = dose(tmp_path, None)
    assert d_default.sum() < d_none.sum()


def test_reflective_diffuse_adds_dose(tmp_path):
    """With full BSDF sampling, a reflectance-0.8 diffuse occlusion
    bounces light back into the medium: more total dose than the black
    absorber, which the transmission_only path must NOT see (diffuse
    has no transmission lobe -> absorbed)."""
    d_black = dose(tmp_path, {}, transmission_only=False)
    d_refl = dose(tmp_path, {"bsdf": {"type": "diffuse",
                                      "reflectance": 0.8}},
                  transmission_only=False)
    assert d_refl.sum() > d_black.sum() * 1.001
    # transmission-only: the reflected lobe is masked out, identical to
    # the absorber
    d_black_t = dose(tmp_path, {})
    d_refl_t = dose(tmp_path, {"bsdf": {"type": "diffuse",
                                        "reflectance": 0.8}})
    np.testing.assert_array_equal(d_refl_t, d_black_t)


def test_dielectric_occlusion_transmits(tmp_path):
    """A glass (bk7/resin) occlusion refracts rays through: dose behind
    it stays nonzero, unlike the absorbing default."""
    d_glass = dose(tmp_path, {"bsdf": {"type": "dielectric",
                                       "int_ior": "bk7",
                                       "ext_ior": 1.40}})
    d_black = dose(tmp_path, {})
    assert d_glass.sum() > d_black.sum() * 1.001


def test_unknown_bsdf_raises(tmp_path):
    with pytest.raises(ValueError, match="unsupported occlusion BSDF"):
        build(tmp_path, {"bsdf": {"type": "conductor"}})
