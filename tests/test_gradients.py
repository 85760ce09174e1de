"""AD-vs-finite-difference gradient checks for all three dose
estimators — the key numerical contract of the renderer (mirrors
reference tests/test_integrators.py:70-110, which asserts relative
error < 2e-4 on a scattering cylindrical scene).

Because the adjoint re-traces the forward paths with the same RNG
stream, the AD gradient differentiates the *same realization* the FD
probe evaluates, so agreement is limited only by float32 arithmetic.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drtvam_tpu.models.scene import Scene
from drtvam_tpu.ops.render import render


def build_scene(method, tmp_path_factory):
    from drtvam_tpu.ops.mesh import make_box, save_ply
    path = tmp_path_factory.mktemp("grad") / "target.ply"
    save_ply(make_box((0.5, 0.5, 0.5)), str(path))
    d_ext = 16.77
    d_int = 15.33
    config = {
        "vial": {
            "type": "cylindrical",
            "r_ext": 0.5 * d_ext,
            "r_int": 0.5 * d_int,
            "height": 20.0,
            "ior": 1.514,
            "medium": {
                "ior": 1.4849,
                "extinction": 0.1,
                "albedo": 0.5,
                "phase": {"type": "rayleigh"},
            },
        },
        "projector": {
            "type": "collimated",
            "n_patterns": 10,
            "resx": 24,
            "resy": 24,
            "pixel_size": d_ext / 24,
            "motion": "circular",
            "distance": 1.5 * d_ext,
        },
        "sensor": {
            "type": method,
            "scalex": d_ext, "scaley": d_ext, "scalez": d_ext,
            "majorant": 10.0,
            "film": {"type": "vfilm", "resx": 32, "resy": 32, "resz": 32},
        },
        "target": {"filename": str(path), "size": 4.0},
        "output": ".",
    }
    return Scene(config)


@pytest.mark.parametrize("method", ["dda", "ratio", "delta"])
def test_reverse_ad_matches_fd(method, tmp_path_factory):
    scene = build_scene(method, tmp_path_factory)
    static, arr = scene.build(
        mode="volume", include_target=False, max_depth=32, rr_depth=3,
        print_time=1.0, transmission_only=True, sample_time=True)
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    n = scene.projector.active_size()
    patterns = jnp.linspace(1.0, 10.0, n, dtype=jnp.float32)
    spp = 16

    @jax.jit
    def loss_of(data):
        vol = render(static, arr, data, inv_vol, seed=0, spp=spp,
                     chunk=1 << 16)
        return jnp.mean(jnp.square(vol))

    eps = 1e-3
    l1 = float(loss_of(patterns * (1.0 + eps)))
    l2 = float(loss_of(patterns * (1.0 - eps)))
    fd = (l1 - l2) / (2 * eps)

    g = jax.jit(jax.grad(loss_of))(patterns)
    ad = float(jnp.dot(g, patterns))

    assert fd != 0.0
    assert abs(ad - fd) / abs(fd) < 2e-4
