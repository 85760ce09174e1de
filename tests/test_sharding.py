"""Sharded render == single-chip render (forward dose AND pattern
gradients) on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drtvam_tpu.models.scene import Scene
from drtvam_tpu.ops.render import render
from drtvam_tpu.parallel.shard import make_mesh, render_sharded


@pytest.fixture(scope="module")
def small_scene(tmp_path_factory):
    from drtvam_tpu.ops.mesh import make_box, save_ply
    path = tmp_path_factory.mktemp("shard") / "target.ply"
    save_ply(make_box((0.5, 0.5, 0.5)), str(path))
    cfg = {
        "vial": {"type": "cylindrical", "r_int": 7, "r_ext": 8,
                 "ior": 1.54,
                 "medium": {"ior": 1.40, "phase": {"type": "rayleigh"},
                            "extinction": 0.1, "albedo": 0.5}},
        "projector": {"type": "collimated", "n_patterns": 12, "resx": 16,
                      "resy": 8, "pixel_size": 0.3, "motion": "circular",
                      "distance": 20},
        "sensor": {"type": "dda", "scalex": 5, "scaley": 5,
                   "scalez": 1.25,
                   "film": {"type": "vfilm", "resx": 16, "resy": 16,
                            "resz": 8}},
        "target": {"filename": str(path), "size": 4.0},
        "output": ".",
    }
    return Scene(cfg)


def test_sharded_matches_single_chip(small_scene):
    assert len(jax.devices()) == 8
    scene = small_scene
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=8, rr_depth=6)
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    n = scene.projector.active_size()
    data = jnp.linspace(0.5, 2.0, n, dtype=jnp.float32)
    mesh = make_mesh()

    def loss_single(d):
        v = render(static, arr, d, inv_vol, seed=3, spp=2, chunk=1 << 14)
        return jnp.mean(jnp.square(v)), v

    def loss_sharded(d):
        v = render_sharded(mesh, static, arr, d, inv_vol, seed=3, spp=2,
                           chunk=1 << 14)
        return jnp.mean(jnp.square(v)), v

    (l1, v1), g1 = jax.jit(
        jax.value_and_grad(loss_single, has_aux=True))(data)
    (l2, v2), g2 = jax.jit(
        jax.value_and_grad(loss_sharded, has_aux=True))(data)

    v1, v2 = np.asarray(v1), np.asarray(v2)
    assert v2.sum() > 0
    np.testing.assert_allclose(v1, v2, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=5e-4, atol=1e-8)
