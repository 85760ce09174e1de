"""Angle-sharded ballistic engine == single-device engine, dose and
pattern gradients, on the 8-virtual-CPU-device mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drtvam_tpu.models.scene import Scene
from drtvam_tpu.ops.ballistic import BallisticEngine
from drtvam_tpu.parallel.shard import make_mesh, shard_ballistic_engine


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    from drtvam_tpu.ops.mesh import make_box, save_ply
    path = tmp_path_factory.mktemp("bshard") / "t.ply"
    save_ply(make_box((0.5, 0.5, 0.5)), str(path))
    cfg = {
        "vial": {"type": "cylindrical", "r_int": 2.3, "r_ext": 2.6,
                 "ior": 1.54,
                 "medium": {"ior": 1.40, "extinction": 0.1,
                            "albedo": 0.0,
                            "phase": {"type": "rayleigh"}}},
        # 24 angles: divides over 8 devices
        "projector": {"type": "collimated", "n_patterns": 24, "resx": 32,
                      "resy": 16, "pixel_size": 0.1531,
                      "motion": "circular", "distance": 20},
        "sensor": {"type": "dda", "scalex": 5.07, "scaley": 5.07,
                   "scalez": 1.29,
                   "film": {"type": "vfilm", "resx": 32, "resy": 32,
                            "resz": 16}},
        "target": {"filename": str(path), "size": 4.0},
        "output": ".",
    }
    return Scene(cfg)


def test_sharded_ballistic_matches_single(scene):
    assert len(jax.devices()) == 8
    static, arr = scene.build(mode="volume", include_target=False,
                              regular_sampling=True)
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    n = scene.projector.active_size()
    data = jnp.linspace(0.5, 1.5, n, dtype=jnp.float32)
    tgt = jnp.asarray(np.random.default_rng(0).random(
        (16, 32, 32, 1)).astype(np.float32))

    eng1 = BallisticEngine(static, arr, impl="xla")
    v1 = np.asarray(jax.jit(lambda d: eng1.render_vol(d, inv_vol))(data))
    dvol = jax.jit(jax.grad(lambda v: jnp.mean((v - tgt) ** 2)))(
        jnp.asarray(v1))
    g1 = np.asarray(eng1.pattern_grad(dvol, inv_vol))

    eng2 = BallisticEngine(static, arr, impl="xla")
    eng2 = shard_ballistic_engine(eng2, make_mesh())
    v2 = np.asarray(jax.jit(lambda d: eng2.render_vol(d, inv_vol))(data))
    g2 = np.asarray(eng2.pattern_grad(dvol, inv_vol))

    assert v1.sum() > 0
    np.testing.assert_allclose(v2, v1, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(g2, g1, rtol=2e-5, atol=1e-9)
