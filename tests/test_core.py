"""Core math: RNG replayability, intersectors, Fresnel, phase sampling,
voxelization."""
import numpy as np
import jax.numpy as jnp

from drtvam_tpu.core.rng import Sampler
from drtvam_tpu.ops.intersect import ray_cylinder, ray_box, ray_triangles
from drtvam_tpu.ops.fresnel import refract, fresnel_dielectric
from drtvam_tpu.ops.medium import sample_phase_direction
from drtvam_tpu.ops.mesh import make_box
from drtvam_tpu.ops.voxelize import occupancy, fractional_volumes


def test_rng_replayable_and_uniform():
    s = Sampler(42)
    lane = jnp.arange(4096, dtype=jnp.uint32)
    ctr = s.init(4096)
    u1, ctr1 = s.next_1d(lane, ctr)
    u2, _ = s.next_1d(lane, ctr1)
    # replay: same (seed, lane, ctr) -> same draws
    v1, _ = s.next_1d(lane, s.init(4096))
    assert np.array_equal(np.asarray(u1), np.asarray(v1))
    # draws decorrelated across counter steps and lanes
    assert abs(float(jnp.corrcoef(u1, u2)[0, 1])) < 0.05
    for u in (u1, u2):
        u = np.asarray(u)
        assert 0.0 <= u.min() and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.02


def test_ray_cylinder():
    o = jnp.asarray([[-5.0, 0.0, 0.0], [-5.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    tmin = jnp.full((3,), 1e-4)
    t, n = ray_cylinder(o, d, tmin, 2.0, -10.0, 10.0)
    t, n = np.asarray(t), np.asarray(n)
    assert np.isclose(t[0], 3.0)           # hits outer wall at x=-2
    assert np.allclose(n[0], [-1, 0, 0])
    assert np.isinf(t[1])                   # parallel to axis, misses
    assert np.isclose(t[2], 2.0)            # from inside, hits x=+2
    assert np.allclose(n[2], [1, 0, 0])


def test_ray_box():
    o = jnp.asarray([[-5.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    tmin = jnp.full((2,), 1e-4)
    t, n = ray_box(o, d, tmin, jnp.asarray([1.0, 2.0, 3.0]))
    t, n = np.asarray(t), np.asarray(n)
    assert np.isclose(t[0], 4.0)
    assert np.allclose(n[0], [-1, 0, 0])
    assert np.isclose(t[1], 2.0)            # inside -> +y face
    assert np.allclose(n[1], [0, 1, 0])


def test_ray_triangles_box_mesh():
    mesh = make_box((1.0, 1.0, 1.0))
    v0, e1, e2, n = (jnp.asarray(a) for a in mesh.triangle_bank())
    o = jnp.asarray([[-5.0, 0.1, 0.2], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    tmin = jnp.full((2,), 1e-4)
    t, tri = ray_triangles(o, d, tmin, v0, e1, e2)
    t = np.asarray(t)
    assert np.isclose(t[0], 4.0, atol=1e-5)
    assert np.isclose(t[1], 1.0, atol=1e-5)  # inside -> top face


def test_fresnel_energy_and_snell():
    # normal incidence air->glass: F = ((n-1)/(n+1))^2
    F, ct, tir = fresnel_dielectric(jnp.asarray([1.0]), jnp.asarray([1.5]))
    assert np.isclose(float(F[0]), ((1.5 - 1) / (1.5 + 1))**2, atol=1e-6)
    assert not bool(tir[0])

    # 45 deg, glass->air beyond critical angle -> TIR
    ci = np.cos(np.deg2rad(45.0))
    F, ct, tir = fresnel_dielectric(jnp.asarray([ci]),
                                    jnp.asarray([1 / 1.5]))
    assert bool(tir[0])

    # Snell: sin(theta_t) = sin(theta_i)/eta
    d = jnp.asarray([[np.sin(0.5), 0.0, -np.cos(0.5)]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    d_t, d_r, F, tir, eta_rel = refract(d, n, jnp.asarray([1.5]))
    sin_t = float(jnp.linalg.norm(d_t[0, :2]))
    assert np.isclose(sin_t, np.sin(0.5) / 1.5, atol=1e-6)
    assert np.isclose(float(jnp.linalg.norm(d_t[0])), 1.0, atol=1e-5)
    # reflection mirrors z
    assert np.allclose(np.asarray(d_r[0]),
                       [np.sin(0.5), 0.0, np.cos(0.5)], atol=1e-6)


def test_phase_sampling_moments():
    s = Sampler(7)
    lane = jnp.arange(1 << 14, dtype=jnp.uint32)
    u, _ = s.next_2d(lane, s.init(1 << 14))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1 << 14, 3))
    for name, g, mean_cos in (("rayleigh", 0.0, 0.0),
                              ("hg", 0.7, 0.7),
                              ("isotropic", 0.0, 0.0)):
        w = sample_phase_direction(name, jnp.float32(g), d,
                                   u[:, 0], u[:, 1])
        w = np.asarray(w)
        assert np.allclose(np.linalg.norm(w, axis=1), 1.0, atol=1e-4)
        assert abs(w[:, 2].mean() - mean_cos) < 0.02


def test_occupancy_box():
    mesh = make_box((0.5, 0.5, 0.5))
    bank = tuple(jnp.asarray(a) for a in mesh.triangle_bank())
    occ = np.asarray(occupancy(bank, np.full(3, -1.0, np.float32),
                               np.full(3, 1.0, np.float32), (8, 8, 8)))
    # center 4^3 voxels inside, outside shell empty
    assert occ.shape == (8, 8, 8, 1)
    assert occ[2:6, 2:6, 2:6].min() == 1.0
    assert occ[:2].max() == 0.0 and occ[6:].max() == 0.0
    assert occ.sum() == 4**3


def test_fractional_volumes_box():
    mesh = make_box((0.5, 0.5, 0.5))
    bank = tuple(jnp.asarray(a) for a in mesh.triangle_bank())
    vols = np.asarray(fractional_volumes(
        bank, np.full(3, -1.0, np.float32), np.full(3, 1.0, np.float32),
        (4, 4, 4), oversample=4))
    voxel_vol = (2.0 / 4) ** 3
    assert vols.shape == (4, 4, 4, 2)
    assert np.allclose(vols.sum(-1), voxel_vol, atol=1e-5)
    # central 2x2x2 voxels fully inside
    assert np.allclose(vols[1:3, 1:3, 1:3, 0], voxel_vol, atol=1e-3)
    assert np.allclose(vols[0, :, :, 0], 0.0, atol=1e-6)
    # total inside volume = mesh volume
    assert np.isclose(vols[..., 0].sum(), 1.0, atol=1e-2)
