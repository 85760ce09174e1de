"""Hybrid scattering engine (ops/hybrid.py) correctness.

1. Unbiasedness: the hybrid decomposition (analytic unscattered
   transport + MC scattered residual) must match the full wavefront
   analog render in expectation — seeds averaged, total dose within MC
   tolerance (reference behavior: integrators/volume.py:199-263).
2. Adjoint consistency: pattern_grad must equal jax.grad through
   render_vol at the same seed (the explicit adjoint is the same
   computation without re-running the forward).
"""
import os
import tempfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def scat_scene(tmp_path_factory):
    from drtvam_tpu.models.scene import Scene
    from drtvam_tpu.ops.mesh import make_box_with_hole, save_ply
    mesh = make_box_with_hole((2.0, 2.0, 0.5), 1.0,
                              hole_center_xy=(-1.0, 0.0), segments=49)
    path = str(tmp_path_factory.mktemp("m") / "box_hole.ply")
    save_ply(mesh, path)
    cfg = {
        "vial": {"type": "cylindrical", "r_int": 7, "r_ext": 8,
                 "ior": 1.54,
                 "medium": {"ior": 1.40, "phase": {"type": "rayleigh"},
                            "extinction": 0.1, "albedo": 0.5}},
        "projector": {"type": "collimated", "n_patterns": 16,
                      "resx": 24, "resy": 8, "pixel_size": 5.0 / 24,
                      "motion": "circular", "distance": 20},
        "sensor": {"type": "dda", "scalex": 5, "scaley": 5,
                   "scalez": 1.25,
                   "film": {"type": "vfilm", "resx": 32, "resy": 32,
                            "resz": 16}},
        "target": {"filename": path, "size": 4.0},
        "output": tempfile.gettempdir(),
    }
    scene = Scene(cfg)
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=6, rr_depth=6)
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    n = scene.projector.active_size()
    return scene, static, arr, inv_vol, n


def test_hybrid_eligible(scat_scene):
    from drtvam_tpu.ops.hybrid import hybrid_eligible
    from drtvam_tpu.ops.transport2d import ballistic_eligible
    _, static, *_ = scat_scene
    assert hybrid_eligible(static)
    assert not ballistic_eligible(static)  # scattering: no pure matmul


def test_hybrid_unbiased_vs_wavefront(scat_scene):
    from drtvam_tpu.ops.hybrid import ScatteringEngine
    from drtvam_tpu.ops.render import render
    scene, static, arr, inv_vol, n = scat_scene
    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (n,), jnp.float32, 0.2, 1.0)

    SPP, NSEED = 16, 4
    wf = jax.jit(lambda d, s: render(static, arr, d, inv_vol, seed=s,
                                     spp=SPP, chunk=1 << 15))
    vol_wf = sum(np.asarray(wf(data, jnp.uint32(s)))
                 for s in range(NSEED)) / NSEED

    eng = ScatteringEngine(static, arr, spp=SPP, chunk=1 << 15)
    ep = eng.params()
    hb = jax.jit(lambda d, p, s: eng.render_vol(d, inv_vol, seed=s,
                                                params=p))
    vol_hb = sum(np.asarray(hb(data, ep, jnp.uint32(100 + s)))
                 for s in range(NSEED)) / NSEED

    # total and per-z-slab dose agree within MC tolerance
    assert abs(vol_wf.sum() - vol_hb.sum()) / vol_wf.sum() < 0.01
    zw = vol_wf[..., 0].sum(axis=(1, 2))
    zh = vol_hb[..., 0].sum(axis=(1, 2))
    np.testing.assert_allclose(zh, zw, rtol=0.05)


@pytest.mark.parametrize("estimator", ["dda", "delta", "ratio"])
def test_hybrid_pattern_grad_matches_autodiff(scat_scene, estimator):
    from drtvam_tpu.ops.hybrid import ScatteringEngine
    scene, static, arr, inv_vol, n = scat_scene
    eng = ScatteringEngine(static, arr, spp=2, chunk=1 << 15,
                           estimator=estimator)
    ep = eng.params()
    data = jnp.linspace(0.2, 1.0, n, dtype=jnp.float32)
    w = jnp.asarray(
        np.random.default_rng(1).uniform(
            0, 1, (16, 32, 32, 1)).astype(np.float32))
    seed = jnp.uint32(3)

    g_auto = jax.grad(lambda d: jnp.vdot(
        eng.render_vol(d, inv_vol, seed=seed, params=ep), w))(data)
    g_expl = eng.pattern_grad(w, inv_vol, seed=seed, params=ep)
    np.testing.assert_allclose(np.asarray(g_expl), np.asarray(g_auto),
                               rtol=1e-5, atol=1e-6 * float(
                                   jnp.abs(g_auto).max()))


def test_fast_residual_matches_general_bitwise(scat_scene):
    """The specialized convex-medium event loop (march._fast_residual_loop)
    draws RNG in the general march's per-iteration order, so at the SAME
    seed it must replay the exact same trajectories: primal renders and
    adjoint gradients agree bitwise, not just in expectation."""
    import dataclasses
    from drtvam_tpu.ops.render import render, render_raw
    from drtvam_tpu.ops.transport2d import strip_target, build_chords
    from drtvam_tpu.ops.march import fast_residual_eligible
    scene, static, arr, inv_vol, n = scat_scene
    assert fast_residual_eligible(static)
    sensor = dataclasses.replace(static.sensor, estimator="delta")
    st_gen = dataclasses.replace(static, scattered_only=True,
                                 first_scatter=True, sensor=sensor)
    st_fast = dataclasses.replace(st_gen, fast_residual=True)
    st2, arr2 = strip_target(st_gen, arr)
    co, cd, cL, camp = jax.jit(build_chords,
                               static_argnums=(0, 2))(st2, arr2)
    arrB = dict(arr)
    arrB["chord_o"], arrB["chord_d"] = co, cd
    arrB["chord_L"], arrB["chord_amp"] = cL, camp
    data = jnp.linspace(0.2, 1.0, n, dtype=jnp.float32)
    for seed in (3, 11):
        a = np.asarray(render(st_gen, arrB, data, inv_vol, seed=seed,
                              spp=4, chunk=1 << 15))
        b = np.asarray(render(st_fast, arrB, data, inv_vol, seed=seed,
                              spp=4, chunk=1 << 15))
        np.testing.assert_array_equal(a, b)
    w = jnp.asarray(np.random.default_rng(5).uniform(
        0, 1, (16, 32, 32, 1)).astype(np.float32))
    ga = jax.grad(lambda p: jnp.vdot(
        render(st_gen, arrB, p, inv_vol, seed=7, spp=2,
               chunk=1 << 15), w))(data)
    gb = jax.grad(lambda p: jnp.vdot(
        render(st_fast, arrB, p, inv_vol, seed=7, spp=2,
               chunk=1 << 15), w))(data)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
