"""Medium-parameter gradients (d loss / d sigma_t, d loss / d albedo).

The reference adjoint accumulates st_grad/ss_grad alongside emitter
gradients (volume.py:277-280, sensor.py:180-186): analytic
transmittance and the scattering power are re-expressed in the deposit
with (sigma_t, sigma_s) as leaves while free-flight sampling pdfs stay
detached. Our custom_vjp mirrors that, re-parameterized to this
framework's (sigma_t, albedo) medium leaves.

In the non-scattering DDA case the dose is a closed-form function of
sigma_t along deterministic ray paths, so reverse-AD must match central
finite differences to the reference's gradient bar (< 2e-4 relative,
test_integrators.py:110). In scattering mode the sampled paths
themselves depend on sigma_t and that pdf dependence is (deliberately,
like the reference) not differentiated — there FD and AD agree only up
to the path-sampling term, so we pin sign and magnitude loosely.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from drtvam_tpu.models.scene import Scene
from drtvam_tpu.ops.render import render


def _scene(albedo, estimator, box_hole_mesh, extinction=0.4):
    cfg = {
        "vial": {"type": "cylindrical", "r_int": 2.0, "r_ext": 2.3,
                 "ior": 1.54,
                 "medium": {"ior": 1.4, "extinction": extinction,
                            "albedo": albedo,
                            "phase": {"type": "rayleigh"}}},
        "projector": {"type": "collimated", "n_patterns": 6, "resx": 16,
                      "resy": 8, "pixel_size": 0.2,
                      "motion": "circular", "distance": 10},
        "sensor": {"type": estimator, "scalex": 2.5, "scaley": 2.5,
                   "scalez": 1.2, "majorant": 2.0 * extinction,
                   "film": {"type": "vfilm", "resx": 16, "resy": 16,
                            "resz": 8}},
        "target": {"filename": box_hole_mesh, "size": 1.5},
        "output": "/tmp",
    }
    return Scene(cfg)


def _loss_of_sigma(scene, estimator, spp=2, medium_grads=True):
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=6, rr_depth=6)
    import dataclasses
    static = dataclasses.replace(static, medium_grads=medium_grads)
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    n = scene.projector.active_size()
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(0.5, 1.5, n).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.0, 1.0,
                                scene.sensor.static.shape).astype(
                                    np.float32))

    def loss(sigma_t, albedo):
        arr2 = dict(arr)
        arr2["sigma_t"] = sigma_t
        arr2["albedo"] = albedo
        vol = render(static, arr2, data, inv_vol, seed=0, spp=spp,
                     chunk=1 << 14)
        return jnp.sum(vol * w)

    return jax.jit(loss)


def test_dda_sigma_t_matches_fd(box_hole_mesh):
    """Pure absorption, DDA: deterministic paths, analytic deposits —
    the strict reference bar applies (rel err < 2e-4)."""
    scene = _scene(0.0, "dda", box_hole_mesh)
    loss = _loss_of_sigma(scene, "dda", spp=1)
    st0 = jnp.float32(0.4)
    al0 = jnp.float32(0.0)
    g = jax.grad(loss, argnums=0)(st0, al0)
    h = 1e-3
    fd = (loss(st0 + h, al0) - loss(st0 - h, al0)) / (2 * h)
    rel = abs(float(g) - float(fd)) / max(abs(float(fd)), 1e-12)
    assert rel < 2e-4, (float(g), float(fd), rel)


def test_dda_sigma_t_zero_when_disabled(box_hole_mesh):
    scene = _scene(0.0, "dda", box_hole_mesh)
    loss = _loss_of_sigma(scene, "dda", spp=1, medium_grads=False)
    g = jax.grad(loss, argnums=0)(jnp.float32(0.4), jnp.float32(0.0))
    assert float(g) == 0.0


@pytest.mark.parametrize("estimator", ["dda", "ratio", "delta"])
def test_scattering_grads_match_fd(estimator, box_hole_mesh):
    """Scattering (albedo 0.5): the adjoint differentiates the deposit
    expression with sampling detached (reference semantics). With the
    same seed, FD shares the sampled uniforms, so the only FD-vs-AD gap
    is the sampled-path dependence on sigma_t — small at these optical
    depths. Pin both gradients loosely; albedo gradients don't move the
    sampling at fixed sigma_t free-flight draws in DDA."""
    scene = _scene(0.5, estimator, box_hole_mesh)
    loss = _loss_of_sigma(scene, estimator, spp=8)
    st0 = jnp.float32(0.4)
    al0 = jnp.float32(0.5)
    g_st = float(jax.grad(loss, argnums=0)(st0, al0))
    g_al = float(jax.grad(loss, argnums=1)(st0, al0))
    h = 2e-3
    fd_st = float((loss(st0 + h, al0) - loss(st0 - h, al0)) / (2 * h))
    fd_al = float((loss(st0, al0 + h) - loss(st0, al0 - h)) / (2 * h))
    assert g_st != 0.0 and g_al != 0.0
    assert np.sign(g_st) == np.sign(fd_st), (g_st, fd_st)
    assert np.sign(g_al) == np.sign(fd_al), (g_al, fd_al)
    # delta deposits AT the sampled point: its FD moves every deposit
    # voxel with sigma_t, a term the reference semantics drop entirely
    # (sensor.py:172's own bias caveat) — only same order of magnitude
    # is meaningful there
    tol = 1.2 if estimator == "delta" else 0.25
    assert abs(g_st - fd_st) <= tol * max(abs(fd_st), 1e-9), \
        (g_st, fd_st)
    assert abs(g_al - fd_al) <= tol * max(abs(fd_al), 1e-9), \
        (g_al, fd_al)


def test_pattern_grads_unchanged_by_medium_grads(box_hole_mesh):
    """Enabling medium gradients must not perturb pattern gradients."""
    scene = _scene(0.0, "dda", box_hole_mesh)
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=6, rr_depth=6)
    import dataclasses
    static_on = dataclasses.replace(static, medium_grads=True)
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    n = scene.projector.active_size()
    data = jnp.ones((n,), jnp.float32)

    def lossf(st, d):
        def f(dd):
            vol = render(st, arr, dd, inv_vol, seed=0, spp=1,
                         chunk=1 << 14)
            return jnp.sum(vol ** 2)
        return jax.grad(f)(d)

    g_off = np.asarray(lossf(static, data))
    g_on = np.asarray(lossf(static_on, data))
    np.testing.assert_allclose(g_on, g_off, rtol=1e-6)
