"""Exact loss values + hand-computed gradients, mirroring the
reference's tests/test_loss.py."""
import jax
import jax.numpy as jnp
import numpy as np

from drtvam_tpu.opt.loss import L2Loss, ThresholdedLoss


def grad_wrt_pred(loss_fn, pred, target, patterns):
    return jax.grad(lambda p: loss_fn(p, target, patterns))(pred)


def test_l2():
    target = jnp.asarray([1, 1, 0, 0], jnp.float32).reshape(2, 2, 1)

    loss_fn = L2Loss({"reduction": "sum"})
    pred = jnp.asarray([1, 2, 3, 4], jnp.float32).reshape(2, 2, 1)
    loss = loss_fn(pred, target, 0 * target)
    assert loss == 26
    g = grad_wrt_pred(loss_fn, pred, target, 0 * target)
    assert np.allclose(g.ravel(), [0, 2, 6, 8])

    loss_fn = L2Loss({"reduction": "mean"})
    loss = loss_fn(pred, target, 0 * target)
    assert loss == 6.5
    g = grad_wrt_pred(loss_fn, pred, target, 0 * target)
    assert np.allclose(g.ravel(), [0, 0.5, 1.5, 2])

    # grayscale target
    loss_fn = L2Loss({"reduction": "sum"})
    target = jnp.asarray([0.2, 0.8, 0.5, 0.0]).reshape(2, 2, 1)
    pred = jnp.ones((2, 2, 1), jnp.float32)
    loss = loss_fn(pred, target, 0 * target)
    assert np.allclose(loss, 0.8**2 + 0.2**2 + 0.5**2 + 1.0)
    g = grad_wrt_pred(loss_fn, pred, target, 0 * target)
    assert np.allclose(g.ravel(), [1.6, 0.4, 1.0, 2.0])

    # surface-aware
    target = jnp.asarray([0.2, 0.8]).reshape(1, 1, 2)
    pred = jnp.asarray([0.4, 0.3]).reshape(1, 1, 2)
    loss = loss_fn(pred, target, 0 * target)
    assert np.allclose(loss, 0.2 * 0.6**2 + 0.8 * 0.3**2)
    g = grad_wrt_pred(loss_fn, pred, target, 0 * target)
    assert np.allclose(g.ravel(), [-2 * 0.2 * 0.6, 2 * 0.8 * 0.3])


def test_thresholded():
    target = jnp.asarray([1, 1, 0, 0], jnp.float32).reshape(2, 2)

    loss_fn = ThresholdedLoss(
        {"K": 2, "tl": 0.9, "tu": 0.95, "reduction": "sum"})
    pred = jnp.asarray([0.5, 0.97, 0.92, 0.5]).reshape(2, 2, 1)
    loss = loss_fn(pred, target, 0 * target)
    assert np.allclose(loss, 0.45**2 + 0.02**2)
    g = grad_wrt_pred(loss_fn, pred, target, 0 * target)
    assert np.allclose(g.ravel(), [-0.9, 0.0, 0.04, 0.0])

    loss_fn = ThresholdedLoss(
        {"K": 2, "tl": 0.9, "tu": 0.95, "reduction": "mean"})
    loss = loss_fn(pred, target, 0 * target)
    assert np.allclose(loss, (0.45**2 + 0.02**2) / 4)
    g = grad_wrt_pred(loss_fn, pred, target, 0 * target)
    assert np.allclose(g.ravel(), [-0.225, 0.0, 0.01, 0.0])

    loss_fn = ThresholdedLoss(
        {"K": 1, "tl": 0.9, "tu": 0.95, "reduction": "sum"})
    pred = jnp.asarray([0.5, 1.1, 0.92, 0.5]).reshape(2, 2, 1)
    loss = loss_fn(pred, target, 0 * target)
    assert np.allclose(loss, 0.57, atol=1e-6)
    g = grad_wrt_pred(loss_fn, pred, target, 0 * target)
    assert np.allclose(g.ravel(), [-1, 1.0, 1.0, 0.0])

    loss_fn = ThresholdedLoss(
        {"K": 2, "tl": 0.4, "tu": 0.95, "reduction": "sum"})
    pred = jnp.asarray([0.5, 0.97, 0.92, 0.5]).reshape(2, 2, 1)
    loss = loss_fn(pred, target, 0 * target)
    assert np.allclose(loss, 0.45**2 + 0.52**2 + 0.1**2)
    g = grad_wrt_pred(loss_fn, pred, target, 0 * target)
    assert np.allclose(g.ravel(), [-0.9, 0.0, 1.04, 0.2])

    loss_fn = ThresholdedLoss(
        {"K": 2, "tl": 0.9, "tu": 0.99, "reduction": "sum"})
    loss = loss_fn(pred, target, 0 * target)
    assert np.allclose(loss, 0.49**2 + 0.02**2 + 0.02**2)
    g = grad_wrt_pred(loss_fn, pred, target, 0 * target)
    assert np.allclose(g.ravel(), [-0.98, -0.04, 0.04, 0.0])

    # surface-aware
    loss_fn = ThresholdedLoss(
        {"K": 2, "tl": 0.9, "tu": 0.95, "reduction": "sum"})
    target = jnp.asarray([0.2, 0.8, 2, 2], jnp.float32).reshape(2, 1, 2)
    pred = jnp.asarray([0.2, 0.1, 0.96, 0.92]).reshape(2, 1, 2)
    loss = loss_fn(pred, target, 0 * target)
    assert np.allclose(loss, 0.2 * 0.75**2 + 0.5 * 0.02**2)
    g = grad_wrt_pred(loss_fn, pred, target, 0 * target)
    assert np.allclose(
        g.ravel(), [-2 * 0.2 * 0.75, 0.0, 0.0, 2 * 0.5 * 0.02])
