"""Dose-volume losses (reference: src/drtvam/loss.py).

A loss maps (dose volume x, target, patterns) to a scalar. Two target
layouts (loss.py:28-50):
  * binary / grayscale: target (..., 1); object voxels (target > 0) are
    scored with `eval_in`, void voxels with `eval_out`;
  * surface-aware: target (..., 2) holds per-voxel (inside, outside)
    fractional volumes; x (..., 2) holds the dose integrated inside /
    outside the target surface; the two channels are scored separately
    and weighted by the normalized fractional volumes.

The pattern-sparsity penalty is reduced separately with the same
reduction, matching loss.py:57-59. Everything is plain jnp and
differentiable end to end — the adjoint dose gradient flows into the
renderer's custom_vjp.
"""
from __future__ import annotations

import jax.numpy as jnp

losses = {}


def register_loss(name, cls):
    losses[name] = cls


def relu(x):
    return jnp.maximum(x, 0.0)


class Loss:
    def __init__(self, props):
        reduction = props.get("reduction", "sum")
        if reduction == "sum":
            self.reduction = jnp.sum
        elif reduction == "mean":
            self.reduction = jnp.mean
        else:
            raise ValueError(f"Invalid reduction method: '{reduction}'.")

    def eval_in(self, x):
        raise NotImplementedError

    def eval_out(self, x):
        raise NotImplementedError

    def eval(self, x, target, patterns):
        raise NotImplementedError

    def eval_sparsity(self, patterns):
        raise NotImplementedError

    def __call__(self, x, target, patterns):
        x = jnp.asarray(x)
        target = jnp.asarray(target)
        if x.shape != target.shape:
            if x.ndim == target.ndim + 1 and x.shape[-1] == 1:
                target = target[..., None]
            else:
                raise ValueError("Input and target shapes do not match: "
                                 f"{x.shape} != {target.shape}")

        if target.shape[-1] == 1:
            loss, loss_patterns = self.eval(x, target, patterns)
        elif target.shape[-1] == 2:
            denom = target[..., 0] + target[..., 1]
            w_in = target[..., 0] / denom
            w_out = target[..., 1] / denom
            loss = w_in * self.eval_in(x[..., 0]) + \
                w_out * self.eval_out(x[..., 1])
            loss_patterns = self.eval_sparsity(patterns)
        else:
            raise ValueError(f"[Loss] Received tensors of invalid shape: "
                             f"{target.shape}. The last dimension should "
                             "be either 1 or 2.")
        return self.reduction(loss) + self.reduction(
            jnp.asarray(loss_patterns, jnp.float32))


class L2Loss(Loss):
    """Plain squared error (reference loss.py:63-79)."""

    def __init__(self, props):
        super().__init__(props)
        self.M = props.get("M", 4)
        self.weight_sparsity = props.get("weight_sparsity", 0)

    def eval_in(self, x):
        return jnp.square(x - 1.0)

    def eval_out(self, x):
        return jnp.square(x)

    def eval(self, x, target, patterns):
        return jnp.square(x - target), 0.0 * patterns

    def eval_sparsity(self, patterns):
        return patterns ** self.M * self.weight_sparsity


class ThresholdedLoss(Loss):
    """Thresholded dose loss, Wechsler et al. 2024 (loss.py:82-132):

      L = w_obj * relu(tu - x)^K      (object voxels below tu)
        + w_void * relu(x - tl)^K     (void voxels above tl)
        + w_limit * relu(x - 1)^K     (overpolymerization, object only)
        + w_sparsity * |patterns|^M
    """

    def __init__(self, props):
        super().__init__(props)
        self.K = props.get("K", 2)
        self.M = props.get("M", 4)
        self.tl = props.get("tl", 0.9)
        self.tu = props.get("tu", 0.95)
        self.weight_object = props.get("weight_object", 1)
        self.weight_void = props.get("weight_void", 1)
        self.weight_limit = props.get("weight_limit", 1)
        self.weight_sparsity = props.get("weight_sparsity", 0)
        if self.tl >= self.tu:
            raise ValueError(
                f"[ThresholdedLoss] Lower threshold ({self.tl}) must be "
                f"smaller than upper threshold ({self.tu})")

    def eval_in(self, x):
        return self.weight_object * relu(self.tu - x) ** self.K + \
            self.weight_limit * relu(x - 1.0) ** self.K

    def eval_out(self, x):
        return self.weight_void * relu(x - self.tl) ** self.K

    def eval_sparsity(self, patterns):
        return jnp.abs(patterns) ** self.M * self.weight_sparsity

    def eval(self, x, target, patterns):
        return jnp.where(target > 0, self.eval_in(x), self.eval_out(x)), \
            self.eval_sparsity(patterns)


register_loss("l2", L2Loss)
register_loss("threshold", ThresholdedLoss)
