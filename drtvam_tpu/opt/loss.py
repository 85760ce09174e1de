"""Dose-volume objectives.

Functional parity with the reference's loss module (src/drtvam/loss.py
for the math: thresholded dose penalty per Wechsler et al. 2024, plain
L2, pattern-sparsity term, sum/mean reduction) re-organized for this
framework: the target-layout dispatch is a free function over pure jnp
term functions, and each objective is a small config record exposing
`object_term` / `void_term` / `sparsity_term`.

Two target layouts are accepted:
  * one channel — binary or grayscale occupancy; voxels with
    target > 0 are scored by `object_term`, the rest by `void_term`;
  * two channels — surface-aware: target holds per-voxel (inside,
    outside) fractional volumes and the dose tensor carries the dose
    integrated on each side of the target surface; each side is scored
    by its own term and weighted by the normalized fractional volume.

Config keys and default values are the drop-in contract with reference
JSON files and are pinned by tests/test_loss.py (exact values AND
gradients). Everything here is plain differentiable jnp: the dose
cotangent produced by jax.grad flows into the renderer's custom_vjp.
"""
from __future__ import annotations

import jax.numpy as jnp

losses = {}


def register_loss(name, cls):
    losses[name] = cls


def _pos(x):
    """max(x, 0), kept as a named helper so term formulas read like the
    paper's relu(.)^K notation."""
    return jnp.maximum(x, 0.0)


def evaluate(objective, dose, target, patterns):
    """Reduce an objective over a dose volume.

    dose: (..., C) with C in {1, 2}; target: same trailing channel
    count (a missing channel axis on the target is added when the dose
    has a singleton one). Returns reduced(voxel terms) +
    reduced(pattern sparsity term).
    """
    dose = jnp.asarray(dose)
    target = jnp.asarray(target)
    if dose.shape != target.shape:
        if dose.ndim == target.ndim + 1 and dose.shape[-1] == 1:
            target = target[..., None]
        else:
            raise ValueError(
                f"dose volume {dose.shape} and target {target.shape} are "
                "not broadcast-compatible")

    channels = target.shape[-1]
    if channels == 1:
        per_voxel = objective.voxel_term(dose, target)
    elif channels == 2:
        frac = target[..., 0] + target[..., 1]
        per_voxel = (target[..., 0] * objective.object_term(dose[..., 0])
                     + target[..., 1] * objective.void_term(dose[..., 1])
                     ) / frac
    else:
        raise ValueError(
            f"expected a trailing channel axis of 1 (binary) or 2 "
            f"(surface-aware), got target shape {target.shape}")

    reduce_ = objective.reduction
    sparsity = jnp.asarray(objective.sparsity_term(patterns), jnp.float32)
    return reduce_(per_voxel) + reduce_(sparsity)


class Loss:
    """Base objective: reduction handling + the callable contract.

    Subclasses (and user extensions via `register_loss`) provide
    `object_term(dose)`, `void_term(dose)` and `sparsity_term(patterns)`.
    """

    def __init__(self, props):
        reduction = props.get("reduction", "sum")
        try:
            self.reduction = {"sum": jnp.sum, "mean": jnp.mean}[reduction]
        except KeyError:
            raise ValueError(
                f"reduction must be 'sum' or 'mean', got '{reduction}'")

    def object_term(self, dose):
        raise NotImplementedError

    def void_term(self, dose):
        raise NotImplementedError

    def sparsity_term(self, patterns):
        raise NotImplementedError

    def voxel_term(self, dose, target):
        """One-channel (binary / grayscale) scoring; the default routes
        occupied voxels to object_term and empty ones to void_term."""
        return jnp.where(target > 0,
                         self.object_term(dose),
                         self.void_term(dose))

    def __call__(self, dose, target, patterns):
        return evaluate(self, dose, target, patterns)


class L2Loss(Loss):
    """Squared distance of the dose to the binary occupancy (plus the
    optional |p|^M pattern penalty)."""

    def __init__(self, props):
        super().__init__(props)
        self.M = props.get("M", 4)
        self.weight_sparsity = props.get("weight_sparsity", 0)

    def object_term(self, dose):
        return jnp.square(dose - 1.0)

    def void_term(self, dose):
        return jnp.square(dose)

    def voxel_term(self, dose, target):
        # grayscale targets are meaningful for L2: match them directly
        return jnp.square(dose - target)

    def sparsity_term(self, patterns):
        return self.weight_sparsity * patterns ** self.M


class ThresholdedLoss(Loss):
    """Thresholded dose objective (Wechsler et al. 2024):

      w_obj  * max(tu - d, 0)^K    object voxels still below tu
    + w_void * max(d - tl, 0)^K    void voxels already above tl
    + w_lim  * max(d - 1, 0)^K     overpolymerized object voxels
    + w_sp   * |p|^M               pattern sparsity
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
                f"threshold window is empty: tl={self.tl} must lie below "
                f"tu={self.tu}")

    def object_term(self, dose):
        return (self.weight_object * _pos(self.tu - dose) ** self.K
                + self.weight_limit * _pos(dose - 1.0) ** self.K)

    def void_term(self, dose):
        return self.weight_void * _pos(dose - self.tl) ** self.K

    def sparsity_term(self, patterns):
        return self.weight_sparsity * jnp.abs(patterns) ** self.M


register_loss("l2", L2Loss)
register_loss("threshold", ThresholdedLoss)
