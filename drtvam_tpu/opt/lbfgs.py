"""L-BFGS pattern optimizers (reference: src/drtvam/lbfgs.py).

Two variants over a single flat parameter vector (the reference only
ever optimizes `projector.active_data`):

  * `LBFGS` — classic two-loop recursion + backtracking line search
    re-evaluating `line_search_fn` (Armijo, optionally full Wolfe)
    (lbfgs.py:5-143).
  * `LinearLBFGS` — exploits that the dose is exactly LINEAR in the
    patterns: one extra render of the *search direction* gives
    dvol = render(dir), and the line search only re-evaluates the loss
    on `vol + alpha * dvol` — no re-renders (lbfgs.py:146-275,
    docs plugin_reference/optimizer.rst:80-94). Armijo with c1 = 1e-4,
    alpha halving, `search_it` trials.

Reference quirk preserved: during the LinearLBFGS line search the loss's
pattern-sparsity term is evaluated on the SEARCH DIRECTION, not on the
candidate patterns (lbfgs.py:239-246,260 passes `params[...]`, which
holds the direction). History state lives on device; the line-search
control flow syncs one scalar per trial.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class _LBFGSHistory:
    """Shared two-loop recursion state (lbfgs.py:33-94,213-234)."""

    def __init__(self, m=5):
        self.m = m
        self.s = []
        self.y = []
        self.ys = []
        self.t = 0
        self.p_old = None
        self.g_old = None

    def update_history(self, p, g):
        p = jnp.ravel(p)
        g = jnp.ravel(g)
        if self.t > 0:
            s = p - self.p_old
            y = g - self.g_old
            ys = float(jnp.dot(y, s))
            # Curvature safeguard (the reference divides by ys unguarded,
            # lbfgs.py:81 — safe there only because MC jitter keeps
            # gradients noisy; our deterministic renders can converge to
            # ys ~ 0, which would poison the recursion with inf/NaN).
            norm = float(jnp.linalg.norm(y)) * float(jnp.linalg.norm(s))
            if np.isfinite(ys) and ys > 1e-10 * max(norm, 1e-30):
                self.s.append(s)
                self.y.append(y)
                self.ys.append(jnp.asarray(ys, jnp.float32))
                if len(self.s) > self.m:
                    self.s.pop(0)
                    self.y.pop(0)
                    self.ys.pop(0)
        self.p_old = p
        self.g_old = g
        self.t += 1

    # -- checkpointing (no reference equivalent: the reference never
    # persists optimizer state, SURVEY.md §5) --------------------------

    def state_dict(self):
        """Numpy snapshot of the two-loop recursion history."""
        d = {"t": np.int64(self.t), "m": np.int64(self.m),
             "n_hist": np.int64(len(self.s))}
        for i in range(len(self.s)):
            d[f"s_{i}"] = np.asarray(self.s[i])
            d[f"y_{i}"] = np.asarray(self.y[i])
            d[f"ys_{i}"] = np.asarray(self.ys[i])
        if self.p_old is not None:
            d["p_old"] = np.asarray(self.p_old)
            d["g_old"] = np.asarray(self.g_old)
        return d

    def load_state_dict(self, d):
        self.t = int(d["t"])
        self.m = int(d["m"])
        n = int(d["n_hist"])
        self.s = [jnp.asarray(d[f"s_{i}"]) for i in range(n)]
        self.y = [jnp.asarray(d[f"y_{i}"]) for i in range(n)]
        self.ys = [jnp.asarray(d[f"ys_{i}"]) for i in range(n)]
        self.p_old = jnp.asarray(d["p_old"]) if "p_old" in d else None
        self.g_old = jnp.asarray(d["g_old"]) if "g_old" in d else None

    def search_direction(self, g):
        q = jnp.ravel(g)
        alphas = []
        for i in range(len(self.s) - 1, -1, -1):
            a = jnp.dot(self.s[i], q) / self.ys[i]
            q = q - a * self.y[i]
            alphas.insert(0, a)
        gamma = 1.0 if not self.s else \
            self.ys[-1] / jnp.maximum(jnp.dot(self.y[-1], self.y[-1]),
                                      1e-30)
        z = gamma * q
        for i in range(len(self.s)):
            b = jnp.dot(self.y[i], z) / self.ys[i]
            z = z + (alphas[i] - b) * self.s[i]
        return -z


class LBFGS(_LBFGSHistory):
    """General L-BFGS with backtracking line search (lbfgs.py:5-143).

    `line_search_fn(p) -> loss` is re-evaluated per trial; with
    `wolfe=True` its gradient too (via jax.grad, supplied by caller as
    `line_search_grad_fn`)."""

    def __init__(self, line_search_fn, m=5, wolfe=False, search_it=20,
                 line_search_grad_fn=None):
        super().__init__(m)
        self.line_search_fn = line_search_fn
        self.line_search_grad_fn = line_search_grad_fn
        self.wolfe = wolfe
        self.search_it = search_it

    def step(self, p, g, f):
        self.update_history(p, g)
        z = self.search_direction(g)
        c1, c2 = 1e-4, 0.9
        g_dot_z = float(jnp.dot(self.g_old, z))
        alpha = 1.0
        for _ in range(self.search_it):
            cand = p + alpha * z
            f_new = float(self.line_search_fn(cand))
            armijo = f_new <= float(f) + c1 * alpha * g_dot_z
            if self.wolfe:
                g_new = self.line_search_grad_fn(cand)
                wolfe2 = float(jnp.dot(jnp.ravel(g_new), z)) >= c2 * g_dot_z
                if armijo and wolfe2:
                    break
            elif armijo:
                break
            alpha *= 0.5
        return p + alpha * z


class LinearLBFGS(_LBFGSHistory):
    """Linearity-exploiting L-BFGS (lbfgs.py:146-275).

    render_fn(direction) -> dvol renders the search direction once;
    loss_fn(vol, patterns) -> scalar evaluates the loss (with the
    sparsity term on `patterns`)."""

    def __init__(self, render_fn, loss_fn, m=5, search_it=20,
                 candidate_fn=None):
        super().__init__(m)
        self.render_fn = render_fn
        self.loss_fn = loss_fn
        # optional fused evaluator (vol, dvol, alpha, dir) -> loss: lets
        # callers jit `loss(vol + alpha*dvol)` as ONE kernel instead of
        # an eager volume add + a separate loss pass per trial
        self.candidate_fn = candidate_fn
        self.search_it = search_it
        self.last_alpha = None

    def step(self, p, g, vol, loss):
        """One optimizer step; returns the updated parameter vector."""
        self.update_history(p, g)
        z = self.search_direction(g)

        dvol = self.render_fn(z)  # ONE extra render (lbfgs.py:248)
        g_dot_z = float(jnp.dot(self.g_old, z))
        c1 = 1e-4
        alpha = 1.0
        loss = float(loss)
        for _ in range(self.search_it):
            if self.candidate_fn is not None:
                f_new = float(self.candidate_fn(vol, dvol, alpha, z))
            else:
                f_new = float(self.loss_fn(vol + alpha * dvol, z))
            if f_new <= loss + c1 * alpha * g_dot_z:
                break
            alpha *= 0.5
        self.last_alpha = alpha
        return p + alpha * z
