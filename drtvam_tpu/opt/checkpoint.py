"""Optional step checkpointing of the optimization state.

The reference has no checkpoint/resume: its only recoverable state is
the final `patterns.npz` (SURVEY.md §5; reference optimize.py:240-243
re-projects saved patterns with --forward_mode). Here a single
`checkpoint.npz` in the output directory captures everything needed to
continue an interrupted optimization exactly: step index, the sparse
pattern state (active_data + active_pixels), loss/timing history, and
the optimizer state (L-BFGS two-loop history, or the optax pytree for
adam/sgd).

Config: `"checkpoint_every": N` saves every N steps (plus on the final
step); `"resume": true` restores it and continues. Because per-step
RNG seeds are the step index, a resumed run retraces the remaining
steps exactly as the uninterrupted run would.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def save_checkpoint(output, step, data, active_pixels, loss_hist,
                    timing_hist, optim_type, opt=None, opt_state=None,
                    med_params=None, med_state=None):
    """Atomically write `checkpoint.npz` into the output directory."""
    d = {
        "step": np.int64(step),
        "active_data": np.asarray(data),
        "active_pixels": np.asarray(active_pixels),
        "loss_hist": np.asarray(loss_hist),
        "timing_hist": np.asarray(timing_hist),
        "optim_type": np.bytes_(optim_type.encode()),
    }
    if optim_type == "lbfgs" and opt is not None:
        for k, v in opt.state_dict().items():
            d[f"opt_{k}"] = v
    elif opt_state is not None:
        leaves = jax.tree_util.tree_leaves(opt_state)
        d["opt_n_leaves"] = np.int64(len(leaves))
        for i, leaf in enumerate(leaves):
            d[f"opt_leaf_{i}"] = np.asarray(leaf)
    if med_params is not None:
        # calibrated medium state: without it a resumed optimize_medium
        # run would silently reset sigma_t/albedo to the config values
        d["med_st"] = np.asarray(med_params["st"])
        d["med_al"] = np.asarray(med_params["al"])
        leaves = jax.tree_util.tree_leaves(med_state)
        d["med_n_leaves"] = np.int64(len(leaves))
        for i, leaf in enumerate(leaves):
            d[f"med_leaf_{i}"] = np.asarray(leaf)
    path = os.path.join(output, "checkpoint.npz")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **d)
    os.replace(tmp, path)


def load_checkpoint(output):
    """Return the checkpoint dict, or None if absent/unreadable."""
    path = os.path.join(output, "checkpoint.npz")
    if not os.path.exists(path):
        return None
    return dict(np.load(path, allow_pickle=False))


def restore_opt_state(ckpt, optim_type, opt=None, opt_state=None):
    """Restore optimizer state in place (lbfgs) or by reconstruction
    (optax pytrees, restored leaf-for-leaf into the template state)."""
    saved_type = bytes(ckpt["optim_type"]).decode()
    if saved_type != optim_type:
        raise ValueError(
            f"Checkpoint was written by optimizer '{saved_type}', "
            f"config now requests '{optim_type}'.")
    if optim_type == "lbfgs":
        opt.load_state_dict(
            {k[4:]: v for k, v in ckpt.items() if k.startswith("opt_")})
        return None
    n = int(ckpt["opt_n_leaves"])
    leaves = [jnp.asarray(ckpt[f"opt_leaf_{i}"]) for i in range(n)]
    treedef = jax.tree_util.tree_structure(opt_state)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def restore_med_state(ckpt, med_state):
    """Return (med_params, med_state) from the checkpoint, or None if it
    predates / never had medium calibration."""
    if "med_st" not in ckpt:
        return None
    med_params = {"st": jnp.asarray(ckpt["med_st"]),
                  "al": jnp.asarray(ckpt["med_al"])}
    n = int(ckpt["med_n_leaves"])
    leaves = [jnp.asarray(ckpt[f"med_leaf_{i}"]) for i in range(n)]
    treedef = jax.tree_util.tree_structure(med_state)
    return med_params, jax.tree_util.tree_unflatten(treedef, leaves)
