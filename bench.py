"""Headline benchmark: the reference README workload class
(README.md:110-135) — cylindrical vial with refraction, 400 angles,
400x400 DMD @ 25 um, 40 Linear-L-BFGS iterations, 256^3 dose grid —
on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": x}
vs_baseline is the L40S wall-clock for the same workload class
(cylindrical 1 rpp: 23 s, README.md:131) divided by ours (> 1 == we
beat the L40S). The timed region covers the full optimization loop
(primal render + loss + adjoint + L-BFGS direction render + line
search + clamp, 40 iterations) plus the one-time transport-field
precompute; jit compilation is excluded via a 2-iteration warm-up
(the reference's own numbers amortize Dr.Jit's kernel cache the same
way across its 40 iterations).
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__),
                                   ".jax_cache"))

import jax
import jax.numpy as jnp

L40S_BASELINE_S = 23.0  # README.md:131, cylindrical 1 ray/pixel

N_ANGLES = 400
DMD = 400
FILM = 256
N_STEPS = 40


def build():
    from drtvam_tpu.models.scene import Scene
    from drtvam_tpu.ops.mesh import make_box_with_hole, save_ply

    mesh_path = "/tmp/bench_target.ply"
    if not os.path.exists(mesh_path):
        save_ply(make_box_with_hole((2.0, 2.0, 1.0), 0.6,
                                    hole_center_xy=(-0.8, 0.0),
                                    segments=99), mesh_path)
    cfg = {
        "vial": {"type": "cylindrical", "r_int": 7.0, "r_ext": 7.5,
                 "ior": 1.54,
                 "medium": {"ior": 1.40, "phase": {"type": "rayleigh"},
                            "extinction": 0.05, "albedo": 0.0}},
        "projector": {"type": "collimated", "n_patterns": N_ANGLES,
                      "resx": DMD, "resy": DMD, "pixel_size": 25e-3,
                      "motion": "circular", "distance": 30},
        "sensor": {"type": "dda", "scalex": 10, "scaley": 10,
                   "scalez": 10,
                   "film": {"type": "vfilm", "resx": FILM, "resy": FILM,
                            "resz": FILM}},
        "target": {"filename": mesh_path, "size": 10.0},
        "output": "/tmp",
    }
    return Scene(cfg)


def main():
    from drtvam_tpu.opt.optimize import _make_step_fns
    from drtvam_tpu.opt.loss import ThresholdedLoss
    from drtvam_tpu.opt.lbfgs import LinearLBFGS
    from drtvam_tpu.ops.render import default_chunk

    t_setup = time.time()
    scene = build()
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=6, rr_depth=6)
    target = jnp.asarray(scene.sensor.discretize(scene.target_bank()))
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    loss_obj = ThresholdedLoss({"tl": 0.9, "tu": 0.95})
    n = scene.projector.active_size()
    print(f"# setup (scene+discretize): {time.time() - t_setup:.1f}s; "
          f"lanes/render = {n}", file=sys.stderr)

    def run(n_steps, tag):
        t0 = time.time()
        primal, adjoint, dir_render, ls_loss = _make_step_fns(
            static, arr, inv_vol, 1, 1, default_chunk(), loss_obj,
            target, engine="auto")
        opt = LinearLBFGS(
            render_fn=lambda z: jax.block_until_ready(
                dir_render(z, jnp.uint32(0))),
            loss_fn=ls_loss)
        data = jnp.ones((n,), jnp.float32)
        losses = []
        for i in range(n_steps):
            seed = jnp.uint32(i)
            vol, loss = jax.block_until_ready(primal(data, seed))
            grad = jax.block_until_ready(adjoint(vol, data, seed))
            if float(loss) == 0.0:
                losses.append(float(loss))
                break
            data = opt.step(data, grad, vol, loss)
            data = jax.block_until_ready(jnp.maximum(data, 0.0))
            losses.append(float(loss))
        dt = time.time() - t0
        print(f"# {tag}: {dt:.2f}s for {len(losses)} iters, "
              f"loss {losses[0]:.3e} -> {losses[-1]:.3e}",
              file=sys.stderr)
        return dt

    run(2, "warmup (incl. jit compile + transport build)")
    wall = run(N_STEPS, f"benchmark {N_ANGLES} angles x {DMD}^2 DMD x "
               f"{FILM}^3 film x {N_STEPS} L-BFGS iters")

    print(json.dumps({
        "metric": f"benchy-class cylindrical {N_ANGLES} angles "
                  f"{DMD}x{DMD} DMD 1rpp {FILM}^3 film "
                  f"{N_STEPS}-iter LinearLBFGS wall-clock (1 TPU chip)",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(L40S_BASELINE_S / wall, 3),
    }))


if __name__ == "__main__":
    main()
