"""Headline benchmark: the reference README workload class
(README.md:110-135) — cylindrical vial with refraction, 400 angles,
400x400 DMD @ 25 um, 40 Linear-L-BFGS iterations, 256^3 dose grid —
on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": x}
vs_baseline = L40S wall-clock for the same workload class (cylindrical
1 rpp: 23 s, README.md:131) / ours (> 1 == faster than the L40S).

The timed value = one-time geometry transport precompute (steady
state, compile-cached) + the full 40-iteration optimization loop
(primal render + loss + adjoint + L-BFGS direction render + line
search + clamp). jit compilation is excluded via warm-up, mirroring
how the reference's numbers amortize Dr.Jit's kernel cache; a
persistent compilation cache under .jax_cache makes reruns cheap.
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

L40S_BASELINE_S = 23.0  # README.md:131, cylindrical 1 ray/pixel

N_ANGLES = 400
DMD = 400
FILM = 256
N_STEPS = 40


def build_scene():
    from drtvam_tpu.models.scene import Scene
    from drtvam_tpu.ops.mesh import make_box_with_hole, save_ply

    mesh_path = "/tmp/bench_target.ply"
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
    from drtvam_tpu.opt.loss import ThresholdedLoss
    from drtvam_tpu.opt.lbfgs import LinearLBFGS
    from drtvam_tpu.ops.ballistic import BallisticEngine

    t0 = time.time()
    scene = build_scene()
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=6, rr_depth=6)
    target = jnp.asarray(scene.sensor.discretize(scene.target_bank()))
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    loss_obj = ThresholdedLoss({"tl": 0.9, "tu": 0.95})
    n = scene.projector.active_size()
    jax.block_until_ready(target)
    print(f"# scene+discretize: {time.time() - t0:.1f}s; "
          f"rays/render = {n}", file=sys.stderr)

    t0 = time.time()
    eng = BallisticEngine(static, arr)
    jax.block_until_ready(eng.W)
    print(f"# transport precompute (cold): {time.time() - t0:.1f}s",
          file=sys.stderr)

    # Big arrays (transport fields, target) ride as jit ARGUMENTS — as
    # closure constants they are baked into the HLO, which bloats the
    # executable and can exceed remote-compile payload limits.
    ep = eng.params()

    @jax.jit
    def primal_j(data, ep, tgt):
        vol = eng.render_vol(data, inv_vol, params=ep)
        return vol, loss_obj(vol, tgt, data)

    @jax.jit
    def adjoint_j(vol, data, ep, tgt):
        dvol, dpat = jax.grad(
            lambda v, p: loss_obj(v, tgt, p), argnums=(0, 1))(vol, data)
        return eng.pattern_grad(dvol, inv_vol, params=ep) + dpat

    @jax.jit
    def dir_render_j(data, ep):
        return eng.render_vol(data, inv_vol, params=ep)

    @jax.jit
    def ls_loss_j(vol, pats, tgt):
        return loss_obj(vol, tgt, pats)

    @jax.jit
    def ls_cand_j(vol, dvol, alpha, pats, tgt):
        return loss_obj(vol + alpha * dvol, tgt, pats)

    primal = lambda data: primal_j(data, ep, target)
    adjoint = lambda vol, data: adjoint_j(vol, data, ep, target)
    dir_render = lambda data: dir_render_j(data, ep)
    ls_loss = lambda vol, pats: ls_loss_j(vol, pats, target)
    ls_cand = lambda vol, dvol, a, z: ls_cand_j(vol, dvol,
                                                jnp.float32(a), z, target)

    def loop(n_steps):
        opt = LinearLBFGS(
            render_fn=lambda z: jax.block_until_ready(dir_render(z)),
            loss_fn=ls_loss, candidate_fn=ls_cand)
        data = jnp.ones((n,), jnp.float32)
        losses = []
        for _ in range(n_steps):
            vol, loss = jax.block_until_ready(primal(data))
            grad = jax.block_until_ready(adjoint(vol, data))
            losses.append(float(loss))
            if losses[-1] == 0.0:
                break
            data = opt.step(data, grad, vol, loss)
            data = jax.block_until_ready(jnp.maximum(data, 0.0))
        return losses

    t0 = time.time()
    loop(2)
    print(f"# warmup (jit compile): {time.time() - t0:.1f}s",
          file=sys.stderr)

    # steady-state geometry precompute (compile-cached)
    t0 = time.time()
    eng2 = BallisticEngine(static, arr)
    jax.block_until_ready(eng2.W)
    t_build = time.time() - t0

    t0 = time.time()
    losses = loop(N_STEPS)
    t_loop = time.time() - t0
    wall = t_build + t_loop
    print(f"# precompute {t_build:.2f}s + {len(losses)}-iter loop "
          f"{t_loop:.2f}s; loss {losses[0]:.3e} -> {losses[-1]:.3e}",
          file=sys.stderr)

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
