"""Headline benchmark: the reference README workload class
(README.md:110-135) — cylindrical vial with refraction, 400 angles,
400x400 DMD @ 25 um, 40 Linear-L-BFGS iterations, 256^3 dose grid —
on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": x}
vs_baseline = L40S wall-clock for the same workload class (cylindrical
1 rpp: 23 s, README.md:131) / ours (> 1 == faster than the L40S).

The timed value covers the full user-visible pipeline minus jit
compilation: scene assembly + target voxelization (native host
voxelizer), the geometry transport precompute (native host rasterizer
+ one device upload), and the entire 40-iteration optimization —
which runs as ONE on-device dispatch (opt/device_lbfgs.py): primal
render, adjoint, L-BFGS direction render, Armijo line search, clamp,
convergence break, all inside a single jitted while_loop. jit compile
is excluded via warm-up, mirroring how the reference's numbers
amortize Dr.Jit's kernel cache; a persistent compilation cache under
.jax_cache makes reruns cheap. Every phase is printed so nothing
hides: there are no other costs before the first iteration.
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
    from drtvam_tpu.opt.device_lbfgs import fused_linear_lbfgs
    from drtvam_tpu.ops.ballistic import BallisticEngine

    def phase(msg, t0):
        dt = time.time() - t0
        print(f"# {msg}: {dt:.2f}s", file=sys.stderr)
        return dt

    # backend/tunnel handshake: process startup, not workload (the
    # reference numbers likewise exclude CUDA context creation)
    t_all = time.time()
    t0 = time.time()
    jax.block_until_ready(jnp.zeros(()))
    phase("backend init (excluded)", t0)

    # ---- phase 1: scene assembly + target voxelization (host) ----------
    t0 = time.time()
    scene = build_scene()
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=6, rr_depth=6)
    target_np = np.asarray(scene.sensor.discretize(scene.target_bank()))
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    loss_obj = ThresholdedLoss({"tl": 0.9, "tu": 0.95})
    n = scene.projector.active_size()
    t_scene = phase(f"scene+discretize (host), rays/render={n}", t0)

    # ---- phase 2: transport precompute + device upload ------------------
    t0 = time.time()
    eng = BallisticEngine(static, arr)
    target = jnp.asarray(target_np)
    ep = eng.params()
    jax.block_until_ready((eng.W, target))
    t_build = phase("transport precompute + upload (cold)", t0)

    # ---- the fused on-device optimization ---------------------------------
    def make_run(n_steps):
        @jax.jit
        def run(data0, ep, tgt):
            def value_grad(p):
                vol = eng.render_vol(p, inv_vol, params=ep)
                loss = loss_obj(vol, tgt, p)
                dvol, dpat = jax.grad(
                    lambda v, q: loss_obj(v, tgt, q),
                    argnums=(0, 1))(vol, p)
                grad = eng.pattern_grad(dvol, inv_vol, params=ep) + dpat
                return vol, loss, grad

            def dir_render(z):
                return eng.render_vol(z, inv_vol, params=ep)

            def cand(vol, dvol, alpha, z):
                return loss_obj(vol + alpha * dvol, tgt, z)

            return fused_linear_lbfgs(value_grad, dir_render, cand,
                                      data0, n_steps)
        return run

    run = make_run(N_STEPS)
    data0 = jnp.ones((n,), jnp.float32)

    t0 = time.time()
    out = jax.block_until_ready(run(data0, ep, target))
    t_warm = phase("warmup (jit compile + first fused run)", t0)

    # ---- steady state: geometry precompute + fused 40-iter loop ---------
    t0 = time.time()
    eng2 = BallisticEngine(static, arr)
    ep2 = eng2.params()
    jax.block_until_ready(eng2.W)
    t_build2 = phase("transport precompute + upload (steady)", t0)

    t0 = time.time()
    p_fin, loss_hist, n_done = jax.block_until_ready(
        run(data0, ep2, target))
    t_loop = phase(f"fused {int(n_done)}-iter loop (one dispatch)", t0)
    loss_hist = np.asarray(loss_hist)
    print(f"# loss {loss_hist[0]:.3e} -> {loss_hist[int(n_done) - 1]:.3e}",
          file=sys.stderr)

    # quality guard (untimed): best thresholded IoU of the final dose,
    # the reference's print-quality metric (utils.py:48-81); full-size
    # runs must reach ~0.98+ or the speed number is meaningless
    @jax.jit
    def best_iou(p, ep, tgt):
        vol = eng.render_vol(p, inv_vol, params=ep)[..., 0]
        t = tgt[..., 0] > 0.5
        vmax = jnp.maximum(jnp.max(vol), 1e-30)

        def one(thr):
            pred = vol > thr * vmax
            inter = jnp.sum(pred & t)
            union = jnp.sum(pred | t)
            return inter / jnp.maximum(union, 1)

        thrs = jnp.linspace(0.0, 1.0, 101)
        ious = jax.lax.map(one, thrs)
        return jnp.max(ious)

    iou_v = float(best_iou(p_fin, ep2, target))
    print(f"# best IoU: {iou_v:.4f}", file=sys.stderr)

    wall = t_scene + t_build2 + t_loop
    print(f"# headline = scene {t_scene:.2f} + precompute {t_build2:.2f} "
          f"+ loop {t_loop:.2f} = {wall:.2f}s (compile excluded, "
          f"{t_warm:.1f}s once per cache)", file=sys.stderr)
    print(f"# first-run total incl. backend init + jit compile: "
          f"{time.time() - t_all:.1f}s", file=sys.stderr)

    print(json.dumps({
        "metric": f"benchy-class cylindrical {N_ANGLES} angles "
                  f"{DMD}x{DMD} DMD 1rpp {FILM}^3 film "
                  f"{N_STEPS}-iter LinearLBFGS wall-clock incl. scene "
                  f"prep (1 TPU chip)",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(L40S_BASELINE_S / wall, 3),
    }))


if __name__ == "__main__":
    main()
