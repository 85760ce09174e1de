"""Headline benchmarks: the reference README workload classes
(README.md:110-135) on one TPU chip.

Two workloads, both 400 angles x 400x400 DMD @ 25 um, 256^3 dose grid,
40 Linear-L-BFGS iterations, cylindrical vial with refraction:

  1. ballistic (1 ray/pixel class)  — vs L40S 23 s (README.md:131)
  2. scattering (16 rays/pixel class, albedo 0.5) — vs L40S 14 m 10 s
     (README.md:133). Ours uses the hybrid engine: the unscattered
     transport (>90% of the dose at albedo 0.5) is analytic matmuls
     with ZERO Monte-Carlo noise, so the scattered residual needs far
     fewer rays than the reference's 16 analog rays/pixel for equal
     print quality — the quality gate below (not a ray count) is what
     makes the comparison honest.

The target is a Benchy-class phantom: 10 mm tall, 5 x 4 mm cross
section, a 1.75 mm z-through-hole, in a vial the DMD aperture fully
covers (r_ext 5 mm <= half the 10 mm DMD width) — the physical setup
of a real print. QUALITY GATE: each timed optimization must reach
best-IoU >= 0.98 under the reference's absolute threshold sweep
(thresholds in [0, 1.3] dose units, reference utils.py:48-81); the
script hard-fails before printing a metric otherwise, so a fast-but-
wrong run produces no number.

Prints ONE JSON line: the ballistic headline as {metric, value, unit,
vs_baseline} plus an "extra" list carrying the scattering metric and
the cold-start accounting. vs_baseline = L40S seconds / ours
(> 1 == faster than the L40S).

Wall-clock semantics: the timed value covers scene assembly + target
voxelization, transport precompute + upload, and the full 40-iteration
optimization. jit compilation is excluded via warm-up AND cached
persistently (.jax_cache) so reruns — including fresh processes — skip
it; the cold first-run total is reported separately in "extra" so
nothing hides.

Robustness: the script enforces its own wall-clock budget
(DRTVAM_BENCH_BUDGET_S, default 510 s) — optional phases are skipped
when they can't fit, optimization loops run in bounded device
dispatches with budget checks between them, each completed result is
checkpointed to stdout immediately, and a watchdog THREAD (signals
defer while a tunneled dispatch stalls; the GIL does not) re-prints
the latest checkpoint and exits 0 just past the budget. A driver-side
timeout can therefore never again erase a completed measurement
(rounds 3 and 4 both lost theirs).
"""
import hashlib
import json
from functools import partial
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# per-stage engine-build breadcrumbs on stderr so precompute-time
# regressions are diagnosable from the recorded bench tail alone
os.environ.setdefault("DRTVAM_BUILD_LOG", "1")

import jax


def _cache_dir():
    """Persistent-cache dir keyed by HOST CPU + jaxlib version: the
    cache also holds XLA:CPU AOT executables (host-side chord-bank /
    band-span compiles), and loading one compiled on a different
    machine risks SIGILL (observed as machine-feature-mismatch errors
    in the r04 bench tail). Host-keying trades cross-host cache warmth
    for never loading a foreign CPU executable."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    key = hashlib.sha1(
        (flags + jax.__version__).encode()).hexdigest()[:12]
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".jax_cache", key)


# NOTE: set via jax.config, not env — the environment's sitecustomize
# imports jax before this script runs, so JAX_COMPILATION_CACHE_DIR in
# os.environ is read too late to take effect.
jax.config.update("jax_compilation_cache_dir", _cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp

# -- wall-clock budget --------------------------------------------------
# The driver runs `python bench.py` under an external timeout; a kill
# means rc 124 and NO recorded number (this erased rounds 3 AND 4). The
# script therefore enforces its own budget: optional phases are skipped
# when the remaining budget can't fit them (estimated from measured
# warmup), optimization loops abort at the deadline, and a SIGALRM/
# SIGTERM backstop re-prints the latest checkpointed JSON line and
# exits 0 — the headline result survives no matter what.
T_START = time.time()
BUDGET_S = float(os.environ.get("DRTVAM_BENCH_BUDGET_S", "510"))


def remaining_s():
    return BUDGET_S - (time.time() - T_START)


_LATEST = {"line": None}


def checkpoint(obj):
    """Print (and remember) the current best result line."""
    _LATEST["line"] = json.dumps(obj)
    print(_LATEST["line"], flush=True)


_CHILD = {"proc": None}


def _emit_and_exit(why):
    print(f"# budget backstop: {why} at {time.time() - T_START:.0f}s — "
          f"emitting latest checkpoint", file=sys.stderr, flush=True)
    proc = _CHILD["proc"]
    if proc is not None and proc.poll() is None:
        try:
            proc.kill()  # don't orphan a phase child holding the TPU
        except OSError:
            pass
    if _LATEST["line"] is not None:
        print(_LATEST["line"], flush=True)
        sys.stdout.flush()
        os._exit(0)
    os._exit(1)  # nothing to report: a timeout before ballistic


def _bail(signum, frame):
    _emit_and_exit(f"signal {signum}")


signal.signal(signal.SIGTERM, _bail)

# HARD backstop: a watchdog THREAD, not a signal. Python delivers
# signals only between bytecodes, so a SIGALRM raised while the main
# thread is blocked inside a TPU dispatch (observed stalling for >10
# minutes on the tunneled backend) is deferred indefinitely — exactly
# the case the backstop exists for. The dispatch releases the GIL, so
# a daemon thread still runs and can os._exit with the checkpointed
# result on stdout.
import threading

_WATCHDOG = threading.Timer(BUDGET_S + 25.0,
                            _emit_and_exit, args=("watchdog",))
_WATCHDOG.daemon = True
_WATCHDOG.start()

L40S_BALLISTIC_S = 23.0    # README.md:131, cylindrical 1 ray/pixel
L40S_SCATTERING_S = 850.0  # README.md:133, cylindrical scattering 16 rpp
L40S_SURFACE_S = 225.0     # README.md:135, square scattering +
#                            surface-aware loss + black-pixel culling

N_ANGLES = 400
DMD = 400
FILM = 256
# DRTVAM_BENCH_STEPS is a validation hook (smoke a phase end-to-end at
# reduced iterations); the recorded benchmark always uses the default 40
N_STEPS = int(os.environ.get("DRTVAM_BENCH_STEPS", "40"))
IOU_BAR = 0.98
# hybrid scattered-residual rays/pixel (fwd and grad). With forced
# first-scatter sampling (ops/march.py) every residual lane deposits,
# so spp 1 carries the variance of ~5 analog rays/pixel at the
# benchmark's albedo 0.5 — the IoU gate below is what certifies it.
SCAT_SPP = 1
GATE_SPP = 4        # per-seed final-render rays/pixel (x3 seeds)
# residual depth cap 5 = forced first scatter + 4 more medium events.
# The reference counts SURFACE events toward its max_depth=6
# (volume.py:271), so its benchmark paths cross 2-3 vial interfaces
# first and get only ~2 medium events after their first scatter — this
# budget is two events MORE than the reference estimator traces, at
# 3/5 the deposit-flush traffic of the naive scene-cap setting.
# (Depth 4 measured IoU 0.9796 — a hair under the 0.98 gate.)
RESID_DEPTH = int(os.environ.get("DRTVAM_BENCH_RESID_DEPTH", "5"))


def build_scene(albedo=0.0, square=False, surface_aware=False):
    from drtvam_tpu.models.scene import Scene
    from drtvam_tpu.ops.mesh import make_box_with_hole, save_ply

    mesh_path = "/tmp/bench_target.ply"
    save_ply(make_box_with_hole((1.0, 0.8, 2.0), 0.35,
                                hole_center_xy=(-0.4, 0.0),
                                segments=99), mesh_path)
    med = {"ior": 1.40, "phase": {"type": "rayleigh"},
           "extinction": 0.05, "albedo": albedo}
    if square:
        # inner width 6.8 mm: the 10 mm DMD aperture covers the vial
        # except the extreme corners at 45 deg rotation (real-setup
        # geometry; the target stays fully covered)
        vial = {"type": "square", "w_int": 6.8, "w_ext": 7.2,
                "ior": 1.54, "medium": med}
    else:
        vial = {"type": "cylindrical", "r_int": 4.75, "r_ext": 5.0,
                "ior": 1.54, "medium": med}
    film = {"type": "vfilm", "resx": FILM, "resy": FILM, "resz": FILM}
    final_sensor = None
    if surface_aware:
        film = dict(film, surface_aware=True)
        # the reference requires a separate non-surface-aware sensor for
        # final visualization/metrics when optimizing surface-aware
        final_sensor = {"type": "dda", "scalex": 10, "scaley": 10,
                        "scalez": 10,
                        "film": {"type": "vfilm", "resx": FILM,
                                 "resy": FILM, "resz": FILM}}
    cfg = {
        "vial": vial,
        "projector": {"type": "collimated", "n_patterns": N_ANGLES,
                      "resx": DMD, "resy": DMD,
                      "pixel_size": 10.0 / DMD,  # 25 um at DMD=400
                      "motion": "circular", "distance": 30},
        "sensor": {"type": "dda", "scalex": 10, "scaley": 10,
                   "scalez": 10, "film": film},
        "target": {"filename": mesh_path, "size": 10.0},
        "output": "/tmp",
    }
    if final_sensor is not None:
        cfg["final_sensor"] = final_sensor
    return Scene(cfg)


def phase(msg, t0):
    dt = time.time() - t0
    print(f"# {msg}: {dt:.2f}s", file=sys.stderr)
    return dt


def hard_sync(x):
    """Force completion via a device->host read of one element per
    leaf. On the tunneled axon backend jax.block_until_ready has been
    observed to return before execution finishes, which silently turns
    wall-clock measurements into async-dispatch measurements; a host
    transfer cannot complete early."""
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jnp.ravel(leaf)[:1])
    return x


@jax.jit
def _iou_sweep(vol, tgt):
    """Best IoU over the reference's absolute threshold sweep
    (utils.py:48-81: 300 thresholds in [0, 1.3] dose units)."""
    t = tgt > 0.5

    def one(thr):
        pred = vol > thr
        return jnp.sum(pred & t) / jnp.maximum(jnp.sum(pred | t), 1)

    thrs = jnp.linspace(0.0, 1.3, 301)
    ious = jax.lax.map(one, thrs)
    k = jnp.argmax(ious)
    return ious[k], thrs[k]


def best_iou_abs(vol, target):
    """vol/target: (Z, Y, X) single-channel device arrays. The renders
    feeding `vol` are dispatched EAGERLY by the callers, one per seed —
    r03 traced 3 spp-16 renders into ONE jitted gate program and the
    1.5B-lane dispatch crashed the TPU worker.

    Falls back to an exact host-side sweep when the device program
    can't run (the surface-aware phase's sweep compile deterministically
    reported a phantom 16.06 GB HBM plan on the tunneled backend): with
    vo/vv = dose values of object/void voxels sorted once,
    |pred & t|(thr) = #vo > thr and |pred | t|(thr) = |t| + #vv > thr,
    so the 301-threshold sweep is two searchsorted calls per threshold.
    """
    try:
        i, t = _iou_sweep(vol, target)
        return float(i), float(t)
    except Exception as e:
        print(f"# device IoU sweep failed ({type(e).__name__}) — exact "
              f"host-side sweep", file=sys.stderr)
        return best_iou_host(np.asarray(vol), np.asarray(target))


def best_iou_host(v, tm):
    """Exact host-side sweep; v/tm numpy (same math as _iou_sweep)."""
    v = v.ravel()
    tm = tm.ravel() > 0.5
    vo = np.sort(v[tm])
    vv = np.sort(v[~tm])
    n_t = vo.size
    best_i, best_t = 0.0, 0.0
    for thr in np.linspace(0.0, 1.3, 301):
        inter = n_t - np.searchsorted(vo, thr, side="right")
        union = n_t + (vv.size - np.searchsorted(vv, thr,
                                                 side="right"))
        iou = inter / max(union, 1)
        if iou > best_i:
            best_i, best_t = float(iou), float(thr)
    return best_i, best_t


def make_lbfgs_run(eng, loss_obj, inv_vol, n_steps, hybrid=False):
    from drtvam_tpu.opt.device_lbfgs import fused_linear_lbfgs

    @jax.jit
    def run(data0, ep, tgt, seed):
        def render(p):
            if hybrid:
                return eng.render_vol(p, inv_vol, seed=seed, params=ep)
            return eng.render_vol(p, inv_vol, params=ep)

        def value_grad(p):
            vol = render(p)
            loss = loss_obj(vol, tgt, p)
            dvol, dpat = jax.grad(
                lambda v, q: loss_obj(v, tgt, q), argnums=(0, 1))(vol, p)
            if hybrid:
                grad = eng.pattern_grad(dvol, inv_vol, seed=seed,
                                        params=ep) + dpat
            else:
                grad = eng.pattern_grad(dvol, inv_vol, params=ep) + dpat
            return vol, loss, grad

        def cand(vol, dvol, alpha, z):
            return loss_obj(vol + alpha * dvol, tgt, z)

        return fused_linear_lbfgs(value_grad, render, cand, data0,
                                  n_steps)

    return run


def run_ballistic(loss_obj):
    """Ballistic workload; returns (wall_s, iou, extras)."""
    from drtvam_tpu.ops.ballistic import BallisticEngine

    t0 = time.time()
    scene = build_scene(albedo=0.0)
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=6, rr_depth=6)
    target = jnp.asarray(scene.sensor.discretize(scene.target_bank()))
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    n = scene.projector.active_size()
    t_scene = phase("ballistic: scene+discretize (host)", t0)

    t0 = time.time()
    eng = BallisticEngine(static, arr)
    ep = eng.params()
    hard_sync((ep["W"], target))
    t_build = phase("ballistic: transport precompute + upload (cold)", t0)

    # steady-state build timed BEFORE any TPU compile: XLA compilation
    # and its background persistent-cache writes keep host threads busy
    # for tens of seconds after the compile returns, and a steady build
    # timed in that window measured 47 s where a clean one takes ~10 s
    t0 = time.time()
    eng2 = BallisticEngine(static, arr)
    ep2 = eng2.params()
    hard_sync(ep2["W"])
    t_build2 = phase("ballistic: transport precompute (steady)", t0)

    run = make_lbfgs_run(eng, loss_obj, inv_vol, N_STEPS)
    data0 = jnp.zeros((n,), jnp.float32)
    seed0 = jnp.uint32(0)

    t0 = time.time()
    out = hard_sync(run(data0, ep, target, seed0))
    t_warm = phase("ballistic: warmup (jit compile + first run)", t0)

    t0 = time.time()
    p_fin, loss_hist, n_done = hard_sync(
        run(data0, ep2, target, seed0))
    t_loop = phase(f"ballistic: fused {int(n_done)}-iter loop", t0)
    loss_hist = np.asarray(loss_hist)
    last = loss_hist[max(int(n_done) - 1, 0)]
    print(f"# ballistic: loss {loss_hist[0]:.3e} -> {last:.3e}",
          file=sys.stderr)

    vol_fin = eng2.render_vol(p_fin, inv_vol, params=ep2)
    iou, thr = best_iou_abs(vol_fin[..., 0], target[..., 0])
    print(f"# ballistic: best IoU {iou:.4f} @ threshold {thr:.3f}",
          file=sys.stderr)

    wall = t_scene + t_build2 + t_loop
    extras = {"scene_s": round(t_scene, 2),
              "precompute_s": round(t_build2, 2),
              "loop_s": round(t_loop, 2),
              "compile_warmup_s": round(t_warm, 2),
              "cold_precompute_s": round(t_build, 2),
              "iters_run": int(n_done),
              "iou": round(iou, 4)}
    return wall, iou, extras


def hybrid_lbfgs_opt(eng, loss_obj, inv_vol, target, n, tag, ep=None,
                     fused=True):
    """Fused LinearLBFGS loop for the hybrid engine workloads, run in
    K-iteration device dispatches. One while-loop program holds primal
    render + adjoint + direction render + Armijo search: the tunneled
    TPU pays per-dispatch overhead AND occasionally stalls a dispatch
    for minutes, so the round-4 five-dispatches-per-iteration design
    spent more wall-clock between programs than in them. Segmenting (vs
    one 40-iter dispatch) keeps wall-clock budget checks between
    dispatches without recompiling — stop_i is a traced argument.

    fused=False falls back to split dispatches (primal, adjoint, and
    DeviceLinearLBFGS's three step programs): the SURFACE-AWARE
    workload's fused program failed AT COMPILE planning 24.9 GB of the
    15.75 GB HBM (2-channel film + per-voxel inv_vol + the non-identity
    culled pattern store enlarge the while-body's live set); split,
    each program's peak fits — the same fix round 3's OOM forced.

    Returns (p_final, warmup_s, loop_s, n_done)."""
    from drtvam_tpu.opt.device_lbfgs import fused_linear_lbfgs
    import drtvam_tpu.opt.loss  # noqa: F401  (registry import order)

    if ep is None:
        ep = eng.params()

    if not fused:
        return _hybrid_split_opt(eng, loss_obj, inv_vol, target, n, tag,
                                 ep)

    data0 = jnp.zeros((n,), jnp.float32)

    def init_state(m=5):
        return dict(
            i=jnp.int32(0), done=jnp.bool_(False),
            p=jnp.zeros((n,), jnp.float32),
            p_old=jnp.zeros((n,), jnp.float32),
            g_old=jnp.zeros((n,), jnp.float32),
            # bf16 S/Yh history: at n = 64M the f32 history alone is
            # 2.6 GB of the 16 GB HBM (r03 OOM'd here)
            S=jnp.zeros((m, n), jnp.bfloat16),
            Yh=jnp.zeros((m, n), jnp.bfloat16),
            ys=jnp.ones((m,), jnp.float32),
            head=jnp.int32(0), nvalid=jnp.int32(0),
            loss_hist=jnp.zeros((N_STEPS,), jnp.float32),
        )

    # inv_vol rides as a jit ARGUMENT: for surface-aware films it is a
    # (Z, Y, X, 2) per-voxel array that must not be baked into the HLO
    # (tunneled-TPU remote-compile payload limit). The loop state is
    # donated so the circular history insert updates in place.
    @partial(jax.jit, donate_argnums=(0,))
    def run_seg(state, stop_i, ep, iv, tgt):
        def value_grad(p, i):
            seed = i.astype(jnp.uint32)
            vol = eng.render_vol(p, iv, seed=seed, params=ep)
            loss = loss_obj(vol, tgt, p)
            dvol, dpat = jax.grad(
                lambda v, q: loss_obj(v, tgt, q), argnums=(0, 1))(vol, p)
            grad = eng.pattern_grad(dvol, iv, seed=seed,
                                    params=ep) + dpat
            return vol, loss, grad

        def dir_fn(z, i):
            # step-size search on the ANALYTIC component of the
            # candidate dose only: the primal render and the gradient
            # stay exact, so this cannot bias the solution — the
            # Armijo trials just evaluate candidates whose scattered
            # part (a ~20% smooth component at albedo 0.5) is frozen
            # at the current iterate. Each iteration re-renders the
            # true dose, so there is no drift, and it removes one of
            # the three full residual wavefronts per iteration. The
            # IoU gate certifies the result.
            return eng.ball.render_vol(z, iv, params=ep["ball"])

        def cand(vol, dvol, alpha, z):
            return loss_obj(vol + alpha * dvol, tgt, z)

        return fused_linear_lbfgs(value_grad, dir_fn, cand, data0,
                                  N_STEPS, history_dtype=jnp.bfloat16,
                                  pass_iter=True, state=state,
                                  stop_i=stop_i, return_state=True)

    # segment size 1: a 10-iteration segment (~70 s in one dispatch)
    # crashed the TPU worker ("kernel fault"), while every observed
    # dispatch under ~30 s survives — the tunneled worker appears to
    # enforce an execution time limit. Per-dispatch overhead measured
    # negligible, so one fused iteration per dispatch loses nothing.
    K = int(os.environ.get("DRTVAM_BENCH_SEG", "1"))

    # compile warmup: one real iteration on a throwaway state
    t0 = time.time()
    _, _, _, st_warm = run_seg(init_state(), jnp.int32(1), ep, inv_vol,
                               target)
    hard_sync(st_warm["p"])
    del st_warm
    t_warm = phase(f"{tag}: warmup (jit compile + 1 iter)", t0)

    # timed loop: all N_STEPS iterations on warm programs, in
    # K-iteration segments with budget checks between dispatches
    deadline = T_START + BUDGET_S - 35.0
    t0 = time.time()
    state = init_state()
    n_done = 0
    p_fin, hist = data0, None
    while n_done < N_STEPS:
        nxt = min(n_done + K, N_STEPS)
        p_fin, hist, i_done, state = run_seg(state, jnp.int32(nxt), ep,
                                             inv_vol, target)
        new_done = int(i_done)  # hard sync
        if new_done == n_done:
            break               # loss hit exactly 0 (early convergence)
        n_done = new_done
        if time.time() > deadline and n_done < N_STEPS:
            print(f"# {tag}: budget deadline hit at iter {n_done}/"
                  f"{N_STEPS} — aborting loop", file=sys.stderr)
            break
    t_loop = phase(f"{tag}: {n_done}-iter loop "
                   f"(spp {SCAT_SPP} residual)", t0)
    last_loss = float(np.asarray(hist)[max(n_done - 1, 0)])
    print(f"# {tag}: final loss {last_loss:.3e}", file=sys.stderr)
    return p_fin, t_warm, t_loop, n_done


def mem_report(tag):
    """Top live device allocations (stderr) — the surface-aware phase
    ran the chip to 16.06/15.75 GB at gate time and the culprit was
    not identifiable from the OOM alone."""
    import collections
    try:
        la = jax.live_arrays()
    except Exception:
        return
    tot = sum(a.nbytes for a in la)
    print(f"# mem[{tag}]: {len(la)} live arrays, {tot / 1e9:.2f} GB",
          file=sys.stderr)
    by = collections.Counter()
    for a in la:
        by[(str(a.shape), str(a.dtype))] += a.nbytes
    for (shape, dt), v in by.most_common(8):
        print(f"#   {v / 1e6:9.1f} MB  {shape} {dt}", file=sys.stderr)


def gate_volume(eng, p_fin, inv_vol, ep, n_seeds):
    """Averaged high-spp final render for the IoU gate, one JITTED
    dispatch per seed with in-place accumulation. The eager version
    left enough intermediates live that the surface-aware gate's
    subsequent (tiny) IoU-sweep compile OOM'd by 322 MB."""
    import gc
    gc.collect()

    @jax.jit
    def render1(p, ep, iv, seed):
        return eng.render_vol(p, iv, seed=seed, params=ep, spp=GATE_SPP)

    vol_g = None
    for k in range(n_seeds):
        r = hard_sync(render1(p_fin, ep, inv_vol, jnp.uint32(990 + k)))
        vol_g = r if vol_g is None else hard_sync(vol_g + r)
    return vol_g / n_seeds


def _hybrid_split_opt(eng, loss_obj, inv_vol, target, n, tag, ep):
    """Split-dispatch fallback: primal + adjoint + the three
    DeviceLinearLBFGS step programs per iteration (ballistic-only
    direction render, bf16 donated history). Used where the fused
    while-body's planned live set exceeds HBM (surface-aware)."""
    from drtvam_tpu.opt.device_lbfgs import DeviceLinearLBFGS

    @jax.jit
    def primal_j(data, seed, ep, iv, tgt):
        vol = eng.render_vol(data, iv, seed=seed, params=ep)
        return vol, loss_obj(vol, tgt, data)

    @jax.jit
    def adjoint_j(vol, data, seed, ep, iv, tgt):
        dvol, dpat = jax.grad(
            lambda v, q: loss_obj(v, tgt, q), argnums=(0, 1))(vol, data)
        return eng.pattern_grad(dvol, iv, seed=seed, params=ep) + dpat

    def dir_fn(z, seed, ep, iv, tgt):
        # analytic-component-only candidate direction (see the fused
        # path's dir_fn for why this cannot bias the solution)
        return eng.ball.render_vol(z, iv, params=ep["ball"])

    def cand_fn(vol, dvol, alpha, z, seed, ep, iv, tgt):
        return loss_obj(vol + alpha * dvol, tgt, z)

    def make_opt():
        return DeviceLinearLBFGS(dir_fn=dir_fn, cand_fn=cand_fn,
                                 history_dtype=jnp.bfloat16)

    def optimize(opt, n_steps, deadline=None):
        data = jnp.zeros((n,), jnp.float32)
        loss = jnp.float32(0.0)
        done = 0
        for i in range(n_steps):
            seed = jnp.uint32(i)
            vol, loss = primal_j(data, seed, ep, inv_vol, target)
            grad = adjoint_j(vol, data, seed, ep, inv_vol, target)
            data = opt.step(data, grad, vol, loss,
                            step_args=(seed, ep, inv_vol, target))
            hard_sync(data)
            done = i + 1
            if deadline is not None and time.time() > deadline and \
                    done < n_steps:
                print(f"# {tag}: budget deadline hit at iter {done}/"
                      f"{n_steps} — aborting loop", file=sys.stderr)
                break
        return data, float(loss), done

    import gc

    t0 = time.time()
    _ = optimize(make_opt(), 1)  # compile all step programs
    gc.collect()  # DeviceLinearLBFGS's jit-of-bound-method cycles keep
    #               its ~1 GB history alive until the cycle collector runs
    t_warm = phase(f"{tag}: warmup (jit compile + 1 iter, split "
                   f"dispatches)", t0)

    deadline = T_START + BUDGET_S - 35.0
    t0 = time.time()
    p_fin, last_loss, n_done = optimize(make_opt(), N_STEPS,
                                        deadline=deadline)
    t_loop = phase(f"{tag}: {n_done}-iter loop "
                   f"(spp {SCAT_SPP} residual, split dispatches)", t0)
    print(f"# {tag}: final loss {last_loss:.3e}", file=sys.stderr)
    # release the optimizer history AND every compiled executable: the
    # backend held ~12 GB beyond the Python-visible arrays after this
    # loop (per-executable workspace), and the gate render then OOM'd
    # a nearly-full chip. Gate programs reload from the persistent
    # compilation cache.
    gc.collect()
    jax.clear_caches()
    gc.collect()
    return p_fin, t_warm, t_loop, n_done


def run_scattering(loss_obj):
    """Scattering workload via the hybrid engine; (wall_s, iou, extras)."""
    from drtvam_tpu.ops.hybrid import ScatteringEngine

    t0 = time.time()
    scene = build_scene(albedo=0.5)
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=6, rr_depth=6)
    target = jnp.asarray(scene.sensor.discretize(scene.target_bank()))
    inv_vol = jnp.float32(1.0 / scene.sensor.voxel_volume)
    n = scene.projector.active_size()
    t_scene = phase("scattering: scene+discretize (host)", t0)

    t0 = time.time()
    eng = ScatteringEngine(static, arr, spp=SCAT_SPP, estimator="delta",
                           residual_max_depth=RESID_DEPTH)
    ep = eng.params()
    hard_sync((ep["ball"]["W"], target))
    t_build = phase("scattering: engine build + upload", t0)

    # per-iteration dispatches (not one fused mega-dispatch): each
    # dispatch traces 3 x n x spp rays; keeping dispatches seconds-long
    # avoids network-transport timeouts on tunneled TPUs
    p_fin, t_warm, t_loop, n_done = hybrid_lbfgs_opt(
        eng, loss_obj, inv_vol, target, n, tag="scattering", ep=ep)

    # quality gate on the EXPECTED dose (physical light is noise-free):
    # high-spp final renders (the reference's spp_ref convention),
    # averaged over 3 seeds so MC noise near the bar can't flake the
    # gate — one jitted dispatch per seed (gate_volume; r03 traced all
    # 3 renders into ONE program and the 1.5B-lane dispatch crashed the
    # TPU worker). When the budget is nearly spent, fall back to a
    # single seed.
    # each spp-4 gate render costs ~30 s at this scale — pick the seed
    # count the remaining budget can actually pay for
    rem = remaining_s()
    n_seeds = 3 if rem > 115 else (2 if rem > 80 else 1)
    vol_g = gate_volume(eng, p_fin, inv_vol, ep, n_seeds)
    iou, thr = best_iou_abs(vol_g[..., 0], target[..., 0])
    print(f"# scattering: best IoU {iou:.4f} @ threshold {thr:.3f} "
          f"({n_seeds}x spp-{GATE_SPP} first-scatter reference renders)",
          file=sys.stderr)

    wall = t_scene + t_build + t_loop
    extras = {"scene_s": round(t_scene, 2),
              "engine_build_s": round(t_build, 2),
              "loop_s": round(t_loop, 2),
              "compile_warmup_s": round(t_warm, 2),
              "residual_spp": SCAT_SPP,
              "iters_run": n_done,
              "iou": round(iou, 4)}
    return wall, iou, extras


def run_surface_aware():
    """README.md:135 class: square vial, scattering albedo 0.5,
    SURFACE-AWARE 2-channel loss, black-pixel (Radon) culling —
    vs L40S 3 m 45 s. Returns (wall_s, iou, extras)."""
    from drtvam_tpu.ops.hybrid import ScatteringEngine
    from drtvam_tpu.opt.loss import ThresholdedLoss

    t0 = time.time()
    scene = build_scene(albedo=0.5, square=True, surface_aware=True)
    tb = scene.target_bank()
    sensor = scene.sensor
    # surface-aware target = per-voxel (inside, outside) fractional
    # volumes (reference sensor.py:47-110); per-voxel 1/volume weights
    target = jnp.asarray(np.asarray(sensor.compute_volume(tb)))
    inv_vol = jnp.asarray(sensor.inv_volume(tb))
    mask = np.asarray(sensor.discretize(tb))
    t_scene = phase("surface-aware: scene + fractional volumes", t0)

    # black-pixel culling (reference optimize.py:143-163): the radon>0
    # test is one transpose matmul of the target occupancy against the
    # unscattered transport field — same kept-pixel set as the
    # reference's wavefront radon render (ops/ballistic.py:
    # radon_active_ballistic), at matmul cost
    t0 = time.time()
    from drtvam_tpu.ops.ballistic import radon_active_ballistic
    static_v, arr_v = scene.build(mode="volume", include_target=False,
                                  max_depth=5, rr_depth=6)
    active = radon_active_ballistic(static_v, arr_v, mask)
    assert active.size > 0
    scene.projector.set_active(active,
                               np.zeros(active.size, np.float32))
    n = active.size
    kept = 100.0 * n / (N_ANGLES * DMD * DMD)
    t_cull = phase(f"surface-aware: radon culling ({kept:.1f}% of "
                   "pixels kept)", t0)

    t0 = time.time()
    static, arr = scene.build(mode="volume", include_target=True,
                              max_depth=6, rr_depth=6)
    eng = ScatteringEngine(static, arr, spp=SCAT_SPP,
                           estimator="delta", inside_mask=mask,
                           residual_max_depth=RESID_DEPTH)
    ep = eng.params()
    hard_sync(ep["ball"]["W"])
    t_build = phase("surface-aware: engine build + upload", t0)

    loss_obj = ThresholdedLoss({"tl": 0.9, "tu": 0.95})
    p_fin, t_warm, t_loop, n_done = hybrid_lbfgs_opt(
        eng, loss_obj, inv_vol, target, n, tag="surface-aware", ep=ep,
        fused=False)

    # gate: physical dose density per voxel = the channel the voxel
    # belongs to; IoU vs the binary occupancy under the absolute sweep
    mem_report("surface-aware pre-gate")
    rem = remaining_s()
    n_seeds = 3 if rem > 115 else (2 if rem > 80 else 1)
    vol_g = gate_volume(eng, p_fin, inv_vol, ep, n_seeds)
    mem_report("surface-aware post-gate-render")
    # channel-select + sweep fully on the HOST: by gate time the worker
    # holds its high-water allocations (only process exit releases
    # them) and even a 67 MB `where` OOMs; transferring the already-
    # materialized render needs no new device memory.
    vol_np = np.asarray(vol_g)
    mask_np = np.asarray(mask, np.float32).reshape(vol_np.shape[:3])
    combined = np.where(mask_np > 0.5, vol_np[..., 0], vol_np[..., 1])
    iou, thr = best_iou_host(combined, mask_np)
    print(f"# surface-aware: best IoU {iou:.4f} @ threshold {thr:.3f} "
          f"({n_seeds}x spp-{GATE_SPP} first-scatter reference renders)",
          file=sys.stderr)

    wall = t_scene + t_cull + t_build + t_loop
    extras = {"scene_s": round(t_scene, 2),
              "culling_s": round(t_cull, 2),
              "engine_build_s": round(t_build, 2),
              "loop_s": round(t_loop, 2),
              "compile_warmup_s": round(t_warm, 2),
              "pixels_kept_pct": round(kept, 2),
              "residual_spp": SCAT_SPP,
              "iters_run": n_done,
              "iou": round(iou, 4)}
    return wall, iou, extras


def ballistic_metric(wall_b, ext_b, extra):
    return {
        "metric": f"benchy-class (phantom rev r03) cylindrical "
                  f"{N_ANGLES} angles {DMD}x{DMD} DMD 1rpp {FILM}^3 "
                  f"film LinearLBFGS to convergence "
                  f"({ext_b['iters_run']}/{N_STEPS} iters) wall-clock "
                  f"incl. scene prep (1 TPU chip; quality-gated "
                  f"IoU>={IOU_BAR})",
        "value": round(wall_b, 3),
        "unit": "s",
        "vs_baseline": round(L40S_BALLISTIC_S / wall_b, 3),
        "extra": extra,
    }


def scat_metric(wall_s, iou_s, ext_s):
    gated = iou_s >= IOU_BAR and ext_s["iters_run"] == N_STEPS
    m = {
        "metric": f"benchy-class (phantom rev r03) cylindrical "
                  f"SCATTERING albedo 0.5 "
                  f"{N_ANGLES} angles {DMD}x{DMD} DMD {FILM}^3 film "
                  f"{ext_s['iters_run']}-iter LinearLBFGS (hybrid "
                  f"engine, residual spp {SCAT_SPP}; quality-gated "
                  f"IoU>={IOU_BAR}) vs L40S 14m10s",
        "value": round(wall_s, 3), "unit": "s", **ext_s}
    if gated:
        m["vs_baseline"] = round(L40S_SCATTERING_S / wall_s, 3)
    else:
        m["gate_failed"] = (f"iou {iou_s:.4f} < {IOU_BAR}"
                            if iou_s < IOU_BAR else
                            f"only {ext_s['iters_run']}/{N_STEPS} "
                            f"iters before budget deadline")
    return m


def sa_metric(wall_sa, iou_sa, ext_sa):
    gated = iou_sa >= IOU_BAR and ext_sa["iters_run"] == N_STEPS
    m = {
        "metric": f"benchy-class (phantom rev r03) square SCATTERING"
                  f" albedo 0.5 + SURFACE-AWARE loss + Radon-culled "
                  f"black pixels, {N_ANGLES} angles {DMD}x{DMD} DMD "
                  f"{FILM}^3 film {ext_sa['iters_run']}-iter "
                  f"LinearLBFGS (hybrid engine, residual spp "
                  f"{SCAT_SPP}; quality-gated IoU>={IOU_BAR}) "
                  f"vs L40S 3m45s",
        "value": round(wall_sa, 3), "unit": "s", **ext_sa}
    if gated:
        m["vs_baseline"] = round(L40S_SURFACE_S / wall_sa, 3)
    else:
        m["gate_failed"] = (f"iou {iou_sa:.4f} < {IOU_BAR}"
                            if iou_sa < IOU_BAR else
                            f"only {ext_sa['iters_run']}/{N_STEPS} "
                            f"iters before budget deadline")
    return m


def _phase_child(phase_name, budget):
    """Run ONE workload in a fresh process and parse its JSON line.

    Process isolation is what makes the benchmark survivable on this
    backend: (a) the tunneled worker retains ~14 GB of a process's
    allocations/workspaces even after jax.clear_caches() + gc, so a
    second heavy workload in the same process starts on a nearly-full
    chip (the r03/r04 OOMs and this round's surface-aware gate OOM);
    (b) a stalled dispatch blocks Python signal delivery forever, but
    the PARENT can always kill a hung child and move on."""
    import subprocess
    env = dict(os.environ)
    env["DRTVAM_BENCH_ONLY"] = phase_name
    env["DRTVAM_BENCH_BUDGET_S"] = str(max(60, int(budget)))
    print(f"# orchestrator: {phase_name} child, budget {budget:.0f}s",
          file=sys.stderr, flush=True)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)], env=env,
        stdout=subprocess.PIPE)
    _CHILD["proc"] = proc
    try:
        out, _ = proc.communicate(timeout=budget + 40)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        print(f"# orchestrator: {phase_name} child exceeded "
              f"{budget + 40:.0f}s — killed", file=sys.stderr, flush=True)
        return None
    finally:
        _CHILD["proc"] = None
    lines = [ln for ln in out.decode(errors="replace").splitlines()
             if ln.startswith("{")]
    if proc.returncode != 0:
        print(f"# orchestrator: {phase_name} child rc={proc.returncode}",
              file=sys.stderr, flush=True)
    if not lines:
        return None
    return json.loads(lines[-1])


def _strip(d):
    return {k: v for k, v in d.items()
            if k not in ("metric", "value", "unit")}


def orchestrate():
    """Default top level: one child process per workload; the parent
    never touches the TPU and can always emit what completed."""
    t_all = time.time()
    bj = _phase_child("ballistic", min(remaining_s() - 210, 300)
                      if remaining_s() > 410 else remaining_s() - 20)
    if bj is None:
        print("# orchestrator: no ballistic result — nothing to report",
              file=sys.stderr, flush=True)
        os._exit(1)
    wall_b, ext_b = bj["value"], _strip(bj)
    checkpoint(ballistic_metric(wall_b, ext_b, [ext_b]))

    extra = []
    skip_scat = os.environ.get("DRTVAM_BENCH_SKIP_SCATTERING") == "1"
    if not skip_scat and remaining_s() > 220:
        time.sleep(20)  # worker-side release of the previous child
        sj = _phase_child("scattering", remaining_s() - 15)
        if sj is not None:
            extra.append(scat_metric(sj["value"], sj.get("iou", 0.0),
                                     _strip(sj)))
        else:
            extra.append({"metric": "scattering child failed/timed out",
                          "value": None})
        checkpoint(ballistic_metric(wall_b, ext_b, extra + [ext_b]))

        if remaining_s() > 360:
            time.sleep(20)
            aj = _phase_child("surface", remaining_s() - 30)
            if aj is not None:
                extra.append(sa_metric(aj["value"], aj.get("iou", 0.0),
                                       _strip(aj)))
            else:
                extra.append({"metric": "surface-aware child "
                                        "failed/timed out",
                              "value": None})
        else:
            print(f"# surface-aware phase skipped: {remaining_s():.0f}s "
                  f"left of the {BUDGET_S:.0f}s budget",
                  file=sys.stderr, flush=True)
            extra.append({"metric": "surface-aware workload skipped "
                                    "(budget)", "value": None})
    elif not skip_scat:
        print(f"# scattering phases skipped: {remaining_s():.0f}s left "
              f"of the {BUDGET_S:.0f}s budget", file=sys.stderr,
              flush=True)
        extra.append({"metric": "scattering workloads skipped (budget)",
                      "value": None})

    total = time.time() - t_all
    print(f"# first-run total incl. backend init + compiles: "
          f"{total:.1f}s", file=sys.stderr)
    extra.append({
        "metric": "cold first-run total (backend init + all compiles + "
                  "all workloads)",
        "value": round(total, 1), "unit": "s",
    })
    checkpoint(ballistic_metric(wall_b, ext_b, extra + [ext_b]))


def main():
    import gc
    only = os.environ.get("DRTVAM_BENCH_ONLY")
    if not only and os.environ.get("DRTVAM_BENCH_NO_ISOLATE") != "1":
        return orchestrate()

    from drtvam_tpu.opt.loss import ThresholdedLoss

    t_all = time.time()
    t0 = time.time()
    hard_sync(jnp.zeros(()))
    phase("backend init (excluded)", t0)

    loss_obj = ThresholdedLoss({"tl": 0.9, "tu": 0.95})

    if only == "surface":
        wall_sa, iou_sa, ext_sa = run_surface_aware()
        print(json.dumps({"metric": "surface-aware only (phase child)",
                          "value": round(wall_sa, 3), "unit": "s",
                          **ext_sa}), flush=True)
        return
    if only == "scattering":
        wall_s, iou_s, ext_s = run_scattering(loss_obj)
        print(json.dumps({"metric": "scattering only (phase child)",
                          "value": round(wall_s, 3), "unit": "s",
                          **ext_s}), flush=True)
        return
    if only == "ballistic":
        wall_b, iou_b, ext_b = run_ballistic(loss_obj)
        assert iou_b >= IOU_BAR, \
            f"ballistic IoU {iou_b:.4f} below the {IOU_BAR} bar — the " \
            "speed number would be meaningless; failing loudly."
        print(json.dumps({"metric": "ballistic only (phase child)",
                          "value": round(wall_b, 3), "unit": "s",
                          **ext_b}), flush=True)
        return
    if only:
        raise SystemExit(f"unknown DRTVAM_BENCH_ONLY={only!r}")

    # monolithic single-process path (DRTVAM_BENCH_NO_ISOLATE=1)
    wall_b, iou_b, ext_b = run_ballistic(loss_obj)
    assert iou_b >= IOU_BAR, \
        f"ballistic IoU {iou_b:.4f} below the {IOU_BAR} quality bar — " \
        "the speed number would be meaningless; failing loudly."

    # emit the ballistic result NOW: if a later phase dies, this line is
    # already on stdout AND the signal backstop re-prints it (r03/r04
    # lost their ballistic numbers to scattering crash / driver timeout)
    checkpoint(ballistic_metric(wall_b, ext_b, [ext_b]))

    extra = []

    skip_scat = os.environ.get("DRTVAM_BENCH_SKIP_SCATTERING") == "1"
    # a scattering phase needs >= build (~25 s) + warmup compile (up to
    # ~130 s cold) + a useful slice of the loop; below 200 s of budget
    # starting one can't produce a gated number — keep what we have
    if not skip_scat and remaining_s() > 200:
        gc.collect()  # drop the ballistic phase's engines/executables
        wall_s, iou_s, ext_s = run_scattering(loss_obj)
        extra.append(scat_metric(wall_s, iou_s, ext_s))
        # checkpoint the two-metric result before the third workload
        checkpoint(ballistic_metric(wall_b, ext_b, extra + [ext_b]))

        # the third workload costs about as much as the second (same
        # engine class; the culled pixel set shrinks the loop) — start
        # it only if a full gated run plausibly fits
        est_sa = ext_s["engine_build_s"] + ext_s["compile_warmup_s"] \
            + ext_s["loop_s"] + 45.0
        if remaining_s() > min(200.0, est_sa):
            gc.collect()
            wall_sa, iou_sa, ext_sa = run_surface_aware()
            extra.append(sa_metric(wall_sa, iou_sa, ext_sa))
        else:
            print(f"# surface-aware phase skipped: {remaining_s():.0f}s "
                  f"left of the {BUDGET_S:.0f}s budget (needs "
                  f"~{est_sa:.0f}s)", file=sys.stderr)
            extra.append({"metric": "surface-aware workload skipped "
                                    "(budget)", "value": None})
    elif not skip_scat:
        print(f"# scattering phases skipped: {remaining_s():.0f}s left "
              f"of the {BUDGET_S:.0f}s budget", file=sys.stderr)
        extra.append({"metric": "scattering workloads skipped (budget)",
                      "value": None})

    total = time.time() - t_all
    print(f"# first-run total incl. backend init + compiles: "
          f"{total:.1f}s", file=sys.stderr)

    extra.append({
        "metric": "cold first-run total (backend init + all compiles + "
                  "all workloads)",
        "value": round(total, 1), "unit": "s",
    })

    checkpoint(ballistic_metric(wall_b, ext_b, extra + [ext_b]))


if __name__ == "__main__":
    main()
