"""Microbenchmark of the ballistic engine's pieces on the live device:
dense_patterns scatter, Sz einsum, forward backprojection kernel,
backward kernel, loss eval. Identifies the per-render bottleneck of
bench.py's 400-angle 256^3 workload.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# cache dir set via jax.config below (env var is read too early
# by the sitecustomize jax import to take effect)

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/micro")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp


def hard_sync(x):
    """Force completion via a device->host read: on the tunneled axon
    backend block_until_ready returns before execution finishes, which
    silently turns timing loops into async-dispatch measurements."""
    import numpy as _np
    for leaf in jax.tree_util.tree_leaves(x):
        _np.asarray(jnp.ravel(leaf)[:1])
    return x

A, U, FILM = 400, 400, 256


def timeit(fn, *args, reps=5):
    out = hard_sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = hard_sync(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    from bench import build_scene
    from drtvam_tpu.ops.ballistic import BallisticEngine
    from drtvam_tpu.ops.backproject import _fwd_pallas, _bwd_pallas
    from drtvam_tpu.opt.loss import ThresholdedLoss

    scene = build_scene()
    static, arr = scene.build(mode="volume", include_target=False,
                              max_depth=6, rr_depth=6)
    eng = BallisticEngine(static, arr)
    ep = eng.params()
    n = scene.projector.active_size()
    data = jnp.ones((n,), jnp.float32)
    print(f"# platform={jax.devices()[0].platform} impl={eng.impl}",
          file=sys.stderr)

    dense = jax.jit(lambda d, ap: eng.dense_patterns(d, ap))
    t, P = timeit(dense, data, ep["active_pixels"])
    print(f"dense_patterns scatter: {t*1e3:8.1f} ms")

    resample = jax.jit(lambda Sz, P: jnp.einsum("zr,aru->azu", Sz, P))
    t, Pz = timeit(resample, ep["Sz"], P)
    print(f"Sz einsum resample:     {t*1e3:8.1f} ms   Pz{Pz.shape}")

    fwd = jax.jit(_fwd_pallas)
    t, dose = timeit(fwd, Pz, ep["W"], ep["Umap"])
    print(f"fwd backproject kernel: {t*1e3:8.1f} ms   dose{dose.shape}")
    flops = 2 * A * 256 * 512 * (FILM * FILM)
    print(f"  -> {flops / t / 1e12:6.2f} TFLOP/s (padded fp32 matmul)")

    dL = dose * 1e-6
    bwd = jax.jit(lambda dL, W, Um: _bwd_pallas(dL, W, Um, U))
    t, Pbar = timeit(bwd, dL, ep["W"], ep["Umap"])
    print(f"bwd backproject kernel: {t*1e3:8.1f} ms   Pbar{Pbar.shape}")
    print(f"  -> {flops / t / 1e12:6.2f} TFLOP/s (padded fp32 matmul)")

    loss_obj = ThresholdedLoss({"tl": 0.9, "tu": 0.95})
    target = jnp.zeros((FILM, FILM, FILM, 1), jnp.float32)
    vol = dose.reshape(FILM, FILM, FILM, 1)
    lo = jax.jit(lambda v, t_, d: loss_obj(v, t_, d))
    t, _ = timeit(lo, vol, target, data)
    print(f"loss eval:              {t*1e3:8.1f} ms")

    gather = jax.jit(lambda Pb, ap: Pb.reshape(-1)[ap])
    Pfull = jnp.zeros((A, U, U), jnp.float32)
    t, _ = timeit(gather, Pfull, ep["active_pixels"])
    print(f"pattern gather:         {t*1e3:8.1f} ms")

    full = jax.jit(lambda d, ep: eng.render_vol(d, jnp.float32(1.0),
                                                params=ep))
    t, _ = timeit(full, data, ep)
    print(f"FULL render_vol:        {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
