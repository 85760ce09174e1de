"""Scaling harness: rays/s and parallel efficiency over a device mesh.

Measures the sharded wavefront renderer and the angle-sharded ballistic
engine on 1, 2, ..., N devices (BASELINE.json target: >= 85% rays/s
scaling). On real multi-chip hardware run it as-is; without one it
demonstrates the harness on virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python benchmarks/scaling.py --devices 1 2 4 8

Prints one JSON line per (engine, n_devices) with rays/s (wavefront)
or angle-renders/s (ballistic) and efficiency vs 1 device.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (virtual devices via XLA_FLAGS)")
    ap.add_argument("--n-patterns", type=int, default=64)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--film", type=int, default=64)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from __graft_entry__ import _make_scene
    from drtvam_tpu.parallel.shard import make_mesh, render_sharded, \
        shard_ballistic_engine
    from drtvam_tpu.ops.ballistic import BallisticEngine

    devices = jax.devices()
    if devices[0].platform == "cpu" and len(devices) > 1:
        print("# NOTE: virtual CPU devices share physical cores — "
              "efficiency numbers here only exercise the harness and "
              "collectives, not real scaling.", file=sys.stderr)
    counts = args.devices or sorted({1, max(1, len(devices) // 2),
                                     len(devices)})
    scene, static, arr, inv_vol = _make_scene(
        n_patterns=args.n_patterns, res=args.res, film=args.film)
    n_rays = scene.projector.active_size() * args.spp

    def timeit(fn):
        fn()  # warm up / compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            fn()
        return (time.perf_counter() - t0) / args.reps

    base = {}
    for n in counts:
        if n > len(devices):
            print(f"# skipping {n} devices (have {len(devices)})",
                  file=sys.stderr)
            continue
        mesh = make_mesh(devices[:n])
        data = jnp.ones((scene.projector.active_size(),), jnp.float32)

        t = timeit(lambda: jax.block_until_ready(render_sharded(
            mesh, static, arr, data, inv_vol, seed=0, spp=args.spp)))
        rate = n_rays / t
        base.setdefault("wavefront", rate)
        print(json.dumps({
            "engine": "wavefront", "n_devices": n, "rays_per_s": round(rate),
            "time_s": round(t, 4),
            "efficiency": round(rate / (base["wavefront"] * n), 3)}))

        if args.n_patterns % n == 0:
            eng = shard_ballistic_engine(
                BallisticEngine(static, arr), make_mesh(devices[:n]))
            t = timeit(lambda: jax.block_until_ready(
                eng.render_vol(data, inv_vol)))
            rate = args.n_patterns / t
            base.setdefault("ballistic", rate)
            print(json.dumps({
                "engine": "ballistic", "n_devices": n,
                "angle_renders_per_s": round(rate, 1),
                "time_s": round(t, 4),
                "efficiency": round(rate / (base["ballistic"] * n), 3)}))


if __name__ == "__main__":
    main()
