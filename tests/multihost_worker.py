"""Worker process for tests/test_multihost.py.

Invoked as: python multihost_worker.py <process_id> <num_processes>
<coordinator_port> <out_dir>

Each process initializes jax.distributed (gloo CPU collectives), builds
the same tiny scene, renders it sharded over the GLOBAL mesh (all
processes' devices), and process 0 writes dose + pattern-gradient
arrays for the parent test to compare against a single-process render.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    out_dir = sys.argv[4]

    from drtvam_tpu.parallel import multihost

    assert multihost.init_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np
    import jax.numpy as jnp
    from drtvam_tpu.parallel import shard
    from tests.scene_fixtures import tiny_scattering_scene

    static, arr, active_data, inv_vol = tiny_scattering_scene(out_dir)
    mesh = multihost.global_mesh()

    dose = shard.render_sharded(mesh, static, arr, active_data, inv_vol,
                                seed=7, spp=2)
    loss = jnp.sum(dose * dose)
    grad = jax.grad(lambda p: jnp.sum(
        shard.render_sharded(mesh, static, arr, p, inv_vol,
                             seed=7, spp=2) ** 2))(active_data)
    dose, grad = jax.block_until_ready((dose, grad))

    if multihost.is_coordinator():
        np.save(os.path.join(out_dir, "dose_mh.npy"), np.asarray(dose))
        np.save(os.path.join(out_dir, "grad_mh.npy"), np.asarray(grad))
    print(f"worker {pid}: ok, {jax.device_count()} global devices",
          flush=True)


if __name__ == "__main__":
    main()
