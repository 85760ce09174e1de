"""Test harness: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (mirrors the reference's llvm_ad_mono CPU variant
role, test_integrators.py:69)."""
import os

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests must
# run on the host CPU with 8 virtual devices, so override rather than
# setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the march/backproject kernels dominate test
# wall-clock; repeat runs skip their XLA compiles entirely
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def box_hole_mesh(tmp_path_factory):
    """Procedural stand-in for the reference's tests/files/box_hole.ply:
    a box with a cylindrical through-hole."""
    from drtvam_tpu.ops.mesh import make_box_with_hole, save_ply
    path = tmp_path_factory.mktemp("meshes") / "box_hole.ply"
    mesh = make_box_with_hole((2.0, 2.0, 1.0), 0.5, segments=99)
    save_ply(mesh, str(path))
    return str(path)
