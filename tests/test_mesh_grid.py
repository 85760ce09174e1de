"""Uniform-grid triangle intersection == brute-force bank sweep, and
bounded-time tracing of a 100k-triangle mesh through the wavefront
engine (the reference leans on Embree/OptiX here, README.md:97)."""
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from drtvam_tpu.ops.intersect import ray_triangles
from drtvam_tpu.ops.mesh_grid import build_tri_grid, ray_triangles_grid


def _rays(n, seed, spread=3.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check_equiv(mesh, n_rays=4096, seed=0):
    v0, e1, e2, _ = mesh.triangle_bank()
    o, d = _rays(n_rays, seed)
    tmin = jnp.full((n_rays,), 1e-4, jnp.float32)
    v0j, e1j, e2j = map(jnp.asarray, (v0, e1, e2))

    t_ref, i_ref = jax.jit(ray_triangles)(o, d, tmin, v0j, e1j, e2j)
    res, cs, ids, gb0, gb1 = build_tri_grid(v0, e1, e2)
    t_g, i_g = jax.jit(
        lambda o, d, tmin: ray_triangles_grid(
            o, d, tmin, v0j, e1j, e2j, jnp.asarray(cs), jnp.asarray(ids),
            jnp.asarray(gb0), jnp.asarray(gb1), res))(o, d, tmin)

    t_ref, t_g = np.asarray(t_ref), np.asarray(t_g)
    hit_ref = np.isfinite(t_ref)
    hit_g = np.isfinite(t_g)
    np.testing.assert_array_equal(hit_g, hit_ref)
    np.testing.assert_allclose(t_g[hit_g], t_ref[hit_ref], rtol=1e-5)
    # indices may differ only where two triangles share the hit point;
    # require distances to match there, which the line above already did
    return hit_ref.mean()


def test_grid_matches_bruteforce_gear():
    from drtvam_tpu.ops.mesh import make_hollow_gear
    mesh = make_hollow_gear(segments=240)
    frac = _check_equiv(mesh, seed=1)
    assert frac > 0.05  # sanity: rays actually hit the mesh


def test_grid_matches_bruteforce_box_hole():
    from drtvam_tpu.ops.mesh import make_box_with_hole
    mesh = make_box_with_hole((2.0, 2.0, 1.0), 0.6, segments=99)
    frac = _check_equiv(mesh, seed=2)
    assert frac > 0.1


def _uv_sphere(n_lat, n_lon, radius=1.0):
    """Watertight UV sphere with 2*(n_lat-1)*n_lon triangles — a
    uniform-triangle stand-in for a Benchy-class scanned mesh."""
    from drtvam_tpu.ops.mesh import TriMesh
    lat = np.linspace(0, np.pi, n_lat + 1)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    verts = [[0.0, 0.0, radius]]
    for th in lat[1:-1]:
        s, c = np.sin(th), np.cos(th)
        for ph in lon:
            verts.append([radius * s * np.cos(ph),
                          radius * s * np.sin(ph), radius * c])
    verts.append([0.0, 0.0, -radius])
    south = len(verts) - 1
    faces = []
    ring = lambda r, j: 1 + r * n_lon + (j % n_lon)
    for j in range(n_lon):
        faces.append([0, ring(0, j), ring(0, j + 1)])
        faces.append([south, ring(n_lat - 2, j + 1), ring(n_lat - 2, j)])
    for r in range(n_lat - 2):
        for j in range(n_lon):
            a, b = ring(r, j), ring(r, j + 1)
            c, d = ring(r + 1, j), ring(r + 1, j + 1)
            faces += [[a, c, d], [a, d, b]]
    return TriMesh(np.array(verts, np.float32),
                   np.array(faces, np.int32))


def test_grid_100k_triangles_bounded():
    """A 100k-triangle mesh traced in bounded time: build the grid,
    intersect 64k rays, and require the whole thing to stay orders of
    magnitude under the brute-force cost (which would do 100k
    Moeller-Trumbore tests per ray)."""
    mesh = _uv_sphere(251, 200)  # 2*250*200 = 100k triangles
    v0, e1, e2, _ = mesh.triangle_bank()
    assert v0.shape[0] == 100000

    t0 = time.time()
    res, cs, ids, gb0, gb1 = build_tri_grid(v0, e1, e2)
    t_build = time.time() - t0
    assert t_build < 10.0, f"grid build {t_build:.1f}s"

    n = 1 << 16
    o, d = _rays(n, 7, spread=1.5)
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    f = jax.jit(lambda o, d, tmin: ray_triangles_grid(
        o, d, tmin, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
        jnp.asarray(cs), jnp.asarray(ids), jnp.asarray(gb0),
        jnp.asarray(gb1), res))
    t, i = jax.block_until_ready(f(o, d, tmin))
    t0 = time.time()
    t, i = jax.block_until_ready(f(o, d, tmin))
    dt = time.time() - t0
    hits = np.isfinite(np.asarray(t)).mean()
    assert hits > 0.05
    # 64k rays x 100k tris brute-force ≈ 6.5e9 tests; the grid walk
    # must stay interactive on the 2-core CPU CI host
    assert dt < 30.0, f"traced 64k rays in {dt:.1f}s"

    # spot-check correctness vs brute force on a small ray subset
    o_s, d_s = o[:256], d[:256]
    tm_s = tmin[:256]
    t_ref, _ = jax.jit(ray_triangles)(
        o_s, d_s, tm_s, jnp.asarray(v0), jnp.asarray(e1),
        jnp.asarray(e2))
    t_sub = np.asarray(t)[:256]
    t_ref = np.asarray(t_ref)
    np.testing.assert_array_equal(np.isfinite(t_sub),
                                  np.isfinite(t_ref))
    m = np.isfinite(t_ref)
    np.testing.assert_allclose(t_sub[m], t_ref[m], rtol=1e-5)
