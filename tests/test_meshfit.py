"""get_mesh_transform / min_enclosing_circle (reference utils.py:130-190)."""
import numpy as np
import pytest

from drtvam_tpu.utils.meshfit import min_enclosing_circle, get_mesh_transform
from drtvam_tpu.ops.mesh import make_box, save_ply, load_obj, TriMesh


def test_mec_exact_square():
    pts = np.array([[0, 0], [2, 0], [0, 2], [2, 2]], float)
    c, r = min_enclosing_circle(pts)
    assert np.allclose(c, [1, 1], atol=1e-9)
    assert np.isclose(r, np.sqrt(2), atol=1e-9)


def test_mec_collinear_and_interior():
    pts = np.array([[0, 0], [1, 0], [4, 0], [2, 0]], float)
    c, r = min_enclosing_circle(pts)
    assert np.allclose(c, [2, 0], atol=1e-9)
    assert np.isclose(r, 2.0, atol=1e-9)


def test_mec_random_contains_all():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(500, 2))
    c, r = min_enclosing_circle(pts)
    d = np.linalg.norm(pts - c, axis=1)
    assert d.max() <= r * (1 + 1e-9) + 1e-9
    # minimality: at least 2 support points on the boundary
    assert np.count_nonzero(d >= r - 1e-6) >= 2


def test_transform_tall_z_tight_fit(tmp_path):
    # 1 x 2 x 4 box: tallest axis already z -> no rotation
    mesh = make_box((0.5, 1.0, 2.0), center=(3.0, -1.0, 5.0))
    p = str(tmp_path / "box.ply")
    save_ply(mesh, p)
    M = get_mesh_transform(p, print_size=(10.0, 10.0, 8.0))
    out = mesh.transformed_matrix(M)
    bmin, bmax = out.bbox
    # scale = min(8/4, 5/r) with r = sqrt(0.5^2 + 1^2)
    r = np.sqrt(0.5 ** 2 + 1.0 ** 2)
    s = min(8.0 / 4.0, 5.0 / r)
    assert np.isclose(float(bmax[2] - bmin[2]), 4.0 * s, rtol=1e-5)
    # centered at origin
    assert np.allclose(0.5 * (bmin + bmax), 0.0, atol=1e-5)


def test_transform_rotates_tallest_axis_to_z(tmp_path):
    mesh = make_box((3.0, 1.0, 0.5))  # tallest along x
    p = str(tmp_path / "wide.ply")
    save_ply(mesh, p)
    M = get_mesh_transform(p, print_size=(4.0, 4.0, 4.0))
    out = mesh.transformed_matrix(M)
    bmin, bmax = out.bbox
    ext = bmax - bmin
    assert np.argmax(ext) == 2  # tallest now along z
    assert float(ext[2]) <= 4.0 + 1e-5
    xy = out.vertices[:, :2]
    assert np.linalg.norm(xy, axis=1).max() <= 2.0 * np.sqrt(2) + 1e-4


def test_transform_explicit_size(tmp_path):
    mesh = make_box((1.0, 1.0, 2.0), center=(5.0, 5.0, 5.0))
    p = str(tmp_path / "b.ply")
    save_ply(mesh, p)
    M = get_mesh_transform(p, print_size=(10.0, 10.0, 10.0), size=2.0)
    out = mesh.transformed_matrix(M)
    bmin, bmax = out.bbox
    assert np.isclose(float((bmax - bmin).max()), 2.0, rtol=1e-6)
    assert np.allclose(0.5 * (bmin + bmax), 0.0, atol=1e-5)
    with pytest.raises(ValueError):
        get_mesh_transform(p, print_size=(1.0, 1.0, 1.0), size=2.0)


def test_obj_roundtrip(tmp_path):
    p = str(tmp_path / "tri.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
                "f 1 2 3\nf 1/1 2/2 4/4\nf -4//1 -1//1 -2//1\n")
    m = load_obj(p)
    assert m.vertices.shape == (4, 3)
    assert m.faces.shape == (3, 3)
    assert m.faces[2].tolist() == [0, 3, 2]
