"""Triangle-mesh utilities: PLY I/O, procedural phantoms, voxelization.

The reference consumes PLY meshes through Mitsuba's loader and voxelizes
targets by casting one ray per voxel center and testing for a backface
hit (reference: utils.py:83-128 `discretize`, sensor.py:47-110
`compute_volume`). Here meshes are plain (V,3)/(F,3) numpy arrays on the
host; the device-side triangle bank is (v0, e1, e2, n) float32 arrays.
"""
from __future__ import annotations

import struct

import numpy as np


class TriMesh:
    """Host-side triangle mesh: vertices (V,3) f32, faces (F,3) int32."""

    def __init__(self, vertices, faces):
        self.vertices = np.asarray(vertices, np.float32)
        self.faces = np.asarray(faces, np.int32)

    @property
    def bbox(self):
        return self.vertices.min(0), self.vertices.max(0)

    def transformed(self, scale=1.0, translate=(0.0, 0.0, 0.0), rot=None):
        v = self.vertices
        if rot is not None:
            v = v @ np.asarray(rot, np.float32).T
        v = v * np.float32(scale) + np.asarray(translate, np.float32)
        return TriMesh(v, self.faces)

    def transformed_matrix(self, to_world):
        """Apply a homogeneous 4x4 to_world matrix to the vertices."""
        M = np.asarray(to_world, np.float64)
        v = self.vertices @ M[:3, :3].T + M[:3, 3]
        return TriMesh(v, self.faces)

    def triangle_bank(self):
        """Return (v0, e1, e2, n) float32 arrays with geometric normals."""
        v = self.vertices
        f = self.faces
        v0 = v[f[:, 0]]
        e1 = v[f[:, 1]] - v0
        e2 = v[f[:, 2]] - v0
        n = np.cross(e1, e2)
        ln = np.linalg.norm(n, axis=-1, keepdims=True)
        n = n / np.maximum(ln, 1e-20)
        return (v0.astype(np.float32), e1.astype(np.float32),
                e2.astype(np.float32), n.astype(np.float32))


# --- PLY I/O ---------------------------------------------------------------

def load_ply(path):
    """Minimal PLY reader (ascii + binary_little_endian, tri faces)."""
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header") + len(b"end_header")
    # consume trailing newline
    while data[header_end:header_end + 1] in (b"\r", b"\n"):
        header_end += 1
    header = data[:header_end].decode("latin1")
    lines = [l.strip() for l in header.splitlines() if l.strip()]
    fmt = None
    n_vert = n_face = 0
    vert_props = []
    cur = None
    for l in lines:
        parts = l.split()
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            cur = parts[1]
            if cur == "vertex":
                n_vert = int(parts[2])
            elif cur == "face":
                n_face = int(parts[2])
        elif parts[0] == "property" and cur == "vertex":
            vert_props.append((parts[1], parts[-1]))

    type_map = {"float": ("f", 4), "float32": ("f", 4),
                "double": ("d", 8), "float64": ("d", 8),
                "uchar": ("B", 1), "uint8": ("B", 1),
                "char": ("b", 1), "int8": ("b", 1),
                "short": ("h", 2), "ushort": ("H", 2),
                "int": ("i", 4), "int32": ("i", 4),
                "uint": ("I", 4), "uint32": ("I", 4)}

    if fmt == "ascii":
        rows = data[header_end:].decode("latin1").split()
        k = 0
        stride = len(vert_props)
        vals = np.array(rows[:n_vert * stride], np.float64)
        k = n_vert * stride
        verts = vals.reshape(n_vert, stride)[:, :3]
        faces = []
        i = k
        for _ in range(n_face):
            cnt = int(rows[i])
            idx = [int(x) for x in rows[i + 1:i + 1 + cnt]]
            i += 1 + cnt
            for j in range(1, cnt - 1):
                faces.append([idx[0], idx[j], idx[j + 1]])
        return TriMesh(verts, np.array(faces, np.int32))

    if fmt != "binary_little_endian":
        raise ValueError(f"Unsupported PLY format: {fmt}")

    # binary little endian
    body = data[header_end:]
    fmt_str = "<" + "".join(type_map[t][0] for t, _ in vert_props)
    vsize = struct.calcsize(fmt_str)
    verts = np.zeros((n_vert, 3), np.float32)
    off = 0
    arr = np.frombuffer(body, dtype=np.uint8)
    # fast path: homogeneous float32 properties
    if all(t == "float" or t == "float32" for t, _ in vert_props):
        stride = len(vert_props)
        flat = np.frombuffer(body[:n_vert * vsize], dtype="<f4")
        verts = flat.reshape(n_vert, stride)[:, :3].astype(np.float32)
        off = n_vert * vsize
    else:
        for i in range(n_vert):
            vals = struct.unpack_from(fmt_str, body, off)
            verts[i] = vals[:3]
            off += vsize
    del arr
    faces = []
    pos = off
    for _ in range(n_face):
        cnt = body[pos]
        pos += 1
        idx = struct.unpack_from(f"<{cnt}i", body, pos)
        pos += 4 * cnt
        for j in range(1, cnt - 1):
            faces.append([idx[0], idx[j], idx[j + 1]])
    return TriMesh(verts, np.array(faces, np.int32))


def load_obj(path):
    """Minimal Wavefront OBJ reader (v / f records, polygon fans).
    The reference accepts ply and obj targets (utils.py:145-147)."""
    verts, faces = [], []
    with open(path, "r") as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                # "f v", "f v/vt", "f v/vt/vn", "f v//vn"; 1-based,
                # negatives count from the end
                idx = []
                for p in parts[1:]:
                    i = int(p.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for j in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[j], idx[j + 1]])
    if not verts or not faces:
        raise ValueError(f"OBJ file '{path}' has no triangles.")
    return TriMesh(np.asarray(verts, np.float32),
                   np.asarray(faces, np.int32))


def load_mesh(path):
    """Load a triangle mesh by extension (ply | obj)."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "ply":
        return load_ply(path)
    if ext == "obj":
        return load_obj(path)
    raise ValueError(f"Unsupported extension: '{ext}', only PLY and OBJ "
                     "meshes are supported.")


def save_ply(mesh: TriMesh, path):
    v, f = mesh.vertices, mesh.faces
    with open(path, "wb") as fh:
        fh.write(b"ply\nformat binary_little_endian 1.0\n")
        fh.write(f"element vertex {len(v)}\n".encode())
        fh.write(b"property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element face {len(f)}\n".encode())
        fh.write(b"property list uchar int vertex_indices\nend_header\n")
        fh.write(v.astype("<f4").tobytes())
        rec = np.empty(len(f), dtype=[("n", "u1"), ("i", "<i4", 3)])
        rec["n"] = 3
        rec["i"] = f
        fh.write(rec.tobytes())


# --- procedural phantoms ---------------------------------------------------

def make_box(half, center=(0, 0, 0)):
    """Axis-aligned box mesh with outward normals."""
    hx, hy, hz = half
    cx, cy, cz = center
    v = np.array([[sx * hx + cx, sy * hy + cy, sz * hz + cz]
                  for sz in (-1, 1) for sy in (-1, 1) for sx in (-1, 1)],
                 np.float32)
    # 8 vertices indexed bit-wise (x fastest). Faces CCW seen from outside.
    quads = [
        (0, 2, 3, 1),  # z-
        (4, 5, 7, 6),  # z+
        (0, 1, 5, 4),  # y-
        (2, 6, 7, 3),  # y+
        (0, 4, 6, 2),  # x-
        (1, 3, 7, 5),  # x+
    ]
    faces = []
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    return TriMesh(v, np.array(faces, np.int32))


def make_open_box(half_outer, wall, open_top=True):
    """A 5-sided cuvette as two nested open boxes (outer + inner shell).

    Returns (outer, inner) meshes, BOTH with outward-pointing normals —
    the reference's custom-vial convention (verified against its
    cuvette_inner.ply fixture: the printing medium is the inner mesh's
    interior under the outward-normal convention, geometry.py:98-138).
    """
    ho = np.asarray(half_outer, np.float64)
    outer = make_box(ho)
    hi = ho - wall
    if open_top:
        # inner cavity extends past the top so the box is open
        inner = make_box((hi[0], hi[1], ho[2] + wall),
                         center=(0, 0, wall))
    else:
        inner = make_box(hi)
    return outer, inner


def make_box_with_hole(half, hole_radius, hole_center_xy=(0.0, 0.0),
                       segments=64):
    """Box with a cylindrical through-hole along z (the reference's
    `box_hole.ply` e2e phantom, reconstructed procedurally).

    Watertight: top/bottom annulus-to-square rings, 4 side walls, and the
    interior cylinder wall (normals pointing into the hole).
    """
    hx, hy, hz = half
    cx, cy = hole_center_xy
    th = np.linspace(0.0, 2.0 * np.pi, segments, endpoint=False)
    circ = np.stack([cx + hole_radius * np.cos(th),
                     cy + hole_radius * np.sin(th)], -1)

    # boundary of the square, one point per circle point: project radially
    # outward FROM THE HOLE CENTER so off-center (even wall-tangent) holes
    # produce a valid annulus pairing.
    sq = []
    for x, y in circ:
        dx, dy = x - cx, y - cy
        ts = []
        if dx > 1e-12:
            ts.append((hx - x) / dx)
        elif dx < -1e-12:
            ts.append((-hx - x) / dx)
        if dy > 1e-12:
            ts.append((hy - y) / dy)
        elif dy < -1e-12:
            ts.append((-hy - y) / dy)
        t = min((t for t in ts if t >= 0.0), default=0.0)
        sq.append([x + t * dx, y + t * dy])
    sq = np.array(sq)

    verts = []
    faces = []

    def add(v):
        verts.append(v)
        return len(verts) - 1

    # rings: bottom circle, bottom square, top circle, top square
    cb = [add([x, y, -hz]) for x, y in circ]
    sb = [add([x, y, -hz]) for x, y in sq]
    ct = [add([x, y, hz]) for x, y in circ]
    st = [add([x, y, hz]) for x, y in sq]

    n = segments
    for i in range(n):
        j = (i + 1) % n
        # bottom annulus (normal -z): CCW when viewed from below (-z)
        faces += [[cb[i], sb[i], sb[j]], [cb[i], sb[j], cb[j]]]
        # top annulus (normal +z)
        faces += [[ct[i], st[j], st[i]], [ct[i], ct[j], st[j]]]
        # inner cylinder wall (normal points toward hole axis)
        faces += [[cb[i], cb[j], ct[j]], [cb[i], ct[j], ct[i]]]
        # outer side wall (normal outward)
        faces += [[sb[i], st[i], st[j]], [sb[i], st[j], sb[j]]]

    return TriMesh(np.array(verts, np.float32), np.array(faces, np.int32))


def make_box_tube(hx, hy, z0, z1, flip=False):
    """Open rectangular tube (4 side walls, no caps) — the shape of the
    reference's cuvette_outer/inner.ply test fixtures (8 triangles).
    Normals point outward — the reference's inner cuvette wall ALSO uses
    outward normals (verified against cuvette_inner.ply): the printing
    medium is the mesh interior under the outward-normal convention."""
    v = np.array([[sx * hx, sy * hy, z]
                  for z in (z0, z1) for sy in (-1, 1) for sx in (-1, 1)],
                 np.float32)
    # bottom ring 0..3 (x fastest), top ring 4..7
    quads = [
        (0, 1, 5, 4),  # y- wall
        (3, 2, 6, 7),  # y+ wall
        (1, 3, 7, 5),  # x+ wall
        (2, 0, 4, 6),  # x- wall
    ]
    faces = []
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    f = np.array(faces, np.int32)
    if flip:
        f = f[:, ::-1]
    return TriMesh(v, f)


def make_hollow_gear(r_out=1.0, r_root=0.78, r_hole=0.35, n_teeth=12,
                     half_height=0.5, segments=360, steepness=4.0):
    """Hollow gear: an extruded annulus between a toothed outer profile
    and a circular bore (procedural stand-in for the reference's
    `hollow_gear.ply` double-cylindrical e2e target,
    tests/test_optimization.py:18-39).

    The outer radius follows a trapezoidal tooth wave
    r(th) = r_root + (r_out - r_root) * clip(steepness*sin(n_teeth*th))
    sampled at `segments` angles; the bore uses the same angular
    sampling so the top/bottom annulus caps pair 1:1. Watertight, same
    topology as make_box_with_hole.
    """
    th = np.linspace(0.0, 2.0 * np.pi, segments, endpoint=False)
    wave = np.clip(steepness * np.sin(n_teeth * th), -1.0, 1.0)
    r = r_root + (r_out - r_root) * (0.5 + 0.5 * wave)
    outer = np.stack([r * np.cos(th), r * np.sin(th)], -1)
    inner = np.stack([r_hole * np.cos(th), r_hole * np.sin(th)], -1)

    verts = []

    def add(v):
        verts.append(v)
        return len(verts) - 1

    hz = half_height
    cb = [add([x, y, -hz]) for x, y in inner]   # bottom bore ring
    sb = [add([x, y, -hz]) for x, y in outer]   # bottom gear ring
    ct = [add([x, y, hz]) for x, y in inner]    # top bore ring
    st = [add([x, y, hz]) for x, y in outer]    # top gear ring

    faces = []
    n = segments
    for i in range(n):
        j = (i + 1) % n
        # bottom annulus (normal -z)
        faces += [[cb[i], sb[i], sb[j]], [cb[i], sb[j], cb[j]]]
        # top annulus (normal +z)
        faces += [[ct[i], st[j], st[i]], [ct[i], ct[j], st[j]]]
        # bore wall (normal toward the axis)
        faces += [[cb[i], cb[j], ct[j]], [cb[i], ct[j], ct[i]]]
        # outer gear wall (normal outward)
        faces += [[sb[i], st[i], st[j]], [sb[i], st[j], sb[j]]]

    return TriMesh(np.array(verts, np.float32), np.array(faces, np.int32))


def make_cylinder_shell(radius, z0, z1, segments=96, flip=False):
    """Closed-tube triangle mesh approximating a cylinder side wall."""
    th = np.linspace(0.0, 2.0 * np.pi, segments, endpoint=False)
    ring = np.stack([radius * np.cos(th), radius * np.sin(th)], -1)
    verts = [[x, y, z0] for x, y in ring] + [[x, y, z1] for x, y in ring]
    faces = []
    n = segments
    for i in range(n):
        j = (i + 1) % n
        faces += [[i, j, n + j], [i, n + j, n + i]]
    f = np.array(faces, np.int32)
    if flip:
        f = f[:, ::-1]
    return TriMesh(np.array(verts, np.float32), f)
