"""Shape -> triangle-soup conversion (host side, numpy).

Analytic rectangles/cubes become triangles (Mitsuba local conventions:
rectangle = [-1,1]^2 at z=0 with +z normal, cube = [-1,1]^3); meshes load
from OBJ / Mitsuba-serialized files. Spheres stay analytic (second primitive
class) — exact intersection + cone sampling beat triangulation for the tiny
emitter spheres in veach-mis.
"""
from __future__ import annotations

import numpy as np

from ..io import obj as obj_io
from ..io import serialized as ser_io

# Unit rectangle: two triangles, CCW, normal +z.
_RECT_P = np.array(
    [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], dtype=np.float64
)
_RECT_TRIS = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
_RECT_UV = (_RECT_P[:, :2] + 1.0) * 0.5

# Unit cube: 6 faces x 2 triangles, outward normals.
def _cube_mesh():
    ps, uvs, tris = [], [], []
    for axis in range(3):
        for sgn in (-1.0, 1.0):
            base = len(ps)
            u_axis, v_axis = (axis + 1) % 3, (axis + 2) % 3
            for du, dv in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
                p = np.zeros(3)
                p[axis] = sgn
                p[u_axis] = du * sgn  # keep winding CCW seen from outside
                p[v_axis] = dv
                ps.append(p)
                uvs.append([(du + 1) / 2, (dv + 1) / 2])
            tris.append([base, base + 1, base + 2])
            tris.append([base, base + 2, base + 3])
    return (
        np.asarray(ps, dtype=np.float64),
        np.asarray(uvs, dtype=np.float64),
        np.asarray(tris, dtype=np.int32),
    )


_CUBE_P, _CUBE_UV, _CUBE_TRIS = _cube_mesh()


class TriangleSoup:
    """Accumulates world-space triangles with per-corner attributes."""

    def __init__(self):
        self.v0, self.v1, self.v2 = [], [], []
        self.n0, self.n1, self.n2 = [], [], []
        self.uv0, self.uv1, self.uv2 = [], [], []
        self.mat, self.emitter, self.shape = [], [], []

    def add_mesh(
        self, positions, tris, to_world, mat_id, emitter_id, shape_id,
        normals=None, tri_normals=None, uvs=None, tri_uvs=None,
        face_normals=False,
    ):
        m = np.asarray(to_world, dtype=np.float64)
        p = positions @ m[:3, :3].T + m[:3, 3]
        nrm_m = np.linalg.inv(m[:3, :3]).T  # normal matrix
        v0, v1, v2 = p[tris[:, 0]], p[tris[:, 1]], p[tris[:, 2]]
        gn = np.cross(v1 - v0, v2 - v0)
        gl = np.linalg.norm(gn, axis=-1, keepdims=True)
        gn = gn / np.maximum(gl, 1e-20)
        if face_normals or normals is None or len(normals) == 0 or tri_normals is None:
            n0 = n1 = n2 = gn
        else:
            ns = normals @ nrm_m.T
            ns = ns / np.maximum(np.linalg.norm(ns, axis=-1, keepdims=True), 1e-20)
            ok = tri_normals >= 0
            n0 = np.where(ok[:, 0:1], ns[np.maximum(tri_normals[:, 0], 0)], gn)
            n1 = np.where(ok[:, 1:2], ns[np.maximum(tri_normals[:, 1], 0)], gn)
            n2 = np.where(ok[:, 2:3], ns[np.maximum(tri_normals[:, 2], 0)], gn)
        if uvs is None or len(uvs) == 0 or tri_uvs is None:
            z = np.zeros((len(tris), 2))
            u0 = u1 = u2 = z
        else:
            ok = tri_uvs >= 0
            z = np.zeros(2)
            u0 = np.where(ok[:, 0:1], uvs[np.maximum(tri_uvs[:, 0], 0)], z)
            u1 = np.where(ok[:, 1:2], uvs[np.maximum(tri_uvs[:, 1], 0)], z)
            u2 = np.where(ok[:, 2:3], uvs[np.maximum(tri_uvs[:, 2], 0)], z)
        t = len(tris)
        self.v0.append(v0); self.v1.append(v1); self.v2.append(v2)
        self.n0.append(n0); self.n1.append(n1); self.n2.append(n2)
        self.uv0.append(u0); self.uv1.append(u1); self.uv2.append(u2)
        self.mat.append(np.full(t, mat_id, np.int32))
        self.emitter.append(np.full(t, emitter_id, np.int32))
        self.shape.append(np.full(t, shape_id, np.int32))

    def finalize(self):
        cat = lambda xs, d: (
            np.concatenate(xs, axis=0).astype(d)
            if xs
            else np.zeros((0, 3) if d == np.float32 else (0,), d)
        )
        out = {
            "v0": cat(self.v0, np.float32),
            "v1": cat(self.v1, np.float32),
            "v2": cat(self.v2, np.float32),
            "n0": cat(self.n0, np.float32),
            "n1": cat(self.n1, np.float32),
            "n2": cat(self.n2, np.float32),
            "mat": np.concatenate(self.mat) if self.mat else np.zeros(0, np.int32),
            "emitter": np.concatenate(self.emitter)
            if self.emitter
            else np.zeros(0, np.int32),
            "shape": np.concatenate(self.shape)
            if self.shape
            else np.zeros(0, np.int32),
        }
        for k in ("uv0", "uv1", "uv2"):
            xs = getattr(self, k)
            out[k] = (
                np.concatenate(xs, axis=0).astype(np.float32)
                if xs
                else np.zeros((0, 2), np.float32)
            )
        return out


def build_geometry(desc):
    """SceneDesc -> (triangle dict, sphere dict, shape->emitter info)."""
    soup = TriangleSoup()
    sph_c, sph_r, sph_mat, sph_em, sph_shape = [], [], [], [], []
    for si, sh in enumerate(desc.shapes):
        mat_id = sh._mat_id  # assigned by compile_scene
        em_id = sh._emitter_id
        if sh.kind == "rectangle":
            soup.add_mesh(
                _RECT_P, _RECT_TRIS, sh.to_world, mat_id, em_id, si,
                uvs=_RECT_UV, tri_uvs=_RECT_TRIS,
            )
        elif sh.kind == "cube":
            soup.add_mesh(
                _CUBE_P, _CUBE_TRIS, sh.to_world, mat_id, em_id, si,
                uvs=_CUBE_UV, tri_uvs=_CUBE_TRIS,
            )
        elif sh.kind == "sphere":
            m = sh.to_world
            c = np.asarray(sh.center, np.float64)
            c = c @ m[:3, :3].T + m[:3, 3]
            scale = np.cbrt(abs(np.linalg.det(m[:3, :3])))
            sph_c.append(c)
            sph_r.append(sh.radius * scale)
            sph_mat.append(mat_id)
            sph_em.append(em_id)
            sph_shape.append(si)
        elif sh.kind == "obj":
            mesh = obj_io.read(desc.path / sh.filename)
            soup.add_mesh(
                mesh["positions"], mesh["tri_pos"], sh.to_world, mat_id, em_id,
                si, normals=mesh["normals"], tri_normals=mesh["tri_normal"],
                uvs=mesh["uvs"], tri_uvs=mesh["tri_uv"],
                face_normals=sh.face_normals,
            )
        elif sh.kind == "serialized":
            mesh = ser_io.read(desc.path / sh.filename, sh.shape_index)
            soup.add_mesh(
                mesh["positions"], mesh["triangles"], sh.to_world, mat_id,
                em_id, si, normals=mesh["normals"],
                tri_normals=mesh["triangles"] if mesh["normals"] is not None else None,
                uvs=mesh["uvs"],
                tri_uvs=mesh["triangles"] if mesh["uvs"] is not None else None,
                face_normals=sh.face_normals,
            )
        else:
            raise NotImplementedError(f"shape kind {sh.kind}")
    tris = soup.finalize()
    spheres = {
        "center": np.asarray(sph_c, np.float32).reshape(-1, 3),
        "radius": np.asarray(sph_r, np.float32).reshape(-1),
        "mat": np.asarray(sph_mat, np.int32).reshape(-1),
        "emitter": np.asarray(sph_em, np.int32).reshape(-1),
        "shape": np.asarray(sph_shape, np.int32).reshape(-1),
    }
    return tris, spheres
