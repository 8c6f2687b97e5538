"""Wavefront OBJ loader (reference scenes: veach-ajar/bidir models/*.obj)."""
from __future__ import annotations

import numpy as np


def read(path):
    """Load an OBJ -> dict with vertices (V,3), normals, uvs, and per-corner
    indexed triangle arrays (T,3) for each attribute (-1 where absent).
    Polygon faces are fan-triangulated."""
    vs, vns, vts = [], [], []
    fv, fn, ft = [], [], []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                vs.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("vn "):
                parts = line.split()
                vns.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("vt "):
                parts = line.split()
                vts.append([float(parts[1]), float(parts[2])])
            elif line.startswith("f "):
                corners = line.split()[1:]
                idx = []
                for c in corners:
                    toks = c.split("/")
                    vi = int(toks[0])
                    ti = int(toks[1]) if len(toks) > 1 and toks[1] else 0
                    ni = int(toks[2]) if len(toks) > 2 and toks[2] else 0
                    idx.append((vi, ti, ni))
                for k in range(1, len(idx) - 1):
                    tri = (idx[0], idx[k], idx[k + 1])
                    fv.append([t[0] for t in tri])
                    ft.append([t[1] for t in tri])
                    fn.append([t[2] for t in tri])

    def fix(indices, count):
        a = np.asarray(indices, dtype=np.int64)
        a = np.where(a > 0, a - 1, np.where(a < 0, a + count, -1))
        return a.astype(np.int32)

    vs = np.asarray(vs, dtype=np.float32).reshape(-1, 3)
    vns = np.asarray(vns, dtype=np.float32).reshape(-1, 3)
    vts = np.asarray(vts, dtype=np.float32).reshape(-1, 2)
    return {
        "positions": vs,
        "normals": vns,
        "uvs": vts,
        "tri_pos": fix(fv, len(vs)),
        "tri_uv": fix(ft, len(vts)),
        "tri_normal": fix(fn, len(vns)),
    }
