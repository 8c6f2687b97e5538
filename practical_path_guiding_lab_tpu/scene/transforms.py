"""4x4 transform composition from Mitsuba-XML transform elements."""
from __future__ import annotations

import numpy as np


def identity():
    return np.eye(4, dtype=np.float64)


def translate(x=0.0, y=0.0, z=0.0):
    m = identity()
    m[:3, 3] = [x, y, z]
    return m


def scale(x=1.0, y=1.0, z=1.0):
    m = identity()
    m[0, 0], m[1, 1], m[2, 2] = x, y, z
    return m


def rotate(axis, angle_deg):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)
    x, y, z = axis
    r = np.array(
        [
            [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
            [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
            [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
        ]
    )
    m = identity()
    m[:3, :3] = r
    return m


def look_at(origin, target, up):
    """Mitsuba look_at: camera +z = viewing direction, +x = 'left'."""
    origin = np.asarray(origin, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    d = target - origin
    d = d / np.linalg.norm(d)
    left = np.cross(up, d)
    left = left / np.linalg.norm(left)
    new_up = np.cross(d, left)
    m = identity()
    m[:3, 0] = left
    m[:3, 1] = new_up
    m[:3, 2] = d
    m[:3, 3] = origin
    return m


def from_matrix_string(s: str):
    vals = [float(v) for v in s.replace(",", " ").split()]
    if len(vals) == 16:
        return np.array(vals, dtype=np.float64).reshape(4, 4)
    if len(vals) == 9:
        m = identity()
        m[:3, :3] = np.array(vals, dtype=np.float64).reshape(3, 3)
        return m
    raise ValueError(f"bad matrix value: {s}")


def parse_transform(elem) -> np.ndarray:
    """Compose a <transform> element's children left-multiplied in order
    (each successive op premultiplies, as in Mitsuba)."""
    m = identity()
    for child in elem:
        tag = child.tag
        if tag == "matrix":
            op = from_matrix_string(child.get("value"))
        elif tag == "translate":
            op = translate(
                float(child.get("x", 0)), float(child.get("y", 0)), float(child.get("z", 0))
            )
        elif tag == "scale":
            if child.get("value") is not None:
                vals = [float(v) for v in child.get("value").replace(",", " ").split()]
                if len(vals) == 1:
                    op = scale(vals[0], vals[0], vals[0])
                else:
                    op = scale(*vals)
            else:
                op = scale(
                    float(child.get("x", 1)), float(child.get("y", 1)), float(child.get("z", 1))
                )
        elif tag == "rotate":
            if child.get("value") is not None:
                axis = [float(v) for v in child.get("value").replace(",", " ").split()]
            else:
                axis = [float(child.get("x", 0)), float(child.get("y", 0)), float(child.get("z", 0))]
            op = rotate(axis, float(child.get("angle", 0)))
        elif tag == "lookat":
            def vec(s):
                return [float(v) for v in s.replace(",", " ").split()]

            op = look_at(vec(child.get("origin")), vec(child.get("target")), vec(child.get("up")))
        else:
            raise NotImplementedError(f"transform op <{tag}>")
        m = op @ m
    return m
