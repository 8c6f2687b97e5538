"""Perspective camera: film-sample -> world ray generation (jittable).

Mitsuba conventions: ``to_world`` maps camera space (x = 'left', y = up,
z = viewing direction; see transforms.look_at) to world; ``fov`` is the
full angle around ``fov_axis`` (default x). Film coordinates are
``[0,1]^2`` with (0,0) the top-left pixel corner.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..core.records import Ray


@struct.dataclass
class Camera:
    to_world: jnp.ndarray  # (4,4) float32
    tan_x: jnp.ndarray     # scalar: tan(fov_x / 2)
    tan_y: jnp.ndarray
    width: int = struct.field(pytree_node=False, default=256)
    height: int = struct.field(pytree_node=False, default=256)


def make_camera(sensor) -> Camera:
    w, h = sensor.width, sensor.height
    t = np.tan(np.deg2rad(sensor.fov) / 2.0)
    if sensor.fov_axis == "x":
        tx, ty = t, t * h / w
    elif sensor.fov_axis == "y":
        tx, ty = t * w / h, t
    else:  # 'smaller' / 'larger' / 'diagonal' not used by the corpus
        tx, ty = t, t * h / w
    return Camera(
        to_world=jnp.asarray(sensor.to_world, jnp.float32),
        tan_x=jnp.float32(tx),
        tan_y=jnp.float32(ty),
        width=w,
        height=h,
    )


def generate_rays(cam: Camera, sx, sy) -> Ray:
    """Film samples (sx, sy) in [0,1]^2 (y down) -> world rays.

    Camera x axis points 'left', so image-right pixels need negative
    camera-space x; image-top needs positive y.
    """
    dx = (1.0 - 2.0 * sx) * cam.tan_x
    dy = (1.0 - 2.0 * sy) * cam.tan_y
    d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    r = cam.to_world[:3, :3]
    d = jnp.einsum("ij,...j->...i", r, d_cam)
    o = jnp.broadcast_to(cam.to_world[:3, 3], d.shape)
    return Ray(o=o, d=d)
