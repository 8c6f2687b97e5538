"""Scene parsing / compilation tests over the whole bundled corpus."""
import warnings

import numpy as np
import pytest

from practical_path_guiding_lab_tpu.scene import load_file
from practical_path_guiding_lab_tpu.scene.scene import compile_scene

SCENES = "/root/reference/scenes"

CORPUS = [
    ("cornell-box", "scene.xml"),
    ("cornell-box", "cornell-box-empty.xml"),
    ("teapot", "scene_v3.xml"),
    ("veach-mis", "scene.xml"),
    ("veach-bidir", "scene.xml"),
    ("veach-ajar", "scene.xml"),
    ("torus", "scene.xml"),
    ("teapot", "teapot_compact.xml"),
]


@pytest.mark.parametrize("name,fn", CORPUS)
def test_compile_all_scenes(name, fn):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s = compile_scene(load_file(f"{SCENES}/{name}/{fn}"))
    assert s.num_tris + s.spheres["center"].shape[0] > 0
    assert s.emitters.num >= 1
    assert np.all(np.asarray(s.bbox_hi) >= np.asarray(s.bbox_lo))


def test_defaults_and_overrides():
    d = load_file(f"{SCENES}/cornell-box/scene.xml", resx=320, resy=200, spp=7)
    assert d.sensor.width == 320 and d.sensor.height == 200
    assert d.sensor.spp == 7
    assert d.max_depth == 30
    assert d.integrator == "path_guiding_integrator"


def test_cornell_materials():
    d = load_file(f"{SCENES}/cornell-box/scene.xml")
    # 8 shapes, all twosided diffuse; light has zero reflectance
    assert len(d.shapes) == 8
    assert all(sh.bsdf.kind == "diffuse" and sh.bsdf.twosided for sh in d.shapes)
    light = [sh for sh in d.shapes if sh.emitter_radiance is not None]
    assert len(light) == 1
    assert light[0].emitter_radiance == (17.0, 12.0, 4.0)


def test_veach_mis_spheres():
    d = load_file(f"{SCENES}/veach-mis/scene.xml")
    spheres = [sh for sh in d.shapes if sh.kind == "sphere"]
    assert len(spheres) == 3
    assert {s.radius for s in spheres} == {1.0, 0.5, 0.05}
    s = compile_scene(d)
    assert s.emitters.num == 3
    assert s.max_depth == 3


def test_torus_parsing():
    d = load_file(f"{SCENES}/torus/scene.xml")
    kinds = {sh.bsdf.kind for sh in d.shapes}
    assert "roughdielectric" in kinds and "conductor" in kinds
    assert d.emitters[0].kind == "directional"
    assert d.sensor.rfilter == "gaussian"
    assert d.sensor.fov_axis == "x"


def test_teapot_envmap():
    s = compile_scene(load_file(f"{SCENES}/teapot/teapot_compact.xml"))
    assert s.emitters.has_envmap
    assert s.emitters.env_image.shape == (512, 1024, 3)


def test_camera_projection_roundtrip():
    """generate_rays must invert the pinhole projection: a ray through
    pixel (px, py) re-projects to the same film coordinates."""
    import jax.numpy as jnp
    import numpy as np

    from practical_path_guiding_lab_tpu.scene.camera import generate_rays, make_camera

    d = load_file(f"{SCENES}/teapot/scene_v3.xml", resx=160, resy=90)
    cam = make_camera(d.sensor)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 160, 500), jnp.float32)
    py = jnp.asarray(rng.uniform(0, 90, 500), jnp.float32)
    ray = generate_rays(cam, px / 160, py / 90)
    # project a point along each ray back to the film
    m = np.asarray(cam.to_world)
    r = m[:3, :3]
    p = np.asarray(ray.o + ray.d * 7.3)
    pc = (p - m[:3, 3]) @ r  # camera-space (columns are the axes)
    sx = 0.5 * (1.0 - pc[:, 0] / (pc[:, 2] * float(cam.tan_x)))
    sy = 0.5 * (1.0 - pc[:, 1] / (pc[:, 2] * float(cam.tan_y)))
    assert np.allclose(sx * 160, np.asarray(px), atol=1e-2)
    assert np.allclose(sy * 90, np.asarray(py), atol=1e-2)


def test_texture_eval_channel_matches_reference_paths():
    """The hot per-channel texture path (ONE combined-u8-table row gather,
    scene/textures.py eval_channel) must agree exactly with (a) the
    unrolled per-texture evaluation and (b) a pure-numpy bilinear oracle
    over the raw 8-bit source (u8 + sRGB->linear reproduces the f32 load
    path bit-for-bit by construction)."""
    import jax.numpy as jnp
    import numpy as np

    from practical_path_guiding_lab_tpu.core.spectrum import srgb_to_linear
    from practical_path_guiding_lab_tpu.io.image import read_texture_u8
    from practical_path_guiding_lab_tpu.scene.textures import (
        eval_all_textures,
        eval_channel,
        select_texture,
    )

    desc = load_file(f"{SCENES}/veach-ajar/scene.xml", resx=32, resy=18)
    scene = compile_scene(desc)
    tex = scene.textures
    assert tex.combined_u8.shape[0] > 1  # ajar has 3 u8 bitmaps
    assert scene.materials.chan_bitmap[0]

    rng = np.random.default_rng(0)
    n = 2000
    k_total = len(tex.images)
    uv = jnp.asarray((rng.random((n, 2)) * 2.0 - 0.5).astype(np.float32))
    tid = jnp.asarray(rng.integers(0, k_total, n).astype(np.int32))
    old = select_texture(eval_all_textures(tex, uv), tid)
    new = eval_channel(tex, tid, uv, need_bitmap=True)
    np.testing.assert_allclose(np.asarray(new), np.asarray(old), atol=1e-6)

    # numpy oracle on one bitmap (repeat wrap, v flip, bilinear): find the
    # source file by matching its pixel dimensions to the table entry
    k = next(i for i, off in enumerate(tex.u8_offsets) if off > 0)
    img8 = None
    from pathlib import Path

    for f in (Path(f"{SCENES}/veach-ajar") / "textures").iterdir():
        cand = read_texture_u8(f)
        if cand is not None and (cand.shape[1], cand.shape[0]) == tex.sizes[k]:
            img8 = cand
            break
    assert img8 is not None
    lin = srgb_to_linear(img8.astype(np.float32) / 255.0)
    h, w = lin.shape[:2]
    uvn = np.asarray(uv)
    u = uvn[:, 0] * w - 0.5
    v = (1.0 - uvn[:, 1]) * h - 0.5
    u0 = np.floor(u)
    v0 = np.floor(v)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]
    u0i = np.mod(u0.astype(np.int64), w)
    v0i = np.mod(v0.astype(np.int64), h)
    u1i = (u0i + 1) % w
    v1i = (v0i + 1) % h
    oracle = (
        lin[v0i, u0i] * (1 - fu) * (1 - fv)
        + lin[v0i, u1i] * fu * (1 - fv)
        + lin[v1i, u0i] * (1 - fu) * fv
        + lin[v1i, u1i] * fu * fv
    )
    got = eval_channel(tex, jnp.full((n,), k, jnp.int32), uv, need_bitmap=True)
    # the u8 path's polynomial sRGB EOTF is within 5.3e-5 of exact at
    # every byte value (see test_srgb_poly_exact_at_byte_values)
    np.testing.assert_allclose(np.asarray(got), oracle, atol=1.5e-4)


def test_srgb_poly_exact_at_byte_values():
    """The texture unpack's polynomial sRGB->linear EOTF must match the
    exact pow form to well under half a u8 quantization step (1/510) at
    ALL 256 byte values — the only inputs the u8 texel path produces."""
    import jax.numpy as jnp
    import numpy as np

    from practical_path_guiding_lab_tpu.scene.textures import (
        _srgb_to_linear_jnp,
    )

    b = jnp.asarray(np.arange(256, dtype=np.float32) / 255.0)
    got = np.asarray(_srgb_to_linear_jnp(b))
    want = np.asarray(_srgb_to_linear_jnp(b, exact=True))
    assert np.abs(got - want).max() < 1e-4
