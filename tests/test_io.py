"""IO tests: EXR roundtrip, PIZ decode of the bundled GT, mesh loaders."""
import numpy as np
import pytest

from practical_path_guiding_lab_tpu.io import exr, hdr, obj, serialized

SCENES = "/root/reference/scenes"


def test_exr_roundtrip_float(tmp_path, rng_np):
    img = rng_np.random((33, 47, 3)).astype(np.float32) * 5
    exr.write(tmp_path / "t.exr", img, half=False)
    back = exr.read(tmp_path / "t.exr", use_cache=False)
    assert np.abs(back - img).max() < 1e-6


def test_exr_roundtrip_half(tmp_path, rng_np):
    img = rng_np.random((16, 16, 3)).astype(np.float32)
    exr.write(tmp_path / "t.exr", img, half=True)
    back = exr.read(tmp_path / "t.exr", use_cache=False)
    assert np.abs(back - img).max() < 2e-3


def test_piz_ground_truth_decode():
    """The PIZ decode must statistically match the bundled tonemapped PNG."""
    from PIL import Image

    from practical_path_guiding_lab_tpu.core.spectrum import linear_to_srgb

    gt = exr.read(f"{SCENES}/veach-mis/TungstenRender.exr")
    assert gt.shape == (720, 1280, 3)
    png = (
        np.asarray(
            Image.open(f"{SCENES}/veach-mis/TungstenRender.png").convert("RGB"),
            np.float32,
        )
        / 255
    )
    tm = linear_to_srgb(np.clip(gt, 0, 1))
    corr = np.corrcoef(tm.ravel(), png.ravel())[0, 1]
    assert corr > 0.98


def test_obj_loader():
    m = obj.read(f"{SCENES}/veach-ajar/models/Mesh015.obj")
    assert m["tri_pos"].shape == (2944, 3)
    assert m["tri_pos"].max() < len(m["positions"])


def test_serialized_loader():
    m = serialized.read(f"{SCENES}/torus/meshes.serialized", 2)
    assert m["positions"].shape[1] == 3
    assert m["triangles"].max() < len(m["positions"])
    assert m["normals"] is not None


def test_hdr_loader():
    img = hdr.read(f"{SCENES}/teapot/textures/envmap.hdr")
    assert img.shape == (512, 1024, 3)
    assert img.min() >= 0 and img.max() > 1.0


def test_exr_piz_write_roundtrip(tmp_path, rng_np):
    """PIZ write -> own reader roundtrip (16-bit wavelet path: many
    distinct half values)."""
    img = rng_np.gamma(2.0, 1.0, (70, 37, 3)).astype(np.float32)
    p = tmp_path / "piz.exr"
    exr.write(p, img, half=True, compression="piz")
    back = exr.read(p, use_cache=False)
    assert np.allclose(back, img.astype(np.float16).astype(np.float32))


def test_exr_piz_write_14bit_path(tmp_path):
    """Few distinct values -> max LUT index < 2^14 -> the 14-bit signed
    wavelet branch."""
    img = np.tile(
        np.linspace(0, 2, 13).astype(np.float32).reshape(13, 1, 1), (5, 9, 3)
    )[:64, :32]
    p = tmp_path / "piz14.exr"
    exr.write(p, img, half=True, compression="piz")
    back = exr.read(p, use_cache=False)
    assert np.allclose(back, img.astype(np.float16).astype(np.float32))


def test_exr_none_write_roundtrip(tmp_path, rng_np):
    img = rng_np.random((17, 23, 3)).astype(np.float32)
    p = tmp_path / "raw.exr"
    exr.write(p, img, half=False, compression="none")
    back = exr.read(p, use_cache=False)
    assert np.allclose(back, img)


def test_huffman_roundtrip(rng_np):
    from practical_path_guiding_lab_tpu.io import piz as piz_mod

    for dist in (
        rng_np.integers(0, 7, 5000),
        np.repeat(rng_np.integers(0, 1000, 50), rng_np.integers(1, 700, 50)),
        np.zeros(4096, np.int64),
    ):
        syms = dist.astype(np.uint16)
        enc = piz_mod.huf_compress(syms)
        dec = piz_mod.huf_decompress(enc, len(syms))
        assert (dec == syms).all()


def test_wavelet_roundtrip(rng_np):
    from practical_path_guiding_lab_tpu.io import piz as piz_mod

    for mx, hi in ((1 << 13, 1 << 13), (1 << 15, 1 << 15)):
        a = rng_np.integers(0, hi, (33, 47)).astype(np.int64).ravel()
        orig = a.copy()
        piz_mod.wav2_encode(a, 47, 1, 33, 47, mx)
        a = (a & 0xFFFF).astype(np.int64)  # storage as uint16
        piz_mod.wav2_decode(a, 47, 1, 33, 47, mx)
        assert ((a & 0xFFFF) == orig).all()
