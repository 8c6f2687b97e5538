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
