"""Test fixtures. Backend forcing (CPU + 8 virtual devices) happens in the
ROOT conftest.py via re-exec — see /root/repo/conftest.py."""

import numpy as np  # noqa: E402
import pytest  # noqa: E402

SCENES = "/root/reference/scenes"


@pytest.fixture(scope="session")
def cornell_small():
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene

    return compile_scene(
        load_file(f"{SCENES}/cornell-box/scene.xml", resx=64, resy=64)
    )


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(7)
