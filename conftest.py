"""Root conftest: force the CPU backend with 8 virtual devices for the test
suite by re-exec'ing the interpreter before jax initializes.

Must live at the repo root: initial conftests load while pytest's output
capture is suspended, so the exec'd process inherits the real stdout. The
axon sitecustomize registers the TPU backend at interpreter startup, which
is why env vars can't simply be set later.
"""
import os
import sys

if os.environ.get("PPG_TPU_TEST_REEXEC") != "1" and "pytest" in sys.modules:
    env = dict(os.environ)
    env["PPG_TPU_TEST_REEXEC"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable axon TPU registration
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    os.write(2, b"[conftest] re-exec with CPU backend\n")
    os.execvpe(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )
