"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU devices
(``xla_force_host_platform_device_count``), mirroring how the driver
dry-runs ``__graft_entry__.dryrun_multichip``.

Note: the environment's sitecustomize force-selects the TPU platform via
``jax.config.update("jax_platforms", ...)`` at interpreter start, so setting
the JAX_PLATFORMS env var is not enough — we override the config after
importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Release compiled XLA executables after each test module.

    Every compiled CPU executable holds several mmap'd JIT code regions; the
    full suite compiles enough large L-BFGS/scan programs to exhaust the
    kernel's vm.max_map_count (65530) near the end of the run, which kills
    the process with a bare SIGABRT/SIGSEGV inside backend_compile_and_load.
    Per-module clearing keeps intra-module jit reuse (where all the sharing
    is) while bounding the process-wide mapping count.
    """
    yield
    jax.clear_caches()
