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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()
