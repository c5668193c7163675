"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding code
paths are exercised without TPU hardware (SURVEY.md §4.8), and with
x64 enabled for 1e-9-level parity against the float64 gonum reference
semantics.

Note: this environment's sitecustomize registers a remote-TPU ("axon")
PJRT backend at interpreter start and forces JAX_PLATFORMS=axon, which
would make every eager dispatch a network round-trip.  jax's platform
config is still switchable before first backend use, so we flip it to
cpu here — XLA_FLAGS must also land before the CPU client initializes.
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
jax.config.update("jax_enable_x64", True)
