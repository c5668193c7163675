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
# Quiet XLA:CPU's cpu_aot_loader LOG(ERROR) spam when persistent-cache
# entries are loaded (it flags the synthetic prefer-no-scatter/-gather
# "features" as a machine mismatch; the load succeeds — verified by the
# warm-run speedup — and real failures still surface as Python
# exceptions).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent on-disk compilation cache (repo-local, gitignored).  Two
# reasons: (a) warm reruns of the suite skip XLA:CPU codegen entirely,
# roughly halving wall time; (b) this box's XLA:CPU has segfaulted
# inside LLVM codegen (backend_compile_and_load) after ~25 min of
# accumulated compilation in one pytest process — different test each
# time, always late in the suite; cache hits bypass that code path, so
# a warm cache also makes the full single-process run reliable.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
